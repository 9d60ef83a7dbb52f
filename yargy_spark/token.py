"""API-compat shim mirroring ``yargy.token``
(/root/reference/yargy/token.py)."""

from .kernel.tokenize import (  # noqa: F401
    Tok as Token,
    render_tokens as join_tokens,
    render_lemmas as join_normalized_tokens,
    render_inflected as join_inflected_tokens,
)


def get_tokens_span(tokens):
    return (tokens[0].start, tokens[-1].stop)
