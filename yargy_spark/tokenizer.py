"""API-compat shim mirroring ``yargy.tokenizer``
(/root/reference/yargy/tokenizer.py)."""

from .kernel.tokenize import (  # noqa: F401
    Tok as Token,
    TokenSpec as Tokenizer,
    MorphTokenSpec as MorphTokenizer,
    DEFAULT_RULES as RULES,
    EMAIL_RULE, PHONE_RULE,
    T_RU as RUSSIAN, T_LATIN as LATIN, T_INT as INT,
    T_PUNCT as PUNCT, T_EOL as EOL, T_OTHER as OTHER,
)


def TokenRule(type, pattern):  # noqa: N802 (reference casing)
    """Compat ctor (reference tokenizer.py:10-16); our token rules are
    plain ``(type, pattern)`` pairs."""
    return (type, pattern)
