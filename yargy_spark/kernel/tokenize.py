"""Regex tokenizer: text -> typed tokens with char spans.

Semantics parity: /root/reference/yargy/tokenizer.py (default rule set
at tokenizer.py:40-50, compile at :80-96, iteration at :98-105) and the
token model at /root/reference/yargy/token.py.  Golden contract:
tests/test_tokenizer.py:30-57 (exact value/span/type sequences).

Design difference vs the reference: one ``Tok`` class carries optional
morphology (``forms``) and an optional ``tag`` instead of a four-class
hierarchy; the tokenizer is a plain compiled-spec object that is cheap
to pickle into a Spark broadcast and reused across Arrow batches.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Sequence, Tuple

# token type names (public contract)
T_RU = 'RU'
T_LATIN = 'LATIN'
T_INT = 'INT'
T_PUNCT = 'PUNCT'
T_EOL = 'EOL'
T_OTHER = 'OTHER'

# default rules; patterns match the reference byte-for-byte
# (tokenizer.py:40-50) because the golden token streams depend on them.
DEFAULT_RULES: Tuple[Tuple[str, str], ...] = (
    (T_RU, r'[а-яё]+'),
    (T_LATIN, r'[a-z]+'),
    (T_INT, r'\d+'),
    (T_PUNCT, r'[-\\/!#$%&()\[\]\*\+,\.:;<=>?@^_`{|}~№…"\'«»„“ʼʻ”]'),
    (T_EOL, r'[\n\r]+'),
    (T_OTHER, r'\S'),
)

# optional extra rules users may prepend (tokenizer.py:25-33)
EMAIL_RULE = ('EMAIL', r'[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+')
PHONE_RULE = ('PHONE', r'(\+)?([-\s_()]?\d[-\s_()]?){10,14}')


class Tok:
    """One token: surface value, [start, stop) char span, type.

    ``forms`` (list of morphology Forms) is set for RU words when a
    morph-aware tokenizer produced the token; ``tag`` is set by taggers.
    """

    __slots__ = ('value', 'start', 'stop', 'type', 'forms', 'tag')

    def __init__(self, value: str, start: int, stop: int, type: str,
                 forms=None, tag=None):
        self.value = value
        self.start = start
        self.stop = stop
        self.type = type
        self.forms = forms
        self.tag = tag

    @property
    def span(self) -> Tuple[int, int]:
        return (self.start, self.stop)

    @property
    def normalized(self) -> str:
        # first-form lemma for morph tokens, else lowercase surface
        # (token.py:22-24, 42-45 — first-form order is significant)
        if self.forms:
            return self.forms[0].lemma
        return self.value.lower()

    def with_forms(self, forms) -> 'Tok':
        return Tok(self.value, self.start, self.stop, self.type,
                   forms, self.tag)

    def with_tag(self, tag) -> 'Tok':
        return Tok(self.value, self.start, self.stop, self.type,
                   self.forms, tag)

    # constrained() narrows morphological readings after a predicate or
    # agreement check (token.py:53-57); morphed/tagged are the
    # reference's decoration names (token.py:17-28)
    constrained = with_forms
    morphed = with_forms
    tagged = with_tag

    def __repr__(self):
        return 'Tok(%r, [%d, %d), %s)' % (
            self.value, self.start, self.stop, self.type)

    def __eq__(self, other):
        return (isinstance(other, Tok)
                and self.value == other.value
                and self.span == other.span
                and self.type == other.type
                and self.forms == other.forms
                and self.tag == other.tag)

    def __hash__(self):
        # the reference Token is hashable (record.py:21); keep
        # set/dict usability (forms excluded: lists are unhashable
        # and (value, span, type) identifies a token in one text)
        return hash((self.value, self.span, self.type, self.tag))


class TokenSpec:
    """Compiled tokenizer spec (rule list -> one alternation regex)."""

    def __init__(self, rules: Sequence[Tuple[str, str]] = DEFAULT_RULES):
        self.rules: List[Tuple[str, str]] = list(rules)
        self._compile()

    def _compile(self):
        parts = []
        self.group_types = {}
        self.types = set()
        for i, (type_, pattern) in enumerate(self.rules):
            group = 'g%d' % i
            parts.append('(?P<%s>%s)' % (group, pattern))
            self.group_types[group] = type_
            self.types.add(type_)
        self.regexp = re.compile('|'.join(parts), re.UNICODE | re.IGNORECASE)

    def add_rules(self, *rules: Tuple[str, str]) -> 'TokenSpec':
        self.rules = list(rules) + self.rules
        self._compile()
        return self

    def remove_types(self, *types: str) -> 'TokenSpec':
        for t in types:
            self.check_type(t)
        self.rules = [r for r in self.rules if r[0] not in types]
        self._compile()
        return self

    def check_type(self, type_: str) -> None:
        if type_ not in self.types:
            raise ValueError(type_)

    def __call__(self, text: str) -> Iterator[Tok]:
        for m in self.regexp.finditer(text):
            yield Tok(m.group(0), m.start(), m.end(),
                      self.group_types[m.lastgroup])

    def split(self, text: str) -> List[str]:
        return [t.value for t in self(text)]


class MorphTokenSpec(TokenSpec):
    """Tokenizer that decorates RU tokens with morphological readings
    from a lexicon-backed analyzer (tokenizer.py:111-126)."""

    def __init__(self, rules: Sequence[Tuple[str, str]] = DEFAULT_RULES,
                 morph=None):
        super().__init__(rules)
        if morph is None:
            from .morphology import default_morphology
            morph = default_morphology()
        self.morph = morph

    def __call__(self, text: str) -> Iterator[Tok]:
        for tok in TokenSpec.__call__(self, text):
            if tok.type == T_RU:
                yield tok.with_forms(self.morph(tok.value))
            else:
                yield tok


def render_tokens(tokens: Sequence[Tok]) -> str:
    """Join token values, collapsing any inter-token gap to one space
    (token.py:91-104; golden: 'pi =  3.14' -> 'pi = 3.14')."""
    out = []
    prev_stop = None
    for tok in tokens:
        if prev_stop is not None and tok.start - prev_stop > 0:
            out.append(' ')
        out.append(tok.value)
        prev_stop = tok.stop
    return ''.join(out)


def render_lemmas(tokens: Sequence[Tok]) -> str:
    """Like render_tokens but each token replaced by its lemma/lowercase
    (token.py:107-119)."""
    out = []
    prev_stop = None
    for tok in tokens:
        if prev_stop is not None and tok.start - prev_stop > 0:
            out.append(' ')
        out.append(tok.normalized)
        prev_stop = tok.stop
    return ''.join(out)


def render_inflected(tokens: Sequence[Tok], grams) -> str:
    """Each morph token re-inflected to target grammemes via its first
    (possibly constrained) form; non-morph tokens lowercased
    (token.py:122-137)."""
    out = []
    prev_stop = None
    for tok in tokens:
        if prev_stop is not None and tok.start - prev_stop > 0:
            out.append(' ')
        if tok.forms:
            out.append(tok.forms[0].inflect(grams))
        else:
            out.append(tok.value.lower())
        prev_stop = tok.stop
    return ''.join(out)
