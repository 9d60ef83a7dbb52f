"""Property-based kernel invariants (hypothesis).

The reference has no randomized tests (SURVEY.md §5); these pin the
engine-level contracts the Spark operators rely on: span soundness,
non-overlap of resolved matches, tokenize-once equivalence, and
end-to-end determinism (required for idempotent bucket re-commits).
"""

import re

from hypothesis import given, settings, strategies as st

from yargy_spark import Parser, rule, and_, or_
from yargy_spark.kernel.tokenize import TokenSpec
from yargy_spark.predicates import gte, lte, gram, dictionary

WORDS = ['иван', 'ульянов', 'саша', 'директор', 'июня', 'площадь',
         'стали', 'сирота', 'vk', 'com', 'x', 'hello']
PIECES = st.one_of(
    st.sampled_from(WORDS),
    st.integers(0, 3000).map(str),
    st.sampled_from(['.', ',', '-', '$', '«', '»', '(', ')']),
)
TEXTS = st.lists(PIECES, min_size=0, max_size=25).map(' '.join)

DATE = or_(
    rule(and_(gte(1), lte(31)), dictionary({'июнь', 'июль'}),
         and_(gte(1900), lte(2100))),
    rule(and_(gte(1900), lte(2100)), 'г', '.'))
NAME = rule(gram('Name'), gram('Surn'))


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_token_span_soundness(text):
    toks = list(TokenSpec()(text))
    prev_stop = 0
    for t in toks:
        assert 0 <= t.start < t.stop <= len(text)
        assert t.start >= prev_stop          # ordered, non-overlapping
        assert text[t.start:t.stop] == t.value
        prev_stop = t.stop
    # every non-whitespace char is covered by exactly one token
    covered = sum(t.stop - t.start for t in toks)
    assert covered == len(re.sub(r'\s', '', text))


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_findall_non_overlapping_sorted(text):
    for parser in (Parser(DATE), Parser(NAME)):
        spans = [m.span for m in parser.findall(text)]
        assert spans == sorted(spans)
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0                  # resolve_spans guarantee
        for s0, s1 in spans:
            assert 0 <= s0 < s1 <= len(text)


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_pretokenized_equivalence(text):
    """The tokenize-once source path (IdTokenizer pattern) produces
    identical matches to tokenizing inside findall."""
    parser = Parser(DATE)
    direct = [(m.span, [t.value for t in m.tokens])
              for m in parser.findall(text)]
    shared = [(m.span, [t.value for t in m.tokens])
              for m in parser.findall(text,
                                      tokens=parser.tokenize(text))]
    assert direct == shared


@settings(max_examples=100, deadline=None)
@given(TEXTS)
def test_extraction_deterministic(text):
    """Same turn -> byte-identical result rows (idempotent re-commit
    contract, SURVEY.md §7.1 R5)."""
    from yargy_spark.extractors import CompiledBank
    bank = test_extraction_deterministic.bank
    assert list(bank.run(text)) == list(bank.run(text))


test_extraction_deterministic.bank = None


def setup_module(module):
    from yargy_spark.extractors import CompiledBank
    test_extraction_deterministic.bank = CompiledBank()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 999), min_size=1, max_size=12))
def test_rightmost_wins_vs_repeatable(values):
    """Interpretation laws over arbitrary token streams: a plain
    attribute keeps the RIGHTMOST occurrence (ref.ipynb cells 41-44),
    a .repeatable() attribute accumulates ALL (cells 45-48)."""
    from yargy_spark.interpretation import attribute, fact
    from yargy_spark.predicates import type_
    text = ' '.join(str(v) for v in values)

    Last = fact('Last', ['x'])
    RULE = type_('INT').interpretation(
        Last.x).repeatable().interpretation(Last)
    match = Parser(RULE).match(text)
    assert match is not None and match.fact == Last(x=str(values[-1]))

    All = fact('All', [attribute('xs').repeatable()])
    RULE = type_('INT').interpretation(
        All.xs).repeatable().interpretation(All)
    match = Parser(RULE).match(text)
    assert match.fact == All(xs=[str(v) for v in values])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(['саша', 'иванов', 'и', '3']),
                min_size=1, max_size=8))
def test_match_iff_whole_text_findall_span(words):
    """match() succeeds exactly when findall() yields a match spanning
    the whole token range (parser.py:275-281 vs 288-292)."""
    text = ' '.join(words)
    parser = Parser(NAME)
    whole = parser.match(text)
    spans = [m.span for m in parser.findall(text)]
    covers = any(s == 0 and e == len(text) for s, e in spans)
    assert (whole is not None) == covers


# ------------------------------------------------- OOV predictor laws

_CYR_WORDS = st.text(alphabet='абвгдежзиклмнопрстуфыьюя',
                     min_size=1, max_size=14)


@settings(max_examples=200, deadline=None)
@given(_CYR_WORDS)
def test_predictor_output_well_formed(word):
    """Predicted readings are structurally sound: known grammemes
    only, lemma derived from the word by a suffix formula no longer
    than the matched suffix (so stems are never invented)."""
    from yargy_spark.kernel.morphology import (KNOWN_GRAMMEMES,
                                               default_morphology)
    from yargy_spark.kernel.predictor import (MIN_WORD_LEN,
                                              SUFFIX_LENGTHS)
    morph = default_morphology()
    preds = morph._predict(word)
    if len(word) < MIN_WORD_LEN:
        assert preds == []
        return
    max_suffix = max(SUFFIX_LENGTHS)
    for lemma, grams in preds:
        assert lemma
        assert grams <= KNOWN_GRAMMEMES
        # common prefix covers everything outside the matched suffix
        keep = len(word) - max_suffix
        if keep > 0:
            assert lemma.startswith(word[:keep])


@settings(max_examples=100, deadline=None)
@given(_CYR_WORDS)
def test_predictor_deterministic_across_builds(word):
    """Two independently built predictors agree reading-for-reading
    (broadcast rebuild safety)."""
    from yargy_spark.kernel.morphology import default_morphology
    from yargy_spark.kernel.predictor import SuffixPredictor
    entries = default_morphology().entries
    a = SuffixPredictor(entries)
    b = SuffixPredictor(dict(reversed(list(entries.items()))))
    assert a.predict(word) == b.predict(word)
