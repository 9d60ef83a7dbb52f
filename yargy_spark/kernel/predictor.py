"""Suffix-based out-of-vocabulary morphology predictor.

Behavior class of pymorphy2's KnownSuffixAnalyzer (the reference
gets OOV coverage from it via ``MorphAnalyzer.parse`` —
/root/reference/yargy/morph.py:118-130): an unknown word is analyzed
by the statistics of dictionary words sharing its longest suffix.

The table is built FROM the loaded lexicon itself, so it is exactly
as deterministic as the dictionary: for every dictionary word and
suffix length L in [3..5] we record
    suffix -> (strip_n, append, grams) -> count
where applying the formula ``word[:-strip_n] + append`` to the
dictionary word yields its lemma.  Prediction replays the most
frequent formulas of the LONGEST matching suffix onto the unknown
word.  This is what makes ``gram('Surn')`` match 'Зубковой' or
``gram('Name')`` match 'Аделаиду' without those words being shipped.

Determinism: counts come from a fixed dictionary; ties break on the
sorted (grams, append) text.  No I/O, no randomness.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Tuple

MIN_WORD_LEN = 4          # pymorphy2's KnownSuffixAnalyzer floor
SUFFIX_LENGTHS = (5, 4, 3)
MAX_READINGS = 6          # cap per word, most-frequent first
_CYR = set('абвгдеёжзийклмнопрстуфхцчшщъыьэюя')

# POS whose paradigms generalize by suffix; pronouns/particles etc.
# would only add noise (pymorphy2 restricts its suffix analyzer the
# same way).
_PREDICTABLE_POS = ('NOUN', 'ADJF', 'VERB', 'INFN', 'PRTF', 'ADVB')


def _is_cyrillic(word: str) -> bool:
    return bool(word) and all(ch in _CYR for ch in word)


class SuffixPredictor:
    """entries (word -> [(lemma, grams)]) -> OOV reading predictor."""

    def __init__(self, entries: Dict[str, List[Tuple[str, FrozenSet[str]]]]):
        # suffix -> {(strip_n, append, grams): count}
        table: Dict[str, Dict[tuple, int]] = {}
        for word, readings in entries.items():
            if len(word) < MIN_WORD_LEN or not _is_cyrillic(word):
                continue
            for lemma, grams in readings:
                if not any(p in grams for p in _PREDICTABLE_POS):
                    continue
                stem = 0
                for a, b in zip(word, lemma):
                    if a != b:
                        break
                    stem += 1
                strip_n, append = len(word) - stem, lemma[stem:]
                for length in SUFFIX_LENGTHS:
                    if length > len(word) - 1 or strip_n > length:
                        # formula must be contained in the matched
                        # suffix, and at least one stem char must
                        # remain outside it
                        continue
                    key = word[-length:]
                    bucket = table.setdefault(key, {})
                    formula = (strip_n, append, grams)
                    bucket[formula] = bucket.get(formula, 0) + 1
        # pre-rank each bucket ONCE (most-frequent first, text ties):
        # predict() on the hot tokenize path must not re-sort
        # tie-break covers the WHOLE formula (count, grams, append,
        # strip_n) so ranking never depends on dict insertion order
        self._table = {
            suffix: [f for f, _n in sorted(
                bucket.items(),
                key=lambda kv: (-kv[1], ' '.join(sorted(kv[0][2])),
                                kv[0][1], kv[0][0]))]
            for suffix, bucket in table.items()}

    def predict(self, word: str) -> List[Tuple[str, FrozenSet[str]]]:
        """-> ordered [(lemma, grams)] for an unknown word ('' hits
        mean no prediction; caller falls back to gram-less)."""
        w = word.lower()
        if len(w) < MIN_WORD_LEN or not _is_cyrillic(w):
            return []
        for length in SUFFIX_LENGTHS:
            if length > len(w) - 1:
                continue
            ranked = self._table.get(w[-length:])
            if not ranked:
                continue
            out, seen = [], set()
            for strip_n, append, grams in ranked:
                lemma = (w[:-strip_n] if strip_n else w) + append
                key = (lemma, grams)
                if key in seen:
                    continue
                seen.add(key)
                out.append(key)
                if len(out) >= MAX_READINGS:
                    break
            if out:
                return out
        return []
