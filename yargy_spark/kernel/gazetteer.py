"""Gazetteers: multi-word dictionary matching with first-token pruning.

Semantics parity: /root/reference/yargy/pipelines.py —
  - pipeline: exact token phrases              pipelines.py:133-155
  - caseless_pipeline: lowercase phrases       pipelines.py:123-125,158-160
  - morph_pipeline: lemma-level phrases        pipelines.py:128-130,163-171
  - first-token predict index (the Earley
    "partition pruning")                       pipelines.py:24-75
  - matched phrase remembers its dictionary
    key; normalized() after a pipeline yields
    the key (canonicalization anchor)          pipelines.py:86-91

Corpus-scale view (SURVEY.md §2.6): the activated gazetteer is a
broadcast dimension (phrase -> term matchers, first-token index); the
corpus analog of predict-pruning is pre-filtering turns on
``arrays_overlap`` with the broadcast trigger-lemma set before parsing.
"""

from __future__ import annotations

from typing import Iterable, List

from .grammar import Gaz, GrammarRule, Prod
from .predicates import LemmaIn, caseless, eq


class GazProd(Prod):
    """Production that remembers its source dictionary line
    (PipelineProduction, pipelines.py:94-99)."""

    def __init__(self, value: str, terms):
        self.value = value
        super().__init__(terms)


class GazRule(GrammarRule):
    """Pipeline BNF rule with a first-token index; ``predict`` yields
    only productions whose first term can match the incoming token."""

    abbr = 'pipeline'
    opaque_first = True   # FIRST test = index lookup, not predicate set

    def __init__(self, productions):
        super().__init__(list(productions))
        self.index = {}
        for production in self.productions:
            for key in self._first_keys(production):
                self.index.setdefault(key, []).append(production)

    def _first_keys(self, production):
        yield production.terms[0].value

    def predict(self, token):
        # hot path: called once per (rule, column); specialized per
        # subclass to skip generator machinery on the common miss
        return self.index.get(token.value, ())

    def render(self) -> str:
        return '%s -> %s' % (self.label, self.abbr)


class CaselessGazRule(GazRule):
    abbr = 'caseless_pipeline'

    def predict(self, token):
        return self.index.get(token.value.lower(), ())


class MorphGazRule(GazRule):
    abbr = 'morph_pipeline'

    def _first_keys(self, production):
        # first term is a LemmaIn over the word's lemma set
        for lemma in production.terms[0].lemmas:
            yield lemma

    def predict(self, token):
        forms = token.forms
        index = self.index
        if not forms:
            return index.get(token.value.lower(), ())
        out = []
        seen = set()
        emitted = set()
        for form in forms:
            lemma = form.lemma
            if lemma not in seen:
                seen.add(lemma)
                hits = index.get(lemma)
                if hits:
                    # a production indexed under several of this
                    # token's lemmas must predict ONCE: the parser's
                    # dedup-free dot-0 push relies on unique
                    # productions (the reference yields dups here and
                    # relies on chart dedup, pipelines.py:64-69)
                    for p in hits:
                        if id(p) not in emitted:
                            emitted.add(id(p))
                            out.append(p)
        return out


class GazScheme:
    """Unactivated gazetteer: dictionary lines; activation tokenizes
    each line with the parse tokenizer (pipelines.py:133-155)."""

    kind = 'exact'
    label = '[pipeline]'

    def __init__(self, lines: Iterable[str]):
        self.lines = [str(line) for line in lines]
        self.keys = None  # set by activate()

    def activate(self, context) -> 'GazScheme':
        done = type(self)(self.lines)
        done.keys = [self._key(line, context) for line in self.lines]
        # fail with the offending LINE, not an IndexError deep inside
        # grammar compilation (dictionaries loaded from files often
        # carry a trailing blank line)
        for line, words in done.keys:
            if not words:
                raise ValueError(
                    '%s dictionary line %r tokenizes to no words'
                    % (self.label, line))
        return done

    def _key(self, line, context):
        return (line, context.tokenizer.split(line))

    def _term(self, word):
        return eq(word)

    _rule_cls = GazRule

    def as_grammar_rule(self) -> GazRule:
        return self._rule_cls(
            GazProd(value, [self._term(w) for w in words])
            for value, words in self.keys)


class CaselessGazScheme(GazScheme):
    kind = 'caseless'
    label = '[caseless_pipeline]'
    _rule_cls = CaselessGazRule

    def _term(self, word):
        return caseless(word)


class MorphGazScheme(GazScheme):
    kind = 'morph'
    label = '[morph_pipeline]'
    _rule_cls = MorphGazRule

    def _key(self, line, context):
        words = context.tokenizer.split(line)
        morph = context.tokenizer.morph
        return (line, [frozenset(morph.normalized(w)) for w in words])

    def _term(self, lemmas):
        return LemmaIn(lemmas)


def pipeline(lines) -> Gaz:
    return Gaz(GazScheme(lines))


def caseless_pipeline(lines) -> Gaz:
    return Gaz(CaselessGazScheme(lines))


def morph_pipeline(lines) -> Gaz:
    return Gaz(MorphGazScheme(lines))
