"""Canonical extractor bank: Person/Name, Date, Money, Geo, Era.

Rules transcribed from the reference's committed tests and executable
docs (the golden oracle — FIXTURES.md §5):
  - Person + gazetteer + gnc      tests/test_person.py:10-67
  - Person w/ inflected position  docs/index.ipynb cell 9
  - Name + gnc + inflected        docs/ref.ipynb cell 74,
                                  tests/test_relations.py
  - Date (3 shapes, int-normal)   docs/index.ipynb cells 46-54,
                                  docs/ref.ipynb cell 69
  - Money                         docs/ref.ipynb cells 31-33
  - Geo (ADJF shape + gazetteer)  docs/index.ipynb cell 6,
                                  docs/ref.ipynb cells 59-61
  - Era (const)                   docs/ref.ipynb cell 71

Each extractor compiles on the driver, is broadcast to executors and
evaluated inside the Arrow-batched extraction UDF.  ``trigger`` is an
optional coarse regex that is pushed down as a JVM-side ``rlike``
filter before any Python runs — the corpus-level analog of the
gazetteer predict-pruning (SURVEY.md §4.1): at 100 TB it eliminates
the vast majority of turns before they ever reach a Python worker.
Triggers MUST be supersets of the rule language; each one is covered
by tests asserting no golden sentence is filtered out.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Optional, Tuple

from . import rule, or_, and_, not_, Parser
from .kernel.earley import ParseBudgetExceeded
from .interpretation import fact
from .predicates import (caseless, dictionary, eq, gram, gte,
                         is_capitalized, lte, normalized, type_)
from .pipelines import morph_pipeline
from .relations import gnc_relation
from .kernel.tokenize import render_lemmas

# ------------------------------------------------------------------ facts

Name = fact('Name', ['first', 'last'])
Person = fact('Person', ['position', 'name'])
Date = fact('Date', ['year', 'month', 'day'])
Money = fact('Money', ['value', 'currency'])
Geo = fact('Geo', ['name'])
Era = fact('Era', ['value'])
Address = fact('Address', ['street_type', 'street', 'house'])

# keyed by NOMINATIVE LEMMA: the dictionary predicate matches any
# inflection via lemma expansion, and .normalized() hands the lemma
# to month_number — a surface key like 'мая' would match but then
# drop the month number ('мая' lemmatizes to 'май')
MONTH_WORDS = {'январь', 'февраль', 'март', 'апрель', 'май', 'июнь',
               'июль', 'август', 'сентябрь', 'октябрь', 'ноябрь',
               'декабрь'}
MONTH_NUMBERS = {'январь': 1, 'февраль': 2, 'март': 3, 'апрель': 4,
                 'май': 5, 'июнь': 6, 'июль': 7, 'август': 8,
                 'сентябрь': 9, 'октябрь': 10, 'ноябрь': 11,
                 'декабрь': 12}


def month_number(word: str) -> Optional[int]:
    return MONTH_NUMBERS.get(word)


# ---------------------------------------------------------------- builders

def build_person():
    """tests/test_person.py:10-55 — gazetteer position + gnc name."""
    LAST = and_(gram('Surn'), not_(gram('Abbr')))
    FIRST = and_(gram('Name'), not_(gram('Abbr')))
    POSITION = morph_pipeline(['управляющий директор', 'вице-мэр'])
    gnc = gnc_relation()
    NAME = rule(
        FIRST.interpretation(Name.first).match(gnc),
        LAST.interpretation(Name.last).match(gnc),
    ).interpretation(Name)
    return rule(
        POSITION.interpretation(Person.position).match(gnc),
        NAME.interpretation(Person.name),
    ).interpretation(Person)


def build_person_norm():
    """docs/index.ipynb cell 9 — normalized position + inflected name."""
    POSITION = morph_pipeline(['премьер министр', 'президент'])
    NAME = rule(
        gram('Name').interpretation(Name.first.inflected()),
        gram('Surn').interpretation(Name.last.inflected()),
    ).interpretation(Name)
    return rule(
        POSITION.interpretation(Person.position.inflected()),
        NAME.interpretation(Person.name),
    ).interpretation(Person)


def build_name():
    """docs/ref.ipynb cell 74 — gnc-agreed, inflected to lemma forms.
    This is the mention extractor entity linking runs on."""
    gnc = gnc_relation()
    return rule(
        gram('Name').interpretation(Name.first.inflected()).match(gnc),
        gram('Surn').interpretation(Name.last.inflected()).match(gnc),
    ).interpretation(Name)


def build_date():
    """docs/index.ipynb cells 46-54: three date shapes, int-normalized."""
    MONTH_NAME = dictionary(MONTH_WORDS)
    DAY = and_(gte(1), lte(31))
    MONTH = and_(gte(1), lte(12))
    YEAR = and_(gte(1900), lte(2100))
    return or_(
        rule(
            DAY.interpretation(Date.day.custom(int)),
            MONTH_NAME.interpretation(
                Date.month.normalized().custom(month_number)),
            YEAR.interpretation(Date.year.custom(int))),
        rule(
            YEAR.interpretation(Date.year.custom(int)), '-',
            MONTH.interpretation(Date.month.custom(int)), '-',
            DAY.interpretation(Date.day.custom(int))),
        rule(
            YEAR.interpretation(Date.year.custom(int)), 'г', '.'),
    ).interpretation(Date).named('DATE')


def build_money():
    """docs/ref.ipynb cells 31-33."""
    return rule(
        rule(type_('INT'),
             dictionary({'тысяча', 'миллион'})).interpretation(
            Money.value),
        eq('$').interpretation(Money.currency),
    ).interpretation(Money)


def build_geo():
    """docs/index.ipynb cell 6 (ADJF+dictionary shape) and
    docs/ref.ipynb cell 61 (gazetteer shape), both normalized into a
    Geo fact."""
    ADJF_SHAPE = rule(
        and_(gram('ADJF'), is_capitalized()),
        gram('ADJF').optional().repeatable(),
        dictionary({'федерация', 'республика'}))
    GAZ_SHAPE = morph_pipeline(['красная площадь', 'первомайская улица'])
    return or_(
        GAZ_SHAPE.interpretation(Geo.name.normalized()),
        ADJF_SHAPE.interpretation(Geo.name.normalized()),
    ).interpretation(Geo)


def build_address():
    """Street address — the fourth canonical fact type of the north
    star (Person/Name, Date, Money, Address).  Two production shapes
    mirroring real Russian addresses: '<type> <name-in-genitive>'
    (улица Ленина) and '<ADJF name> <type>' (Первомайская улица),
    each with an optional house number ('дом 5' / 'д. 5' / bare INT).

    The reference exposes the gazetteer shape of this rule
    (docs/ref.ipynb cell 61); the full grammar composes the same
    public DSL pieces.  NOT in the default bank: registered by the
    kg_address query with its own CompiledBank so the golden-corpus
    oracles stay byte-stable."""
    STREET_TYPE = morph_pipeline([
        'улица', 'проспект', 'переулок', 'площадь', 'шоссе',
        'бульвар', 'набережная',
    ]).interpretation(Address.street_type.normalized())
    # one consistent normalization for Address.street across both
    # shapes so downstream entity keys unify: the ADJF name
    # re-inflects to nominative PRESERVING gender agreement with the
    # street type ('Первомайской улице' -> 'первомайская', not the
    # masculine lemma — closest-form inflection, morphology.inflect),
    # and the genitive-noun name keeps its surface form (the genitive
    # IS the street's canonical name) lowercased to match.
    ADJ_NAME = and_(gram('ADJF'), is_capitalized()) \
        .interpretation(Address.street.inflected({'nomn', 'sing'}))
    GEN_NAME = and_(gram('NOUN'), is_capitalized()) \
        .interpretation(Address.street.custom(str.lower))
    HOUSE = rule(
        or_(rule(normalized('дом')), rule(caseless('д'), eq('.')))
        .optional(),
        type_('INT').interpretation(Address.house.custom(int)))
    return or_(
        rule(STREET_TYPE, GEN_NAME, HOUSE.optional()),
        rule(ADJ_NAME, STREET_TYPE, HOUSE.optional()),
    ).interpretation(Address)


def build_era():
    """docs/ref.ipynb cell 71."""
    BC = morph_pipeline(['до нашей эры', 'до н.э.']).interpretation(
        Era.value.const('BC'))
    AD = morph_pipeline(['наша эра', 'н.э.']).interpretation(
        Era.value.const('AD'))
    return or_(BC, AD).interpretation(Era)


# ------------------------------------------------------------- extractors

def flatten_fact(data, prefix='') -> List[Tuple[str, str]]:
    """Fact JSON -> (attribute path, string value) rows; nested facts
    flatten with dotted paths (triples projection, SURVEY.md §2.9)."""
    rows = []
    for key, value in data.items():
        path = '%s.%s' % (prefix, key) if prefix else key
        if isinstance(value, dict):
            rows.extend(flatten_fact(value, path))
        elif isinstance(value, list):
            for i, item in enumerate(value):
                if isinstance(item, dict):
                    rows.extend(flatten_fact(item, '%s[%d]' % (path, i)))
                else:
                    rows.append(('%s[%d]' % (path, i), str(item)))
        elif value is not None:
            rows.append((path, str(value)))
    return rows


def name_key(data) -> Optional[str]:
    """Blocking key for person-like facts: lemma pair 'first|last'
    (north_star: normalized-lemma blocking keys)."""
    name = data.get('name', data)
    first, last = name.get('first'), name.get('last')
    if first and last:
        return '%s|%s' % (str(first).lower(), str(last).lower())
    return None


class Extractor:
    """One named extractor: rule builder + trigger + key function."""

    def __init__(self, name: str, fact_type: str, builder: Callable,
                 trigger: Optional[str] = None,
                 key_fn: Optional[Callable] = None,
                 cap: int = 100_000,
                 tokenizer=None, tagger=None):
        self.name = name
        self.fact_type = fact_type
        self.builder = builder
        self.trigger = trigger
        self.key_fn = key_fn
        self.cap = cap
        self.tokenizer = tokenizer
        self.tagger = tagger

    @property
    def shares_tokens(self) -> bool:
        """Default tokenizer+tagger extractors share one token list
        per turn (cookbook pre-tokenized pattern); custom ones
        tokenize/tag themselves."""
        return self.tokenizer is None and self.tagger is None

    def compile(self) -> Parser:
        return Parser(self.builder(), tokenizer=self.tokenizer,
                      tagger=self.tagger, cap=self.cap)


# Digits appear in every date/money golden shape, so the trigger is a
# strict superset of those rule languages.  Cyrillic extractors get a
# cyrillic-run trigger (they cannot match a text with no RU token).
_HAS_DIGIT = r'\d'
_HAS_CYRILLIC = r'[а-яёА-ЯЁ]'

EXTRACTORS: Dict[str, Extractor] = {
    e.name: e for e in [
        Extractor('person', 'Person', build_person,
                  trigger=_HAS_CYRILLIC, key_fn=name_key),
        Extractor('person_norm', 'Person', build_person_norm,
                  trigger=_HAS_CYRILLIC, key_fn=name_key),
        Extractor('name', 'Name', build_name,
                  trigger=_HAS_CYRILLIC, key_fn=name_key),
        Extractor('date', 'Date', build_date, trigger=_HAS_DIGIT),
        Extractor('money', 'Money', build_money, trigger=_HAS_DIGIT),
        Extractor('geo', 'Geo', build_geo, trigger=_HAS_CYRILLIC),
        Extractor('era', 'Era', build_era, trigger=_HAS_CYRILLIC),
    ]
}


class CompiledBank:
    """Driver-compiled extractor set; this object is what gets
    broadcast to executors (grammar IR + expanded dictionaries +
    lexicon, SURVEY.md §3.1)."""

    def __init__(self, names=None, extractors=None):
        pool = extractors or EXTRACTORS
        names = list(names or pool)
        # only data crosses the broadcast: compiled parsers + triggers
        # (builder functions may live in non-importable test modules)
        self.triggers = [pool[n].trigger for n in names]
        self.parsers = [
            (n, pool[n].fact_type, pool[n].compile(), pool[n].key_fn,
             re.compile(pool[n].trigger) if pool[n].trigger else None,
             pool[n].shares_tokens)
            for n in names]

    @property
    def trigger_regex(self) -> Optional[str]:
        """JVM-pushdown prefilter: union of extractor triggers, or None
        if any extractor lacks one."""
        if not self.triggers or any(t is None for t in self.triggers):
            return None
        return '|'.join('(?:%s)' % t
                        for t in dict.fromkeys(self.triggers))

    def run(self, text: str, stats=None, mode: str = 'findall',
            strict: bool = False):
        """All extractors over one turn; yields result dicts.

        The turn is tokenized+morph-tagged ONCE and the token list is
        shared by every parser (all bank extractors use the default
        MorphTokenSpec/PassTagger, so sharing is sound) — the
        reference's pre-tokenized source pattern, and the single
        biggest per-turn win since tokenize+morph dominates short
        parses.  Per-extractor triggers short-circuit before parsing.
        """
        if mode not in ('findall', 'extract', 'match'):
            # validate OUTSIDE the poison-turn guard: a caller typo
            # must fail loudly, not read as corpus-wide budget aborts
            raise ValueError('unknown mode %r' % mode)
        tokens = None
        for (name, fact_type, parser, key_fn, trigger,
             shares) in self.parsers:
            if trigger is not None and not trigger.search(text):
                continue
            if shares and tokens is None:
                tokens = parser.tokenize(text)
            try:
                # materialize: the entry points are lazy, the budget
                # trips during iteration; custom-tokenizer/tagger
                # extractors tokenize themselves (tokens= only for the
                # default sharing group).  mode mirrors the parser
                # entry points (parser.py:283-303): findall = resolved
                # non-overlapping spans, extract = every completed
                # parse, match = whole-turn parse only.
                shared = tokens if shares else None
                if mode == 'findall':
                    matches = list(parser.findall(text, tokens=shared))
                elif mode == 'extract':
                    matches = list(parser.extract(text, tokens=shared))
                else:
                    m = parser.match(text, tokens=shared)
                    matches = [m] if m is not None else []
            except ParseBudgetExceeded:
                # pathological turn hit the chart cap: skip the rule
                # for this turn (poison-turn guard); surfaced via the
                # budget_aborts metric
                if stats is not None:
                    stats['budget_aborts'] = stats.get(
                        'budget_aborts', 0) + 1
                continue
            except Exception:
                # any OTHER kernel exception is a bug, not a budget
                # trip: count it distinctly so a systematic fault
                # cannot masquerade as budget aborts, and re-raise in
                # strict mode so it fails the job loudly
                if strict:
                    raise
                if stats is not None:
                    stats['errors'] = stats.get('errors', 0) + 1
                continue
            for m in matches:
                data = None
                fact_spans = []
                try:
                    result = m.tree.interpret()
                    data = result.as_json
                    fact_spans = [{'start': s, 'stop': t}
                                  for s, t in result.spans]
                except TypeError:
                    # reference parity: mixed-type attr interpretation
                    # raises TypeError and the fact is dropped
                    # (interpretation/attribute.py semantics); any
                    # other exception class propagates loudly
                    pass
                if data is None:
                    continue
                key = key_fn(data) if key_fn else None
                yield {
                    'rule_id': name,
                    'fact_type': fact_type,
                    'span_start': m.span[0],
                    'span_stop': m.span[1],
                    'match_text': text[m.span[0]:m.span[1]],
                    'lemma_text': render_lemmas(m.tokens),
                    'fact_json': json.dumps(data, ensure_ascii=False,
                                            sort_keys=True),
                    'norm_key': key,
                    # pre-flattened (pred, obj) pairs: triples become a
                    # JVM-side explode, no second Python pass
                    'attrs': flatten_fact(data),
                    # span sink: filled-attribute char offsets
                    # (Fact.spans, interpretation/fact.py:36-41)
                    'fact_spans': fact_spans,
                }
