"""Corpus-level extraction with per-extractor tokenizers and taggers
(SURVEY.md §2.2 TagToken / custom TokenRule at the Spark level),
via the importable yargy_spark.examples bank extensions."""

import pytest

from yargy_spark.examples import EXTRA
from yargy_spark.extractors import CompiledBank, EXTRACTORS

pytestmark = pytest.mark.spark


def make_bank():
    pool = dict(EXTRA)
    pool['name'] = EXTRACTORS['name']   # default-spec sharing group
    return CompiledBank(extractors=pool)


def test_mixed_bank_kernel():
    bank = make_bank()
    got = {(r['rule_id'], r['match_text'])
           for r in bank.run('пришёл Саша Быков: пишите на '
                             'admin@example.com через bash')}
    assert ('email', 'admin@example.com') in got
    assert ('tool', 'bash') in got
    assert ('name', 'Саша Быков') in got


def test_mixed_bank_spark(spark):
    from yargy_spark.operators.extract import extract_mentions
    df = spark.createDataFrame(
        [('c1', 0, 'user', 'пишите на admin@example.com', None),
         ('c1', 1, 'assistant', 'запустил grep и python', None),
         ('c2', 0, 'user', 'тут Саша Быков', None)],
        'conv_id string, turn_idx int, role string, text string, '
        'tool string')
    m = extract_mentions(df, bank=make_bank())
    got = {(r['conv_id'], r['rule_id'], r['match_text'])
           for r in m.collect()}
    assert ('c1', 'email', 'admin@example.com') in got
    assert ('c1', 'tool', 'grep') in got
    assert ('c1', 'tool', 'python') in got
    assert ('c2', 'name', 'Саша Быков') in got


def test_default_bank_unchanged(spark):
    """Adding the examples module must not alter the default bank's
    golden-corpus output (the oracles pin it)."""
    from tests.goldens import expected_set
    from yargy_spark.operators.extract import extract_mentions
    from yargy_spark.sources.transcripts import golden_only_transcripts
    got = {(r['conv_id'], r['rule_id'], r['fact_json'])
           for r in extract_mentions(
               golden_only_transcripts(spark)).collect()}
    assert got == expected_set()


def test_bank_modes():
    """Parser entry-point parity at the bank level: extract is a
    superset of findall (ambiguity mode, cookbook cell 3); match
    accepts only whole-turn parses."""
    bank = CompiledBank(['name'])
    text = 'пришли Саша Быков и Саша Иванов'
    fa = [(r['span_start'], r['span_stop'])
          for r in bank.run(text, mode='findall')]
    ex = [(r['span_start'], r['span_stop'])
          for r in bank.run(text, mode='extract')]
    assert set(fa) <= set(ex) and len(fa) == 2
    assert list(bank.run(text, mode='match')) == []     # not whole-turn
    whole = list(bank.run('Саша Быков', mode='match'))
    assert len(whole) == 1 and whole[0]['match_text'] == 'Саша Быков'
