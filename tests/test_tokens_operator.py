"""Token-table operator: tokenize-once + broadcast lexicon join."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_token_table_matches_kernel(spark):
    from yargy_spark.kernel.tokenize import TokenSpec
    from yargy_spark.operators.tokens import token_table
    from yargy_spark.sources.transcripts import golden_only_transcripts

    t = golden_only_transcripts(spark)
    rows = token_table(t).collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r['conv_id'], []).append(r)

    spec = TokenSpec()
    texts = {r['conv_id']: r['text'] for r in t.collect()}
    for conv, text in texts.items():
        got = sorted(by_conv[conv], key=lambda r: r['tok_idx'])
        want = list(spec(text))
        assert [(g['value'], g['start'], g['stop'], g['type'])
                for g in got] == \
            [(w.value, w.start, w.stop, w.type) for w in want]


def test_lexicon_broadcast_join(spark):
    from yargy_spark.operators.tokens import (annotate_lemmas,
                                              lexicon_table,
                                              token_table)
    from yargy_spark.sources.transcripts import golden_only_transcripts

    toks = token_table(golden_only_transcripts(spark))
    lex = lexicon_table(spark)
    annotated = annotate_lemmas(toks, lex)

    got = {r['value'].lower(): list(r['lemmas'])
           for r in annotated.collect()}
    # in-vocabulary inflections map to their lemmas
    assert got['ульянов'] == ['ульянов']
    assert got['иванову'] == ['иванов', 'иванова']
    assert got['июня'] == ['июнь']
    # OOV word falls back to lowercase surface
    assert got['докладом'] == ['докладом']

    # the lexicon side is broadcast in the physical plan
    plan = annotated._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastHashJoin' in plan
