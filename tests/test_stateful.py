"""Custom stateful streaming operator (applyInPandasWithState)."""

import json

import pytest

pytestmark = pytest.mark.spark


def test_conversation_entity_state(spark, tmp_path):
    """State accumulates across micro-batches: two files, one-file
    triggers, per-conversation totals grow monotonically."""
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    from yargy_spark.streaming.ingest import (stream_mentions,
                                              stream_transcripts)
    from yargy_spark.streaming.stateful import conversation_entity_state

    src = tmp_path / 'st_in'
    src.mkdir()

    def write(name, rows):
        with open(src / name, 'w', encoding='utf-8') as fh:
            for conv, idx, sent in rows:
                fh.write(json.dumps(
                    {'conv_id': conv, 'turn_idx': idx, 'role': 'user',
                     'text': sent, 'tool': None,
                     'ts': '2026-01-01T00:00:00.000Z'},
                    ensure_ascii=False) + '\n')

    # batch 1: person sentence -> 2 mentions (person + name) in k1
    write('b1.json', [('k1', 0, GOLDEN_SENTENCES[0]),
                      ('k2', 0, GOLDEN_SENTENCES[3])])
    # batch 2: another Ульянов mention in k1
    write('b2.json', [('k1', 1, GOLDEN_SENTENCES[14])])

    turns = stream_transcripts(spark, str(src), max_files=1)
    summary = conversation_entity_state(stream_mentions(turns))
    q = (summary.writeStream.format('memory').queryName('conv_state')
         .outputMode('update').trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.table('conv_state').collect()
    latest = {}
    for r in rows:
        cur = latest.get(r['conv_id'])
        if cur is None or r['n_mentions'] > cur['n_mentions']:
            latest[r['conv_id']] = r

    k1 = latest['k1']
    assert k1['n_mentions'] == 3
    assert k1['person_keys'] == ['иван|ульянов']
    k2 = latest['k2']
    assert k2['n_mentions'] == 1       # date mention, no person key
    assert k2['n_person_keys'] == 0
    # state was updated incrementally: k1 appears in >1 micro-batch
    assert sum(1 for r in rows if r['conv_id'] == 'k1') >= 2
