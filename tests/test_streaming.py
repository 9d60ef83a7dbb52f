"""Structured Streaming extraction: file source -> extraction kernel ->
parquet sink with exactly-once checkpointing."""

import json
import os

import pytest

pytestmark = pytest.mark.spark


def test_stream_extraction(spark, tmp_path):
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    from yargy_spark.streaming.ingest import (run_stream_to_parquet,
                                              stream_transcripts)

    src = tmp_path / 'incoming'
    src.mkdir()
    rows = [{'conv_id': 's%04d' % i, 'turn_idx': 0, 'role': 'user',
             'text': s, 'tool': None,
             'ts': '2026-01-01T00:0%d:00.000Z' % (i % 10)}
            for i, s in enumerate(GOLDEN_SENTENCES)]
    with open(src / 'batch1.json', 'w', encoding='utf-8') as fh:
        for r in rows:
            fh.write(json.dumps(r, ensure_ascii=False) + '\n')

    out = str(tmp_path / 'mentions')
    ckpt = str(tmp_path / 'ckpt')
    turns = stream_transcripts(spark, str(src))
    assert turns.isStreaming

    query = run_stream_to_parquet(turns, out, ckpt)
    query.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 21  # same corpus -> same 21 golden mentions

    # restart with no new files: exactly-once, nothing reprocessed
    query2 = run_stream_to_parquet(stream_transcripts(spark, str(src)),
                                   out, ckpt)
    query2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 21


def test_windowed_rollup(spark, tmp_path):
    """Watermarked event-time rollup of mentions per fact type."""
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    from yargy_spark.streaming.ingest import (stream_transcripts,
                                              windowed_mention_counts)

    src = tmp_path / 'roll_in'
    src.mkdir()
    rows = [{'conv_id': 'r%04d' % i, 'turn_idx': 0, 'role': 'user',
             'text': s, 'tool': None,
             'ts': '2026-01-01T00:%02d:00.000Z' % (i % 20)}
            for i, s in enumerate(GOLDEN_SENTENCES)]
    with open(src / 'b.json', 'w', encoding='utf-8') as fh:
        for r in rows:
            fh.write(json.dumps(r, ensure_ascii=False) + '\n')

    agg = windowed_mention_counts(stream_transcripts(spark, str(src)),
                                  watermark='30 minutes',
                                  window='10 minutes')
    # complete mode: a single availableNow batch never advances the
    # watermark far enough to close windows in append mode
    q = (agg.writeStream.format('memory').queryName('rollup')
         .outputMode('complete').trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql('select fact_type, sum(n_mentions) n from rollup '
                    'group by fact_type').collect()
    by_type = {r['fact_type']: int(r['n']) for r in got}
    assert sum(by_type.values()) == 21   # same corpus, same mentions
    assert set(by_type) == {'Person', 'Name', 'Date', 'Money', 'Geo',
                            'Era'}
    # multiple event-time windows materialized
    assert spark.sql('select count(distinct window) c from rollup') \
        .first()['c'] >= 2
