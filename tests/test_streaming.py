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
