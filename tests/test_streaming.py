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


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed rollup across two availableNow runs
    sharing one checkpoint: the watermark persists, finalized windows
    emit exactly once, and a row arriving behind the watermark is
    dropped."""
    import glob
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    from yargy_spark.streaming.ingest import (stream_transcripts,
                                              windowed_mention_counts)

    src = tmp_path / 'late_in'
    src.mkdir()
    out = str(tmp_path / 'late_out')
    ckpt = str(tmp_path / 'late_ckpt')
    date = GOLDEN_SENTENCES[3]            # one Date mention per turn

    def write(name, rows):
        with open(src / name, 'w', encoding='utf-8') as fh:
            for i, ts in enumerate(rows):
                fh.write(json.dumps(
                    {'conv_id': 'w%04d' % i, 'turn_idx': 0,
                     'role': 'user', 'text': date, 'tool': None,
                     'ts': ts}, ensure_ascii=False) + '\n')

    def run():
        agg = windowed_mention_counts(
            stream_transcripts(spark, str(src)),
            watermark='10 minutes', window='10 minutes')
        q = (agg.writeStream.format('parquet')
             .option('path', out).option('checkpointLocation', ckpt)
             .outputMode('append').trigger(availableNow=True).start())
        q.awaitTermination(120)

    # run 1: rows at 00:05 and 00:35 -> watermark 00:25, the
    # [00:00,00:10) window finalizes with count 1
    write('b1.json', ['2026-01-01T00:05:00.000Z',
                      '2026-01-01T00:35:00.000Z'])
    run()
    got1 = {(r['window']['start'].minute, r['n_mentions'])
            for r in spark.read.parquet(out).collect()} \
        if glob.glob(out + '/*.parquet') else set()
    assert got1 == {(0, 1)}

    # run 2: a LATE row at 00:02 (behind the 00:25 watermark -> must
    # be dropped, its window already emitted) plus 00:55 (advances the
    # watermark to 00:45 > 00:40, finalizing [00:30,00:40) which holds
    # run 1's 00:35 row)
    write('b2.json', ['2026-01-01T00:02:00.000Z',
                      '2026-01-01T00:55:00.000Z'])
    run()
    got2 = {(r['window']['start'].minute, r['n_mentions'])
            for r in spark.read.parquet(out).collect()}
    assert got2 == {(0, 1), (30, 1)}   # no re-emit, late row gone


def test_stream_exact_dedup(spark, tmp_path):
    """First-copy-wins within the watermark horizon: duplicates
    across micro-batches are dropped, distinct texts all emit."""
    import json as _json
    from yargy_spark.streaming.dedup import stream_exact_dedup

    src = tmp_path / 'docs_in'
    src.mkdir()
    mk = lambda i, text, m: {'doc_id': i, 'text': text,  # noqa: E731
                             'ts': '2026-01-01T00:%02d:00.000Z' % m}
    batch1 = [mk(1, 'alpha beta', 0), mk(2, 'gamma delta', 1),
              mk(3, 'Alpha  beta', 2)]   # normalized dup of 1
    batch2 = [mk(4, 'gamma delta', 3),   # dup of 2, later batch
              mk(5, 'epsilon zeta', 4)]
    for name, rows in (('b1.json', batch1), ('b2.json', batch2)):
        with open(src / name, 'w') as fh:
            for r in rows:
                fh.write(_json.dumps(r) + '\n')

    stream = (spark.readStream
              .schema('doc_id long, text string, ts timestamp')
              .option('maxFilesPerTrigger', 1)
              .json(str(src)))
    deduped = stream_exact_dedup(stream, watermark='30 minutes')
    q = (deduped.writeStream.format('memory').queryName('sdedup')
         .outputMode('append').trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table('sdedup').collect()
    # 5 docs, 2 dup pairs -> 3 distinct texts emitted exactly once
    assert len(out) == 3
    assert len({r['text_hash'] for r in out}) == 3
    kept_texts = { ' '.join(r['text'].lower().split()) for r in out }
    assert kept_texts == {'alpha beta', 'gamma delta', 'epsilon zeta'}


def test_stream_band_collisions(spark, tmp_path):
    """Near-dup buckets surface across micro-batches: two similar
    docs (and one exact copy) share band buckets within a window;
    the unique doc never collides; counts/min-doc match batch
    semantics regardless of batch boundaries (windowed agg, not
    keeper state)."""
    import json as _json
    from yargy_spark.streaming.dedup import stream_band_collisions

    src = tmp_path / 'docs_in'
    src.mkdir()
    base = ('the quick brown fox jumps over the lazy dog near '
            'the river bank today')
    near = base.replace('today', 'tonight')
    mk = lambda i, text, m: {'doc_id': i, 'text': text,  # noqa: E731
                             'ts': '2026-01-01T00:%02d:00.000Z' % m}
    batch1 = [mk(1, base, 0),
              mk(2, 'completely unrelated words about spark '
                    'clusters shuffling partitions everywhere', 1)]
    batch2 = [mk(3, near, 2), mk(4, base, 3)]   # near + exact of 1
    for name, rows in (('b1.json', batch1), ('b2.json', batch2)):
        with open(src / name, 'w') as fh:
            for r in rows:
                fh.write(_json.dumps(r) + '\n')

    stream = (spark.readStream
              .schema('doc_id long, text string, ts timestamp')
              .option('maxFilesPerTrigger', 1)
              .json(str(src)))
    coll = stream_band_collisions(stream, watermark='30 minutes',
                                  window='5 minutes')
    q = (coll.writeStream.format('memory').queryName('sband')
         .outputMode('complete').trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table('sband').collect()
    assert out, 'the exact copy must collide on every band'
    # all collisions witness doc 1 (min id), population 2 or 3
    assert all(r['min_doc'] == 1 and 2 <= r['n_docs'] <= 3
               for r in out)
    # the exact copy shares all 8 bands; at least one full-population
    # bucket contains doc 3's near-dup signature too
    assert len(out) == 8
    assert any(r['n_docs'] == 3 for r in out)


def test_stream_dedup_bridge(spark, tmp_path):
    """Stream -> committed-state bridge (pipeline.run_stream_dedup_
    bridge): a collision observed in-stream lands in the committed
    dup_pairs after the bridge runs; quiet windows still roll the
    state forward; reruns noop end-to-end; and a restart with newer
    data commits the previously-open tail window."""
    import json as _json
    from yargy_spark.operators.dedup import minhash_state
    from yargy_spark.pipeline import run_stream_dedup_bridge
    from yargy_spark.sources import manifest as mf

    base_text = ('the quick brown fox jumps over the lazy dog near '
                 'the river bank today')
    near = base_text.replace('today', 'tonight')
    other = ('completely unrelated words about spark clusters '
             'shuffling partitions everywhere')

    base = str(tmp_path / 'base')
    out = str(tmp_path / 'bridge')
    docs0 = spark.createDataFrame([(0, base_text)],
                                  'doc_id long, text string')
    mf.commit_replace(
        mf.with_bucket(minhash_state(docs0), 4, key='doc_id'),
        base + '/minhash_state', note='minhash_state', n_buckets=4)

    src = tmp_path / 'docs_in'
    src.mkdir()
    mk = lambda i, text, h, m: {'doc_id': i, 'text': text,  # noqa: E731
                                'ts': '2026-01-01T%02d:%02d:00.000Z'
                                      % (h, m)}
    rows = [mk(1, base_text, 0, 0), mk(2, other, 0, 1),   # w0: quiet
            mk(10, near, 0, 5), mk(11, base_text, 0, 6),  # w1: collide
            mk(100, 'fresh prose on morphology grammars parsers and '
                    'knowledge graph triples', 0, 40)]     # sentinel
    with open(src / 'b1.json', 'w') as fh:
        for r in rows:
            fh.write(_json.dumps(r) + '\n')

    res = run_stream_dedup_bridge(spark, str(src), base, out,
                                  n_buckets=4)
    w0, w1 = 1767225600, 1767225600 + 300
    # the sentinel's window is still open: only w0/w1 closed+committed
    assert res['windows'] == [w0, w1]
    assert res['committed'] == [w0, w1] and res['nooped'] == []

    # the in-stream collision signal exists for w1 (docs 10/11 share
    # band buckets) and for nothing else
    coll = spark.read.parquet(out + '/collisions').collect()
    assert coll and {r['win_start'] for r in coll} == {w1}
    assert all(r['min_doc'] == 10 for r in coll)

    # ...and that collision LANDS IN THE COMMITTED dup_pairs of w1's
    # root: the within-batch verified pair plus both vs-state pairs
    # against the chained state's doc 0
    p1 = {(r['a'], r['b'], r['vs_state']) for r in mf.read_table(
        spark, out + '/win=%d/dup_pairs' % w1).collect()}
    assert (10, 11, 0) in p1
    assert (0, 10, 1) in p1 and (0, 11, 1) in p1

    # the QUIET window w0 still rolled forward: its exact copy of the
    # state doc paired vs_state, its fresh doc joined the state
    p0 = {(r['a'], r['b'], r['vs_state']) for r in mf.read_table(
        spark, out + '/win=%d/dup_pairs' % w0).collect()}
    assert p0 == {(0, 1, 1)}
    s1 = {r['doc_id'] for r in mf.read_table(
        spark, out + '/win=%d/minhash_state' % w1).collect()}
    assert s1 == {0, 2}           # dups pruned, survivors chained

    # rerun: stream drains nothing new, every increment noops
    res2 = run_stream_dedup_bridge(spark, str(src), base, out,
                                   n_buckets=4)
    assert res2['committed'] == [] and res2['nooped'] == [w0, w1]

    # restart with newer data: the watermark passes the sentinel's
    # window -> it closes and commits on the NEXT bridge run, chained
    # off w1's root
    with open(src / 'b2.json', 'w') as fh:
        fh.write(_json.dumps(
            mk(101, 'another unique document about entirely distinct '
                    'subject matter and vocabulary', 1, 20)) + '\n')
    res3 = run_stream_dedup_bridge(spark, str(src), base, out,
                                   n_buckets=4)
    w40 = 1767225600 + 2400
    assert res3['committed'] == [w40]
    assert res3['nooped'] == [w0, w1]
    s40 = {r['doc_id'] for r in mf.read_table(
        spark, out + '/win=%d/minhash_state' % w40).collect()}
    assert s40 == {0, 2, 100}
