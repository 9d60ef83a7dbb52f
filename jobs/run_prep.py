"""spark-submit entry point: resumable training-data preparation.

    spark-submit --master <cluster> \
        --py-files dist/yargy_spark.zip \
        jobs/run_prep.py <out_dir> [docs_parquet] [n_buckets] [budget]

The full prep pipeline — quality gate -> exact dedup -> LSH near-dup
prune (``clean_corpus``) -> leakage-safe train split -> token-budget
language mixture -> concat-and-chunk packing — materialized to
bucketed parquet shards through the same manifest/resume layer as the
KG and dedup jobs.

Resume granularity is the PACK BUCKET: a bucket's packed layout is a
pure function of (corpus, bucket id) — buckets pack independently,
nothing crosses bucket boundaries — so a crashed run recommits
exactly the missing shards, a rerun after success is a no-op, and a
rerun with a different ``n_buckets`` fails the drift guard loudly.
The upstream stages are stateless and deterministic (salted-hash
decisions only), so recomputing them on resume re-derives
byte-identical inputs for the missing buckets.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MIX_WEIGHTS = {'en': 0.5, 'zh': 0.3, 'de': 0.2}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prep_out'
    docs_path = (sys.argv[2] if len(sys.argv) > 2
                 else '/root/testdata/sf0.001/documents.parquet')
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 6000

    spark = (SparkSession.builder
             .appName('yargy-spark-prep')
             .config('spark.sql.adaptive.enabled', 'true')
             .config('spark.sql.adaptive.skewJoin.enabled', 'true')
             .getOrCreate())
    spark.sparkContext.setLogLevel('WARN')

    from yargy_spark.operators.dedup import clean_corpus
    from yargy_spark.operators.packing import pack_sequences
    from yargy_spark.operators.sampling import (hash_split,
                                                mixture_sample)
    from yargy_spark.sources import manifest as mf

    mf.check_n_buckets(out_dir, n_buckets)
    pending = mf.pending_buckets(out_dir, n_buckets)
    if not pending:
        print(json.dumps({'status': 'noop',
                          'reason': 'all pack buckets committed'}))
        spark.stop()
        return

    t0 = time.time()
    docs = spark.read.parquet(docs_path)
    cleaned = clean_corpus(docs, meta_cols=('text', 'lang'))
    train = (hash_split(cleaned, 'doc_id')
             .where(F.col('split') == 'train'))
    mixed = mixture_sample(train, 'lang', MIX_WEIGHTS, budget,
                           'doc_id')
    packed = pack_sequences(mixed, ctx_len=512, n_buckets=n_buckets)

    # the pack bucket IS the resume/shard unit (pack_sequences'
    # 'bucket' column doubles as the manifest's BUCKET_COL): commit
    # only the pending ones
    assert mf.BUCKET_COL == 'bucket'
    bucketed = (packed
                .where(F.col(mf.BUCKET_COL).isin(pending))
                .persist())
    n_docs = bucketed.count()
    # exact sequence count: packing is contiguous within a bucket
    # (seq ids 0..max(seq_last) all exist), so the per-bucket count is
    # max(seq_last)+1; countDistinct(seq_first) would miss sequences
    # that start mid-document AND double-count across buckets (seq
    # numbering restarts per bucket).
    tok_row = (bucketed
               .groupBy(mf.BUCKET_COL)
               .agg(F.sum('n_tokens').alias('t'),
                    F.max('seq_last').alias('m'))
               .agg(F.sum('t').alias('t'),
                    F.sum(F.col('m') + 1).alias('s'))
               .first())
    counters = {
        'packed_docs': n_docs,
        'packed_tokens': int(tok_row['t'] or 0),
        'packed_sequences': int(tok_row['s'] or 0),
        'wall_sec': round(time.time() - t0, 3),
        'buckets': pending,
    }
    snap = mf.commit_append(bucketed, out_dir, note='train-prep',
                            counters=counters,
                            expected_buckets=pending,
                            n_buckets=n_buckets)
    print(json.dumps({'status': 'committed',
                      'snapshot': snap['snapshot_id'],
                      'counters': counters,
                      'totals': snap['totals']}))
    spark.stop()


if __name__ == '__main__':
    main()
