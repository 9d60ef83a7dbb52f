"""Production-size dictionary exercise (VERDICT r2, next-round #6).

The shipped dictionary is ~2.3k lemmas / ~19k forms; pymorphy2's
OpenCorpora build is ~390k lemmas / ~5M forms, and a real deployment
loads something that size through ``Morphology.from_parquet`` +
SparkContext.broadcast on day one.  This bench synthesizes a
100k+-form dictionary (tools/gen_lexicon.py ``synth_lexemes``) and
measures every stage of that path:

  * parquet generation + ``from_parquet`` load time,
  * pickled broadcast payload size (what torrent-broadcast ships),
  * warm single-core kernel lookup throughput over a skewed word
    stream (90% in-vocabulary, 10% OOV through the suffix predictor)
    plus the form-memo hit rate,
  * executor-side materialization: the same Morphology broadcast into
    a pandas UDF annotating a words DataFrame on local[8].

Usage: python tools/lexicon_scale_bench.py [n_synth] [n_stream] [n_vocab]
Prints ONE JSON line.

``n_vocab`` > 0 additionally measures the VOCABULARY-FILTERED load
(``Morphology.from_parquet(..., words=corpus_vocab)``) — the
documented fallback for OpenCorpora-sized dictionaries: load cost and
broadcast payload track |corpus vocabulary|, not |dictionary|.
``n_stream`` = 0 skips the full-load/kernel/Spark stages entirely
(for dictionary sizes where a full in-driver load is the thing being
avoided, e.g. a 5M-form build).
"""

from __future__ import annotations

import json
import os
import pickle
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n_synth = int(sys.argv[1]) if len(sys.argv) > 1 else 7000
    n_stream = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    n_vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from tools.gen_lexicon import write_parquet
    from yargy_spark.kernel.morphology import Morphology

    out = {}
    lexdir = tempfile.mkdtemp(prefix='lex_scale_')
    t0 = time.time()
    stats = write_parquet(lexdir, n_synth=n_synth)
    out['gen_sec'] = round(time.time() - t0, 3)
    out.update(stats)
    ent_path = os.path.join(lexdir, 'lexicon_entries.parquet')
    par_path = os.path.join(lexdir, 'lexicon_paradigms.parquet')

    if n_vocab:
        # corpus vocabulary = a seeded sample of dictionary surfaces
        # (plus ~10% OOV words the filter must not let in)
        import pyarrow.parquet as pq
        all_words = (pq.read_table(ent_path, columns=['word'])
                     .column('word').to_pylist())
        vrng = random.Random(7)
        vocab = vrng.sample(sorted(set(all_words)),
                            min(n_vocab, len(set(all_words))))
        vocab += ['внесловарное%d' % i for i in range(len(vocab) // 10)]
        t0 = time.time()
        fmorph = Morphology.from_parquet(ent_path, par_path,
                                         words=vocab)
        out['filtered_load_sec'] = round(time.time() - t0, 3)
        out['filtered_pickled_mb'] = round(
            len(pickle.dumps(fmorph, protocol=5)) / 1e6, 2)
        out['filtered_entries'] = len(fmorph.entries)
        out['filtered_paradigms'] = len(fmorph.paradigms)
        del fmorph

    if n_stream == 0:
        print(json.dumps(out))
        return

    t0 = time.time()
    morph = Morphology.from_parquet(ent_path, par_path)
    out['load_sec'] = round(time.time() - t0, 3)
    out['pickled_mb'] = round(
        len(pickle.dumps(morph, protocol=5)) / 1e6, 2)

    # skewed warm stream: rank^3 sampling approximates the Zipf head
    # real token streams have; 10% OOV exercises the suffix predictor
    vocab = sorted(morph.entries)
    rng = random.Random(42)
    words = []
    for i in range(n_stream):
        if i % 10 == 9:
            words.append('оовслово%dными' % (i % 997))
        else:
            words.append(vocab[int(rng.random() ** 3 * len(vocab))])
    t0 = time.time()
    for w in words:
        morph(w)
    warm_sec = time.time() - t0
    out['kernel_words_per_sec'] = int(n_stream / warm_sec)
    out['memo_hit_rate'] = round(1 - morph.misses / morph.lookups, 4)

    # executor-side: broadcast the dictionary, annotate first lemmas
    # in a pandas UDF — proves workers materialize the 100k+-form
    # table through the same path the extraction kernel uses
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from yargy_spark.plans.session import build_session
    spark = build_session(app='lexicon-scale', master='local[8]',
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    bc = spark.sparkContext.broadcast(morph)

    @pandas_udf('string')
    def first_lemma(col):
        import pandas as pd
        m = bc.value
        return pd.Series([m(w)[0].lemma for w in col],
                         index=col.index)

    df = spark.createDataFrame(
        [(w,) for w in words[:100_000]], 'word string').repartition(8)
    t0 = time.time()
    n = (df.select(first_lemma(F.col('word')).alias('lemma'))
         .where(F.col('lemma').isNotNull()).count())
    out['spark_annotate_sec'] = round(time.time() - t0, 3)
    out['spark_rows'] = n
    spark.stop()

    print(json.dumps(out))


if __name__ == '__main__':
    main()
