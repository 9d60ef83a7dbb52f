"""Benchmark harness — prints ONE JSON line.

Headline: KG construction throughput (turns/sec) over the
deterministic synthetic transcript corpus at the SF implied by
$SPARK_GRAFT_SF_DIR, on local[$SPARK_GRAFT_CPUS]; plus the
training-data operator suite over the provided documents/embeddings
tables and one relational aggregate.

Every timed region runs REPS (default 3) times within this one
invocation and the reported per-query number is the MEDIAN — a
single host stall (scheduler preemption, page-cache eviction) can
no longer poison the round artifact the way the round-4 degraded
hour did; ``queries_min`` carries the per-query minima so a
systematically loaded session is still visible as median >> min.

Output:
  {"metric": "kg_pipeline_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query median sec...},
   "queries_min": {...per-query min sec...}, "reps": 3,
   "sf": <sf>, "turns": N, "turns_per_sec": X, "cpus": C}

The two-cluster-size scaling evidence (local[8] vs local[32]) is a
separate harness: tools/scaling_bench.py (results in BENCH.md).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = int(os.environ.get('SPARK_GRAFT_BENCH_REPS', '3'))


def sf_of(sf_dir: str) -> float:
    m = re.search(r'sf([0-9.]+)', sf_dir)
    return float(m.group(1)) if m else 0.1


def main():
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    sf = sf_of(sf_dir)

    from yargy_spark.plans.session import build_session
    from yargy_spark.sources.transcripts import synth_transcripts
    from yargy_spark.operators.extract import extract_mentions
    from yargy_spark.operators.linking import link_entities
    from yargy_spark.operators.triples import materialize_triples

    spark = build_session(app='yargy-spark-bench',
                          master='local[%d]' % cpus,
                          shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel('ERROR')

    medians, minima = {}, {}

    def timed(name, fn):
        """Run ``fn`` REPS times; record median + min wall seconds.
        Returns the LAST run's result so persisted state (the KG
        spine's mentions frame) reflects the final execution."""
        walls, out = [], None
        for _ in range(REPS):
            t0 = time.time()
            out = fn()
            walls.append(time.time() - t0)
        medians[name] = round(statistics.median(walls), 3)
        minima[name] = round(min(walls), 3)
        return out

    # --- headline: KG construction over transcripts at SF ------------
    n_turns = max(1024, int(1_000_000 * sf))
    # ~3 tasks per core smooths per-sentence parse-cost variance
    transcripts = synth_transcripts(
        spark, n_turns=n_turns, partitions=max(cpus * 3, 32)).persist()
    transcripts.count()  # materialize input outside the timed region
    # warm pass: python worker imports + broadcast unpickle are
    # one-time costs a long-running executor amortizes to zero
    extract_mentions(transcripts).count()

    mentions = None

    def _extract():
        nonlocal mentions
        if mentions is not None:
            mentions.unpersist()     # re-run from the scan each rep
        mentions = extract_mentions(transcripts).persist()
        return mentions.count()

    n_mentions = timed('kg_extract', _extract)

    def _link_and_triples():
        # persist entity links: the triples union references them in
        # three branches
        entities = link_entities(mentions).persist()
        n = materialize_triples(mentions, entities).count()
        entities.unpersist()
        return n

    n_triples = timed('kg_link_triples', _link_and_triples)

    # --- training-data ops over provided tables ----------------------
    import __spark_entry__ as entry

    for q in ['minhash_lsh_dups', 'ngram_jaccard_dups', 'simhash_docs',
              'simhash_dup_pairs',
              'ann_cosine_topk', 'ann_ivf_topk', 'token_counts',
              'quality_scores', 'pricing_summary',
              # round-3 pipeline family
              'pack_sequences', 'mixture_sample', 'decontam_pairs',
              'training_batches',
              # round-3 tail: text filters + SFT assembly
              'repetition_scores', 'pii_scrub', 'context_windows',
              # round-4: state-table/materialization/codec family
              'dedup_incremental', 'materialize_sequences',
              'kg_merge_apply', 'multimodal_decode',
              'paragraph_dedup', 'ann_query_topk',
              'dup_spans', 'rare_tokens', 'remove_dup_spans']:
        fn = entry.queries()[q]
        timed(q, lambda fn=fn: fn(spark, sf_dir).count())

    total = round(sum(medians.values()), 3)
    kg_sec = round(medians['kg_extract']
                   + medians['kg_link_triples'], 3)
    result = {
        # value = the whole suite (KG spine + operator queries);
        # the KG spine alone is kg_sec / turns_per_sec
        'metric': 'suite_total',
        'value': total,
        'kg_sec': kg_sec,
        'unit': 'sec',
        'reps': REPS,
        'queries': medians,
        'queries_min': minima,
        'sf': sf,
        'turns': n_turns,
        'mentions': n_mentions,
        'triples': n_triples,
        'turns_per_sec': round(n_turns / max(kg_sec, 1e-9), 1),
        'cpus': cpus,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == '__main__':
    main()
