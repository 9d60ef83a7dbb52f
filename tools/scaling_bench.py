"""Two-parallelism scaling evidence (sandbox protocol, BASELINE.md):
the same KG extraction job on the same input at local[N] and local[4N];
reports throughput at both and scaling efficiency
  eff = (throughput@4N / throughput@N) / 4.

Usage: python tools/scaling_bench.py [n_turns] [low_cpus]
Writes one JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_once(cpus: int, n_turns: int) -> dict:
    from yargy_spark.plans.session import build_session
    from yargy_spark.sources.transcripts import synth_transcripts
    from yargy_spark.operators.extract import extract_mentions

    spark = build_session(app='scaling-bench-%d' % cpus,
                          master='local[%d]' % cpus,
                          shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel('ERROR')
    transcripts = synth_transcripts(
        spark, n_turns=n_turns, partitions=128).persist()
    transcripts.count()

    # warm-up pass (python worker spin-up, broadcast distribution)
    extract_mentions(transcripts.limit(2048)).count()

    t0 = time.time()
    n_mentions = extract_mentions(transcripts).count()
    wall = time.time() - t0
    spark.stop()
    return {'cpus': cpus, 'wall_sec': round(wall, 2),
            'turns_per_sec': round(n_turns / wall, 1),
            'mentions': n_mentions}


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = low * 4

    lo = run_once(low, n_turns)
    hi = run_once(high, n_turns)
    eff = (hi['turns_per_sec'] / lo['turns_per_sec']) / (high / low)
    print(json.dumps({
        'protocol': 'local[%d] vs local[%d], identical input' % (low, high),
        'n_turns': n_turns,
        'low': lo, 'high': hi,
        'scaling_efficiency': round(eff, 3),
        'target': 0.8,
        'pass': eff >= 0.8,
    }))


if __name__ == '__main__':
    main()
