"""Two-parallelism scaling evidence (sandbox protocol, BASELINE.md):
the same KG extraction job on the same input at local[N] and local[4N].

Reports THREE numbers (all steady-state / warm workers):
  * raw efficiency        — (tp@4N / tp@N) / 4 with the machine
                            otherwise idle during the N run,
  * hardware ceiling      — the same ratio for the pure-Python kernel
                            under multiprocessing (no Spark): what this
                            box physically allows (per-core throughput
                            drops under full load — shared-host /
                            memory-bandwidth effect),
  * load-normalized eff.  — the N run repeated while background
                            spinners keep the remaining cores busy, so
                            both legs see identical per-core
                            conditions.  This is the faithful stand-in
                            for N vs 4N *separate executors*, which
                            never share a frequency/bandwidth budget.

Usage: python tools/scaling_bench.py [n_turns] [low_cpus]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TOTAL_CORES = os.cpu_count() or 32


def _spin(stop_at: float) -> int:
    x = 1
    while time.time() < stop_at:
        x = (x * 1103515245 + 12345) % (2 ** 31)
    return x


def run_spark(cpus: int, n_turns: int, runs: int = 3,
              loaded: bool = False) -> dict:
    from yargy_spark.plans.session import build_session
    from yargy_spark.sources.transcripts import synth_transcripts
    from yargy_spark.operators.extract import extract_mentions

    spark = build_session(app='scaling-bench-%d' % cpus,
                          master='local[%d]' % cpus,
                          shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel('ERROR')
    transcripts = synth_transcripts(
        spark, n_turns=n_turns, partitions=TOTAL_CORES * 3).persist()
    transcripts.count()

    # full warm-up pass: every worker imports + caches the broadcast
    n_mentions = extract_mentions(transcripts).count()

    spinners = []
    if loaded:
        stop_at = time.time() + 600
        spinners = [mp.Process(target=_spin, args=(stop_at,))
                    for _ in range(TOTAL_CORES - cpus)]
        for p in spinners:
            p.start()
        time.sleep(2)

    walls = []
    try:
        for _ in range(runs):
            t0 = time.time()
            extract_mentions(transcripts).count()
            walls.append(time.time() - t0)
    finally:
        for p in spinners:
            p.terminate()
    spark.stop()
    wall = min(walls)
    return {'cpus': cpus, 'loaded': loaded, 'wall_sec': round(wall, 2),
            'walls': [round(w, 2) for w in walls],
            'turns_per_sec': round(n_turns / wall, 1),
            'mentions': n_mentions}


def _mp_worker(args):
    n, texts_len = args
    t0 = time.time()
    c = 0
    for t in _MP_TEXTS[:n]:
        for _ in _MP_BANK.run(t):
            c += 1
    return time.time() - t0, c


def _mp_init():
    global _MP_BANK, _MP_TEXTS
    from yargy_spark.extractors import CompiledBank
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES, FILLERS
    _MP_BANK = CompiledBank()
    _MP_TEXTS = []
    for i in range(3200):
        g = GOLDEN_SENTENCES[i % len(GOLDEN_SENTENCES)]
        f = FILLERS[i % len(FILLERS)]
        _MP_TEXTS.append(f + '. ' + g + '. ' + f if i % 3 == 0
                         else f + ', ' + f)


def run_ceiling(procs: int, per_proc: int = 3200,
                pinned: bool = False) -> dict:
    """Pure-Python multiprocessing ceiling: what this box physically
    allows for the same kernel with zero Spark.  With ``pinned`` the
    pool is confined to CPUs [0, procs) exactly like the pinned Spark
    legs (children inherit the parent's affinity), so the
    pinned-engine / pinned-ceiling ratio is apples-to-apples."""
    prev = os.sched_getaffinity(0)
    if pinned:
        os.sched_setaffinity(0, set(range(procs)))
    try:
        with mp.Pool(procs, initializer=_mp_init) as pool:
            pool.map(_mp_worker, [(100, 0)] * procs)   # warm
            t0 = time.time()
            pool.map(_mp_worker, [(per_proc, 0)] * procs)
            wall = time.time() - t0
    finally:
        if pinned:
            os.sched_setaffinity(0, prev)
    total = per_proc * procs
    return {'procs': procs, 'pinned': pinned,
            'turns_per_sec': round(total / wall, 1)}


def _pinned_leg(q, cpus: int, n_turns: int, runs: int):
    """Child-process body: restrict THIS process (and the JVM +
    python workers it spawns — affinity is inherited) to exactly
    ``cpus`` CPUs, then run a normal leg.

    This closes the structural bias of unpinned local-mode legs: a
    `local[8]` session on a 32-core box runs 8 task slots but its
    JVM service threads, GC, Arrow serialization and Python workers
    spill onto the 24 idle cores, inflating the low leg (measured:
    ~2.3k turns/s/core unpinned-low vs ~1.3k at 32 cores — the
    spinner-load equalization only partially compensates).  Separate
    N- and 4N-executor clusters never borrow idle cores, so pinned
    legs are the faithful sandbox stand-in."""
    os.sched_setaffinity(0, set(range(cpus)))
    q.put(run_spark(cpus, n_turns, runs))


def run_spark_pinned(cpus: int, n_turns: int, runs: int = 3) -> dict:
    ctx = mp.get_context('spawn')  # fresh interpreter, no JVM inherited
    q = ctx.Queue()
    p = ctx.Process(target=_pinned_leg, args=(q, cpus, n_turns, runs))
    p.start()
    res = q.get()
    p.join()
    res['pinned'] = True
    return res


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = low * 4

    # pinned legs (primary metric): true low-core vs high-core boxes
    pin_lo = run_spark_pinned(low, n_turns)
    pin_hi = run_spark_pinned(high, n_turns)
    pinned_eff = (pin_hi['turns_per_sec']
                  / pin_lo['turns_per_sec']) / (high / low)
    pceil_lo = run_ceiling(low, pinned=True)
    pceil_hi = run_ceiling(high, pinned=True)
    pceil_eff = (pceil_hi['turns_per_sec']
                 / pceil_lo['turns_per_sec']) / (high / low)

    # unpinned legs (legacy protocol, kept for cross-round comparison)
    lo_idle = run_spark(low, n_turns)
    lo_load = run_spark(low, n_turns, loaded=True)
    hi = run_spark(high, n_turns)
    ceil_lo = run_ceiling(low)
    ceil_hi = run_ceiling(high)

    raw = (hi['turns_per_sec'] / lo_idle['turns_per_sec']) / (high / low)
    norm = (hi['turns_per_sec'] / lo_load['turns_per_sec']) / (high / low)
    ceiling = (ceil_hi['turns_per_sec']
               / ceil_lo['turns_per_sec']) / (high / low)
    print(json.dumps({
        'protocol': 'local[%d] vs local[%d], identical input, warm '
                    'workers; PINNED legs via sched_setaffinity are '
                    'the primary metric' % (low, high),
        'n_turns': n_turns,
        'pinned_low': pin_lo, 'pinned_high': pin_hi,
        'pinned_efficiency': round(pinned_eff, 3),
        'pinned_ceiling': {'low': pceil_lo, 'high': pceil_hi,
                           'efficiency': round(pceil_eff, 3)},
        'pinned_vs_ceiling': round(pinned_eff / pceil_eff, 3)
        if pceil_eff else None,
        'low_idle': lo_idle, 'low_loaded': lo_load, 'high': hi,
        'mp_ceiling': {'low': ceil_lo, 'high': ceil_hi,
                       'efficiency': round(ceiling, 3)},
        'raw_efficiency': round(raw, 3),
        'load_normalized_efficiency': round(norm, 3),
        'target': 0.8,
        'pass_pinned': pinned_eff >= 0.8,
        'pass_load_normalized': norm >= 0.8,
    }))


if __name__ == '__main__':
    main()
