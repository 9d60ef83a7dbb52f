"""End-to-end KG construction pipeline (the north_rule spine):

    transcripts -> extract (mapInPandas, broadcast grammar)
                -> mentions
                -> entity linking (blocking + star edges + CC)
                -> canonicalization
                -> triples
                -> partitioned parquet + manifest (resume, lineage,
                   counters)

``run_pipeline`` is the in-memory flow (tests/bench); ``run_resumable``
adds the bucket-granular checkpoint/resume and metrics layer.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract import extract_mentions
from .operators.linking import (apply_entity_merges, entity_key_table,
                                link_entities,
                                link_entities_incremental)
from .operators.triples import materialize_triples
from .sources import manifest as mf


def run_pipeline(transcripts: DataFrame,
                 extractor_names=None) -> Dict[str, DataFrame]:
    mentions = extract_mentions(transcripts, extractor_names).persist()
    entities = None
    try:
        # entity links feed triples AND get counted/written downstream
        # — persist so the connected-components chain runs exactly once
        entities = link_entities(mentions).persist()
        triples = materialize_triples(mentions, entities)
    except Exception:
        # CC non-convergence etc.: don't leave caches pinned in
        # executor storage for the life of the session
        mentions.unpersist()
        if entities is not None:
            entities.unpersist()
        raise
    return {'mentions': mentions, 'entities': entities,
            'triples': triples}


def _extract_phase(transcripts: DataFrame, m_root: str,
                   n_buckets: int, extractor_names,
                   chunk_size: int):
    """PHASE 1 shared by the batch and increment jobs: extract the
    pending buckets in chunks, each chunk's mentions committing
    atomically to ``m_root`` (bucket-granular checkpoint/resume)."""
    pending = mf.pending_buckets(m_root, n_buckets)
    # turns_in: ONE scan over all pending buckets (not one per chunk;
    # the column-pruned count reads conv_id only)
    bucketed = mf.with_bucket(transcripts, n_buckets)
    n_turns = (bucketed
               .where(F.col(mf.BUCKET_COL).isin(pending))
               .count()) if pending else 0
    chunk_stats = {'mentions': 0, 'chunks': 0}
    for i in range(0, len(pending), chunk_size):
        chunk = pending[i:i + chunk_size]
        # NOTE scan cost: on a bucket-partitioned source (the design
        # point — manifest tables / Iceberg), this filter prunes the
        # chunk's scan to its own buckets; on an unpartitioned source
        # each chunk scans the full input, so size chunk_size (or
        # pre-bucket the source) to trade resumability granularity
        # against scan count.
        src = bucketed.where(F.col(mf.BUCKET_COL).isin(chunk))
        mentions = extract_mentions(
            src, extractor_names,
            passthrough=(mf.BUCKET_COL,)).persist()
        try:
            n_mentions = mentions.count()
            mf.commit_append(
                mentions, m_root, note='mentions',
                counters={'mentions': n_mentions, 'buckets': chunk},
                expected_buckets=chunk, n_buckets=n_buckets)
        finally:
            mentions.unpersist()
        chunk_stats['mentions'] += n_mentions
        chunk_stats['chunks'] += 1
    return pending, n_turns, chunk_stats


def _last_replace(root: str) -> Optional[dict]:
    return next(
        (s for s in reversed(mf.snapshots(root)) if s.get('replace')),
        None)


def run_resumable(spark: SparkSession, transcripts: DataFrame,
                  out_root: str, n_buckets: int = 16,
                  extractor_names=None,
                  chunk_size: int = 4) -> Optional[dict]:
    """Two-phase resumable pipeline:

    PHASE 1 — extraction (bucket-granular, incremental): pending
    buckets are processed in chunks of ``chunk_size`` and each chunk's
    MENTIONS commit atomically to ``<out_root>/mentions`` — a mid-run
    kill loses at most one chunk, and restart resumes from the
    manifest (true partition-granular checkpoint/resume).

    PHASE 2 — linking + triples (global, snapshot-consistent): entity
    resolution is a GLOBAL computation (blocking keys cross buckets),
    so it always runs over ALL committed mentions and the triples
    table at ``<out_root>/triples`` is committed as a full-REPLACE
    snapshot stamped with the mentions snapshot it derived from.
    Linking only a pending subset would mint conflicting entity_ids
    for the same real-world entity across snapshots.

    Re-running after success is a no-op (no pending buckets AND the
    triples snapshot is already derived from the current mentions
    head).  ``n_buckets`` is recorded in the manifests and a rerun
    with a different value is refused (silent bucket-count drift
    would duplicate committed conversations)."""
    m_root = f'{out_root}/mentions'
    t_root = f'{out_root}/triples'
    k_root = f'{out_root}/entity_keys'
    mf.check_n_buckets(m_root, n_buckets)

    t0 = time.time()
    pending, n_turns, chunk_stats = _extract_phase(
        transcripts, m_root, n_buckets, extractor_names, chunk_size)

    head = mf.current_snapshot(m_root)
    if head is None:
        return None  # no mentions table at all, nothing to link
    last_triples = _last_replace(t_root)
    last_keys = _last_replace(k_root)
    if not pending and \
            last_triples and \
            last_triples.get('source_snapshot') == head and \
            last_keys and last_keys.get('source_snapshot') == head:
        # extraction AND both derived tables already up to date (the
        # keys check also upgrades pre-entity_keys table roots on
        # their next run instead of nooping past them)
        return None

    if mf.committed_data_dirs(m_root):
        all_mentions = mf.read_table(spark, m_root)
    else:
        # every committed chunk was empty (e.g. no turn matched any
        # trigger): derive an empty-but-committed triples snapshot so
        # reruns reach the no-op path instead of failing forever
        from .operators.extract import MENTION_SCHEMA
        all_mentions = (spark.createDataFrame([], MENTION_SCHEMA)
                        .withColumn(mf.BUCKET_COL,
                                    F.lit(0).cast('int')))
    entities = link_entities(all_mentions).persist()
    try:
        # the entity-key state (the increment jobs' prior-corpus
        # representation) commits FIRST: a crash between the two
        # REPLACE commits leaves the triples snapshot stale, so the
        # rerun re-derives both — committing triples first would let
        # the noop check skip a keys table that was never written
        keys = mf.with_bucket(
            entity_key_table(all_mentions, entities), n_buckets,
            key='norm_key')
        mf.commit_replace(keys, k_root, note='entity_keys',
                          source_snapshot=head, n_buckets=n_buckets)
        triples = mf.with_bucket(
            materialize_triples(all_mentions, entities), n_buckets)
        counters = {
            'turns_in': n_turns,
            'mentions': chunk_stats['mentions'],
            'extraction_chunks': chunk_stats['chunks'],
            'entities': entities.select('entity_id')
                                .distinct().count(),
            'wall_sec': round(time.time() - t0, 3),
            'buckets': pending,
        }
        snap = mf.commit_replace(triples, t_root, note='triples',
                                 counters=counters,
                                 source_snapshot=head,
                                 n_buckets=n_buckets)
    finally:
        entities.unpersist()
    return snap


def run_incremental(spark: SparkSession, new_transcripts: DataFrame,
                    base_root: str, out_root: str,
                    n_buckets: int = 16, extractor_names=None,
                    chunk_size: int = 4) -> Optional[dict]:
    """The bounded-staleness increment job: link a NEW transcript
    batch against a batch-built base (``run_resumable`` output) via
    ``link_entities_incremental`` — global CC never reruns over the
    base, only the base's entity_keys state table enters the plan.

    Same two-phase shape as the batch job: PHASE 1 commits the
    increment's mentions bucket-granularly to ``<out_root>/mentions``;
    PHASE 2 REPLACE-commits ``<out_root>/entity_keys`` (the prior
    state rolled forward with this batch's keys — the NEXT increment
    chains off this root: daily cadence is base -> day1 -> day2 ...
    without re-minting earlier days' fresh entities),
    ``<out_root>/merge_candidates`` (prior-entity pairs the increment
    connects — the work-list that schedules the next full base
    re-link) and ``<out_root>/triples``, each stamped with BOTH the
    increment-mentions snapshot and the base entity_keys snapshot it
    linked against.  A rerun is a no-op only while both are
    unchanged; a re-linked base (new keys snapshot) re-derives the
    increment's links."""
    if out_root == base_root:
        raise ValueError(
            'increment out_root must differ from base_root — each '
            'increment batch is its own table root (its mentions '
            'manifests would otherwise collide with the base and '
            'noop past the new conversations)')
    m_root = f'{out_root}/mentions'
    t_root = f'{out_root}/triples'
    c_root = f'{out_root}/merge_candidates'
    k_root = f'{base_root}/entity_keys'

    keys_snap = mf.current_snapshot(k_root)
    if keys_snap is None:
        raise ValueError(
            'no entity_keys state at %s — build the base with '
            'run_resumable (jobs/run_kg.py) first' % k_root)
    mf.check_n_buckets(m_root, n_buckets)

    t0 = time.time()
    pending, n_turns, chunk_stats = _extract_phase(
        new_transcripts, m_root, n_buckets, extractor_names,
        chunk_size)

    head = mf.current_snapshot(m_root)
    if head is None:
        return None
    last_triples = _last_replace(t_root)
    if not pending and last_triples and \
            last_triples.get('source_snapshot') == head and \
            last_triples.get('counters', {}) \
                        .get('base_keys_snapshot') == keys_snap:
        return None  # increment AND base state both unchanged

    if mf.committed_data_dirs(m_root):
        new_mentions = mf.read_table(spark, m_root)
    else:
        from .operators.extract import MENTION_SCHEMA
        new_mentions = (spark.createDataFrame([], MENTION_SCHEMA)
                        .withColumn(mf.BUCKET_COL,
                                    F.lit(0).cast('int')))
    prior_keys = (mf.read_table(spark, k_root)
                  .select('norm_key', 'entity_id', 'canonical'))
    links, merges = link_entities_incremental(new_mentions,
                                              prior_keys)
    links = links.persist()
    try:
        stamp = {'source_snapshot': head, 'n_buckets': n_buckets}
        # roll the key state FORWARD: prior keys plus the increment's
        # (adopted rows repeat prior mappings; fresh keys are new by
        # construction) — committed to <out_root>/entity_keys so the
        # NEXT increment can chain off this root instead of re-minting
        # this batch's fresh entities.  min() is the same
        # belt-and-braces determinism entity_key_table uses.
        inc_keys = entity_key_table(new_mentions, links)
        canon = (prior_keys.select('entity_id', 'canonical')
                 .unionByName(inc_keys.select('entity_id',
                                              'canonical'))
                 .distinct())
        state = (prior_keys.select('norm_key', 'entity_id')
                 .unionByName(inc_keys.select('norm_key',
                                              'entity_id'))
                 .groupBy('norm_key')
                 .agg(F.min('entity_id').alias('entity_id'))
                 .join(canon, 'entity_id')
                 .select('norm_key', 'entity_id', 'canonical'))
        mf.commit_replace(
            mf.with_bucket(state, n_buckets, key='norm_key'),
            f'{out_root}/entity_keys', note='entity_keys',
            counters={'base_keys_snapshot': keys_snap}, **stamp)
        merge_snap = mf.commit_replace(
            mf.with_bucket(merges, n_buckets, key='entity_a'),
            c_root, note='merge_candidates',
            counters={'base_keys_snapshot': keys_snap}, **stamp)
        triples = mf.with_bucket(
            materialize_triples(new_mentions, links), n_buckets)
        counters = {
            'turns_in': n_turns,
            'mentions': chunk_stats['mentions'],
            'extraction_chunks': chunk_stats['chunks'],
            'entities': links.select('entity_id')
                             .distinct().count(),
            'merge_candidates': merge_snap['totals']['rows'],
            'base_keys_snapshot': keys_snap,
            'wall_sec': round(time.time() - t0, 3),
            'buckets': pending,
        }
        snap = mf.commit_replace(triples, t_root, note='triples',
                                 counters=counters, **stamp)
    finally:
        links.unpersist()
    return snap


def run_apply_merges(spark: SparkSession, inc_root: str,
                     out_root: str, n_buckets: int = 16,
                     triples_roots=()) -> Optional[dict]:
    """The merge-APPLY job closing the incremental loop: resolve the
    ``merge_candidates`` work-list an increment committed (via
    ``apply_entity_merges`` — CC over the candidate graph, numeric-min
    survivor per component) and commit the outcome, so a KG operator
    has a middle path between ignoring merges and a full re-link:

    * ``<out_root>/entity_keys`` — the increment's rolled-forward key
      state REWRITTEN (retired ids -> survivor id + canonical).  The
      NEXT increment chains off ``out_root`` and sees merged ids.
    * ``<out_root>/entity_merges`` — the audit mapping, one row per
      retired entity.  Merges stay explicit and reviewable, never
      silent.
    * ``<out_root>/triples_patch`` — for every root in
      ``triples_roots``: corrected rows for triples whose subject was
      retired.  Consumers apply it as anti-join(retired) + union;
      the next full re-link supersedes it.

    Both reads are stamped: rerun is a noop while the candidates
    snapshot AND the keys snapshot are unchanged; a re-committed
    upstream re-derives everything (same bounded-staleness contract
    as ``run_incremental``)."""
    if out_root == inc_root:
        raise ValueError(
            'merge-apply out_root must differ from inc_root — the '
            'rewritten entity_keys is a new state root the next '
            'increment chains from')
    c_root = f'{inc_root}/merge_candidates'
    k_root = f'{inc_root}/entity_keys'
    cand_snap = mf.current_snapshot(c_root)
    keys_snap = mf.current_snapshot(k_root)
    if cand_snap is None or keys_snap is None:
        raise ValueError(
            'no merge_candidates/entity_keys state under %s — run '
            'the increment job (jobs/run_kg_increment.py) first'
            % inc_root)
    out_keys_root = f'{out_root}/entity_keys'
    mf.check_n_buckets(out_keys_root, n_buckets)
    # the noop gate keys on entity_merges — the LAST commit below —
    # so a crash between commits re-derives everything on rerun
    # (same crash-ordering discipline as run_resumable's keys-first)
    last = _last_replace(f'{out_root}/entity_merges')
    if last and last.get('source_snapshot') == keys_snap and \
            last.get('counters', {}).get(
                'candidates_snapshot') == cand_snap:
        return None  # candidates AND key state both unchanged

    t0 = time.time()
    if mf.committed_data_dirs(c_root):
        candidates = mf.read_table(spark, c_root)
    else:
        # a committed-but-empty work-list (increments that bridged
        # nothing) writes no data dirs; apply degrades to an identity
        # rewrite so the chain (inc -> apply -> inc) stays uniform
        candidates = spark.createDataFrame(
            [], 'entity_a string, entity_b string, conv_id string, '
                'last_lemma string')
    prior_keys = (mf.read_table(spark, k_root)
                  .select('norm_key', 'entity_id', 'canonical'))
    if triples_roots:
        frames = [mf.read_table(spark, f'{r}/triples')
                  .drop(mf.BUCKET_COL) for r in triples_roots]
        triples = frames[0]
        for fr in frames[1:]:
            triples = triples.unionByName(fr)
        mapping, new_keys, patch = apply_entity_merges(
            candidates, prior_keys, triples)
    else:
        mapping, new_keys = apply_entity_merges(candidates,
                                                prior_keys)
        patch = None

    # the mapping feeds the audit commit, the counters AND (via
    # new_keys/patch plans) both rewrites — pin it once
    mapping = mapping.persist()
    try:
        stamp = {'source_snapshot': keys_snap, 'n_buckets': n_buckets}
        counters = {'candidates_snapshot': cand_snap,
                    'retired_entities': mapping.count(),
                    'wall_sec': None}
        mf.commit_replace(
            mf.with_bucket(new_keys, n_buckets, key='norm_key'),
            out_keys_root, note='entity_keys',
            counters=counters, **stamp)
        if patch is not None:
            mf.commit_replace(
                mf.with_bucket(patch, n_buckets, key='subj'),
                f'{out_root}/triples_patch', note='triples_patch',
                counters=dict(counters,
                              triples_roots=list(triples_roots)),
                **stamp)
        counters['wall_sec'] = round(time.time() - t0, 3)
        snap = mf.commit_replace(
            mf.with_bucket(mapping, n_buckets, key='entity_id'),
            f'{out_root}/entity_merges', note='entity_merges',
            counters=counters, **stamp)
    finally:
        mapping.unpersist()
    return snap


def run_dedup_increment(spark: SparkSession, new_docs: DataFrame,
                        base_root: str, out_root: str,
                        n_buckets: int = 8) -> Optional[dict]:
    """The incremental DEDUP job: check a new document batch against
    the ``minhash_state`` committed by jobs/run_dedup.py (or a prior
    increment) via ``dedup_increment`` — the dedup mirror of
    ``run_incremental``'s bounded-staleness contract.  Historical
    text never enters the plan; only the rep-bounded state table
    does.

    Commits to ``<out_root>``:

    * ``dup_pairs`` — (a, b, jaccard_x10000, vs_state): vs_state=1
      pairs a state doc with a batch doc, vs_state=0 is the batch's
      internal ``minhash_lsh_pairs`` semantics.
    * ``minhash_state`` — the prior state rolled forward with the
      batch's surviving representatives; the NEXT increment chains
      off ``out_root`` (daily cadence: base -> day1 -> day2 ...),
      and a monthly full jobs/run_dedup.py run compacts the
      documented pruned-survivor drift.

    The noop gate keys on the LAST commit (minhash_state) and on
    BOTH the base state snapshot and a deterministic batch content
    stamp, so a rerun is a noop only while base state and batch are
    unchanged; a crash between the two commits re-derives everything
    on rerun (run_apply_merges' crash-ordering discipline)."""
    from .operators.dedup import dedup_increment, md5_int
    if out_root == base_root:
        raise ValueError(
            'dedup increment out_root must differ from base_root — '
            'each increment batch is its own state root the next '
            'batch chains from')
    s_base = f'{base_root}/minhash_state'
    state_snap = mf.current_snapshot(s_base)
    if state_snap is None:
        raise ValueError(
            'no minhash_state at %s — build the base with '
            'jobs/run_dedup.py first' % s_base)
    s_out = f'{out_root}/minhash_state'
    p_root = f'{out_root}/dup_pairs'
    mf.check_n_buckets(s_out, n_buckets)
    # the pairs root too: a rerun after a crash BETWEEN the two
    # commits would otherwise pass the state-root check and append
    # pairs bucketed at a different n_buckets into the same table
    mf.check_n_buckets(p_root, n_buckets)

    # batch content stamp: one aggregation over the increment (which
    # is batch-sized by definition) — a changed batch re-derives even
    # when the base state snapshot is unchanged.  The TEXT enters via
    # an order-independent sum of 31-bit content hashes (review
    # finding: an id-only stamp would noop past re-extracted text
    # under unchanged doc_ids; hashes are reduced mod 2^31-1 BEFORE
    # summing so ANSI sum cannot overflow below ~2^32-doc batches)
    row = new_docs.agg(F.count('*').alias('n'),
                       F.sum('doc_id').alias('s'),
                       F.max('doc_id').alias('m'),
                       F.sum(md5_int(F.col('text'))
                             % F.lit(2_147_483_647)).alias('t')
                       ).collect()[0]
    batch_stamp = '%s:%s:%s:%s' % (row['n'], row['s'], row['m'],
                                   row['t'])
    last = _last_replace(s_out)
    if last and last.get('source_snapshot') == state_snap and \
            last.get('counters', {}).get('batch_stamp') == batch_stamp:
        return None  # base state AND batch both unchanged

    t0 = time.time()
    state = (mf.read_table(spark, s_base)
             .select('doc_id', 'sig', 'shs', 'sz'))
    pairs, new_state = dedup_increment(new_docs, state)
    pairs = pairs.persist()
    try:
        stamp = {'source_snapshot': state_snap, 'n_buckets': n_buckets}
        counters = {
            'batch_stamp': batch_stamp,
            'docs_in': int(row['n']),
            'pairs': pairs.count(),
            'vs_state_pairs': pairs.where(
                F.col('vs_state') == 1).count(),
            'wall_sec': None,
        }
        mf.commit_replace(
            mf.with_bucket(pairs, n_buckets, key='b'), p_root,
            note='dup_pairs', counters=counters, **stamp)
        counters['wall_sec'] = round(time.time() - t0, 3)
        snap = mf.commit_replace(
            mf.with_bucket(new_state, n_buckets, key='doc_id'),
            s_out, note='minhash_state', counters=counters, **stamp)
    finally:
        pairs.unpersist()
    return snap


def run_stream_dedup_bridge(spark: SparkSession, src_dir: str,
                            base_root: str, out_root: str,
                            n_buckets: int = 8,
                            watermark: str = '10 minutes',
                            window: str = '5 minutes') -> dict:
    """Bridge the STREAMING near-dup signal into the COMMITTED dedup
    state: drain the docs stream, then roll every CLOSED event-time
    window into the ``minhash_state``/``dup_pairs`` chain the batch
    and increment jobs maintain — window-close -> exact-verify ->
    state roll-forward.

    Stage A (stream, exactly-once via checkpoints under ``out_root``):
      * ``<out>/windows`` — per-window doc counts in APPEND mode:
        a watermarked aggregation emits a window only once the
        watermark passes it, so presence in this sink IS the
        window-close signal.  EVERY closed window lands here
        (collision or not: quiet windows must still roll into state,
        or later collisions against their docs are lost).
      * ``<out>/collisions`` — ``stream_band_collisions`` in append
        mode: the in-stream candidate signal (band bucket with >= 2
        docs).  Observability + the restart test's assertion surface;
        the exact-verify below re-derives candidates from the SAME
        band layout, so a collision here is by construction a
        candidate there.
      (Two drains of the source; at scale fan both out of one
      foreachBatch instead.)

    Stage B (batch): for each closed window, ascending, feed the
    window's docs to ``run_dedup_increment`` against the CHAINED root
    (base -> win1 -> win2 ...), committing that window's verified
    ``dup_pairs`` and rolled ``minhash_state``.  Reruns: the stream
    drains nothing new and every increment noops on its (state
    snapshot, batch stamp); a crash mid-chain noops the committed
    prefix and re-derives the suffix.  The still-open tail window(s)
    of a drained static source commit on a LATER bridge run, once
    newer data advances the watermark past them.

    Contract guard: window docs must carry doc_ids above every id
    already in the chained state (the increment operator's
    ids-time-ordered contract) — violated input raises rather than
    committing misoriented pairs."""
    from .streaming.dedup import stream_band_collisions

    src_schema = 'doc_id long, text string, ts timestamp'

    def drain(df, sub):
        (df.writeStream.format('parquet')
         .option('path', f'{out_root}/{sub}')
         .option('checkpointLocation', f'{out_root}/_chk_{sub}')
         .outputMode('append')
         .trigger(availableNow=True)
         .start().awaitTermination())

    stream = spark.readStream.schema(src_schema).json(src_dir)
    drain(stream
          .withWatermark('ts', watermark)
          .groupBy(F.window('ts', window))
          .agg(F.count('*').alias('n_docs'),
               F.min('doc_id').alias('min_doc'),
               F.max('doc_id').alias('max_doc'))
          .select(F.unix_timestamp('window.start').alias('win_start'),
                  F.unix_timestamp('window.end').alias('win_end'),
                  'n_docs', 'min_doc', 'max_doc'),
          'windows')
    stream2 = spark.readStream.schema(src_schema).json(src_dir)
    drain(stream_band_collisions(stream2, watermark=watermark,
                                 window=window),
          'collisions')

    closed = sorted(
        (int(r['win_start']), int(r['win_end']))
        for r in spark.read.parquet(f'{out_root}/windows')
        .select('win_start', 'win_end').distinct().collect())

    docs = spark.read.schema(src_schema).json(src_dir)
    prev, committed, nooped = base_root, [], []
    for win_start, win_end in closed:
        win_root = f'{out_root}/win={win_start}'
        batch = (docs.where(
            (F.col('ts').cast('long') >= win_start)
            & (F.col('ts').cast('long') < win_end))
            .select('doc_id', 'text'))
        state_max = mf.read_table(
            spark, f'{prev}/minhash_state').agg(
            F.max('doc_id')).collect()[0][0]
        batch_min = batch.agg(F.min('doc_id')).collect()[0][0]
        if batch_min is not None and state_max is not None \
                and batch_min <= state_max:
            raise ValueError(
                'window %d docs start at id %d but the chained state '
                'already holds id %d — the stream source violates '
                'the ids-time-ordered increment contract'
                % (win_start, batch_min, state_max))
        snap = run_dedup_increment(spark, batch, prev, win_root,
                                   n_buckets=n_buckets)
        (committed if snap is not None else nooped).append(win_start)
        prev = win_root
    return {'windows': [w for w, _ in closed],
            'committed': committed, 'nooped': nooped,
            'head_root': prev}
