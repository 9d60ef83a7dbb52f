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
from .operators.linking import link_entities
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
    mf.check_n_buckets(m_root, n_buckets)

    t0 = time.time()
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

    head = mf.current_snapshot(m_root)
    if head is None:
        return None  # no mentions table at all, nothing to link
    last_replace = next(
        (s for s in reversed(mf.snapshots(t_root)) if s.get('replace')),
        None)
    if not pending and last_replace and \
            last_replace.get('source_snapshot') == head:
        return None  # extraction AND derivation already up to date

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
