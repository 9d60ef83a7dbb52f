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
    # entity links feed triples AND get counted/written downstream —
    # persist so the connected-components chain runs exactly once
    entities = link_entities(mentions).persist()
    triples = materialize_triples(mentions, entities)
    return {'mentions': mentions, 'entities': entities,
            'triples': triples}


def run_resumable(spark: SparkSession, transcripts: DataFrame,
                  out_root: str, n_buckets: int = 16,
                  extractor_names=None) -> Optional[dict]:
    """Process only buckets absent from the output manifest; write one
    snapshot covering them, with per-partition lineage + counters.
    Re-running after success is a no-op; killing mid-run and
    restarting picks up the unfinished buckets only."""
    pending = mf.pending_buckets(out_root, n_buckets)
    if not pending:
        return None

    src = mf.with_bucket(transcripts, n_buckets)
    src = src.where(F.col(mf.BUCKET_COL).isin(pending))

    t0 = time.time()
    # turns_in scans only the columns the bucket filter needs (conv_id)
    # thanks to column pruning; the data columns are read once, by the
    # extraction pass below
    n_turns = src.count()
    flows = run_pipeline(src.drop(mf.BUCKET_COL), extractor_names)
    triples = mf.with_bucket(flows['triples'], n_buckets).persist()
    try:
        counters = {
            'turns_in': n_turns,
            'mentions': flows['mentions'].count(),
            'entities': flows['entities'].select('entity_id')
                                         .distinct().count(),
            'triples': triples.count(),
            'wall_sec': round(time.time() - t0, 3),
            'buckets': pending,
        }
        # expected_buckets: zero-triple buckets get lineage entries in
        # the same atomic manifest write, else resume reprocesses them
        # forever
        snap = mf.commit_append(triples, out_root, note='triples',
                                counters=counters,
                                expected_buckets=pending)
    finally:
        flows['mentions'].unpersist()
        flows['entities'].unpersist()
        triples.unpersist()
    return snap
