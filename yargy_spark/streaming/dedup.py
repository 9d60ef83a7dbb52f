"""Streaming exact deduplication for continuously ingesting corpora.

Batch dedup (``operators/dedup.exact_dedup``) answers "which docs are
copies" over a complete corpus; an ingesting pipeline needs the
complement: emit each NEW document once and drop copies *as they
arrive*.  ``dropDuplicatesWithinWatermark`` does that with state
bounded by the watermark horizon — a copy arriving within
``watermark`` of the first sighting is dropped; a re-arrival after
the horizon re-emits and is reconciled by the batch dedup downstream
(the standard streaming/batch split of a data pipeline).

State is keyed on a compound 124-bit hash of the normalized text
(the portable 60-bit md5 prefix the whole dedup family shares +
``xxhash64``), NOT the text itself: state-store entries stay ~16 B
per distinct document instead of the full text, and the compound key
pushes the birthday-collision horizon far past corpus scale (~2^62
docs) — the single-hash collision caveat that applies to batch
grouping (see ``exact_dedup``) is solved here by widening the key,
because streaming state cannot afford to carry the text for
equality confirmation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _norm_text, md5_int


def stream_exact_dedup(docs: DataFrame, ts_col: str = 'ts',
                       watermark: str = '10 minutes') -> DataFrame:
    """First-copy-wins streaming dedup on normalized text.

    Emits each distinct normalized text once per watermark horizon,
    with ``text_hash`` (the family's portable 60-bit hash) and
    ``text_hash2`` (xxhash64) columns added.  Which physical copy
    survives follows arrival order (micro-batch semantics); the KEY
    SET emitted is deterministic, so downstream consumers that need
    engine-reproducible output should project the hash columns (the
    driver-gated ``stream_dedup`` query does exactly that).
    """
    norm = _norm_text(F.col('text'))
    keyed = (docs
             .withColumn('text_hash', md5_int(norm))
             .withColumn('text_hash2', F.xxhash64(norm)))
    return (keyed
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(['text_hash', 'text_hash2']))


def stream_band_collisions(docs: DataFrame, ts_col: str = 'ts',
                           watermark: str = '10 minutes',
                           window: str = '5 minutes',
                           k: int = 3) -> DataFrame:
    """Streaming NEAR-dup detection — the banding complement of
    ``stream_exact_dedup`` (which catches exact copies only): per
    event-time window, every MinHash band bucket that two or more
    documents land in is reported with its population and its
    min-doc witness.  A bucket collision is exactly the batch LSH
    candidate signal (operators/dedup._minhash_rep_pairs), so
    downstream either verifies the window's collisions with exact
    Jaccard in a micro-batch job or feeds them to the committed-state
    incremental dedup (pipeline.run_dedup_increment).

    Shape: the signature is computed IN-ROW (``row_signatures`` —
    map-only, no pre-shuffle), bands explode map-side, and the ONLY
    stateful op is a watermark-bounded windowed count keyed on
    (window, band, 60-bit band hash) — ~24 B of state per ACTIVE
    bucket, and append-mode results are deterministic regardless of
    micro-batch boundaries (an arbitrary-state keeper election would
    not be).  (win_start, band, band_hash, n_docs, min_doc)."""
    from ..operators.dedup import _sig_bands, row_signatures
    sigged = (row_signatures(docs, k, extra_cols=(ts_col,))
              .where(F.col('sig')[0].isNotNull()))
    # the SAME band layout the batch LSH and the incremental state
    # use (operators/dedup._sig_bands) — one definition, no drift
    bands = _sig_bands(sigged, extra_cols=(ts_col,), hashed=True)
    return (bands
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window), 'band', 'band_hash')
            .agg(F.count('*').alias('n_docs'),
                 F.min('doc_id').alias('min_doc'))
            .where(F.col('n_docs') > 1)
            .select(F.unix_timestamp(F.col('window.start'))
                    .alias('win_start'),
                    'band', 'band_hash', 'n_docs', 'min_doc'))
