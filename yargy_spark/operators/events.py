"""Event-stream operators Spark lacks natively: as-of join.

The reference has no temporal joins (SURVEY.md §2.7 relational view);
this is part of the corpus-level operator set a transcript/event
pipeline needs (e.g. attach the most recent error context to each
user action, or the latest tool result to a turn).

Spark-first design: no built-in ASOF JOIN, so it is expressed as the
classic union-and-carry composition — tag both sides, union, sort
within the join key by event time, and carry the latest right-side row
forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding window.  One shuffle on the join key, no range explosion,
no per-row Python; at 100 TB this beats a range join (which Catalyst
would plan as a broadcast-nested-loop or cartesian) by orders of
magnitude.

Skew caveat: the carry step is a WINDOW partitioned by the join key,
and AQE skew handling applies to shuffle joins, not window partitions
— one pathologically hot key still serializes through a single task.
``ts_bucket_width`` opts into the mitigation: the window partitions
by (key, time bucket) and each bucket's carry is seeded with the
latest right row from any earlier bucket, computed over skinny
per-bucket aggregates (see ``asof_join``).  For typical user-id
distributions the plain composition is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: str, left_ts: str = 'ts', right_ts: str = 'ts',
              right_cols=(), suffix: str = 'r_',
              ts_bucket_width=None) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` key (ties on ts include
    the right row, matching DuckDB/pandas ``merge_asof`` backward
    semantics).

    ``right`` must be unique per (on, right_ts); callers dedupe first
    so the matched row is deterministic.

    Null semantics match SQL joins / pandas ``merge_asof``: right rows
    with a null key or null timestamp can never match and are dropped;
    left rows with a null key or null timestamp come through with null
    right columns.

    ``ts_bucket_width`` (same units as the timestamp cast to double:
    seconds for timestamp columns, the raw value for numerics) opts
    into hot-key mitigation: the carry window partitions by
    (key, floor(ts / width)) so one hot key parallelizes across its
    time range instead of serializing through a single window task.
    Each bucket's carry is seeded with the latest right row from any
    EARLIER bucket; seeds are derived from per-(key, bucket)
    aggregates — |active buckets| rows, not data rows — so the extra
    cost is one skinny shuffle.  Results are identical to the
    unbucketed path (tested on a single-key skew fixture).
    """
    right_cols = list(right_cols)
    clash = sorted(set(left.columns)
                   & {suffix + c for c in right_cols})
    if clash:
        # a silent duplicate column name would poison every later
        # select/write with AMBIGUOUS_REFERENCE
        raise ValueError(
            'asof_join output columns collide with left columns: %s '
            '(pass a different suffix)' % clash)
    # left rows ride the union as a struct payload; each right row
    # carries its columns as ONE struct so the window always attaches
    # a complete right row — carrying columns independently would let
    # a null field in the latest right row backfill from an OLDER row,
    # fabricating a mixed row.  At equal ts the right row sorts first
    # (_side 0 < 1) so backward as-of includes same-instant matches.
    left_payload = F.struct(*[F.col(c) for c in left.columns])
    right_payload = F.struct(*[F.col(c) for c in right_cols])
    ru = (right
          .where(F.col(on).isNotNull()
                 & F.col(right_ts).isNotNull())
          .select(F.col(on).alias('_on'),
                  F.col(right_ts).alias('_ts'),
                  F.lit(0).alias('_side'),
                  right_payload.alias('_rrow')))
    lu = left.select(
        F.col(on).alias('_on'), F.col(left_ts).alias('_ts'),
        F.lit(1).alias('_side'),
        F.lit(None).cast(ru.schema['_rrow'].dataType).alias('_rrow'),
        left_payload.alias('_row'))
    ru = ru.withColumn(
        '_row', F.lit(None).cast(lu.schema['_row'].dataType))

    union = lu.unionByName(ru)
    if ts_bucket_width is None:
        w = (Window.partitionBy('_on').orderBy('_ts', '_side')
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
        carried = union.select(
            '_side', '_row', '_ts',
            F.last('_rrow', ignorenulls=True).over(w).alias('_rrow'))
    else:
        # hot-key mitigation: partition the carry by (key, time
        # bucket).  Bucket ids only need to be monotone in ts, so the
        # double cast (epoch seconds for timestamps; TIMESTAMP_NTZ
        # must route through a timestamp cast first) is safe.
        tscol = F.col('_ts')
        if dict(union.dtypes)['_ts'].startswith('timestamp'):
            tscol = tscol.cast('timestamp')
        # null-ts left rows get a sentinel bucket below every real one
        # (the seeds equi-join would drop a null bucket key; `matched`
        # masks their output anyway, so only row retention matters)
        union = union.withColumn(
            '_bkt', F.coalesce(
                F.floor(tscol.cast('double')
                        / F.lit(float(ts_bucket_width))),
                F.lit(-(1 << 62)).cast('long')))
        # latest right row per (key, bucket) — right is unique per
        # (on, ts) so max_by is deterministic.  Skinny: one row per
        # ACTIVE bucket, with map-side partial aggregation.
        lastr = (union.where(F.col('_side') == 0)
                 .groupBy('_on', '_bkt')
                 .agg(F.max_by('_rrow', '_ts').alias('_last_r')))
        # seed(b) = latest right row in any EARLIER bucket; the seed
        # window runs over |active buckets| rows per key, not data
        # rows.  Left-only buckets join in with a null _last_r and
        # inherit their seed the same way (null-ts rows land in a
        # null bucket whose output is masked by `matched` below).
        bkts = union.select('_on', '_bkt').distinct()
        wseed = (Window.partitionBy('_on').orderBy('_bkt')
                 .rowsBetween(Window.unboundedPreceding, -1))
        seeds = (bkts.join(lastr, ['_on', '_bkt'], 'left')
                 .select(F.col('_on').alias('_son'),
                         F.col('_bkt').alias('_sbkt'),
                         F.last('_last_r', ignorenulls=True)
                         .over(wseed).alias('_seed')))
        w = (Window.partitionBy('_on', '_bkt')
             .orderBy('_ts', '_side')
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
        # null-SAFE on the key: left rows with a null join key must
        # come through unmatched (they do in the unbucketed window,
        # which groups nulls together) — a plain equi-join on _on
        # would silently drop them.  _bkt is never null (sentinel).
        carried = (union.join(
                       seeds,
                       F.col('_on').eqNullSafe(F.col('_son'))
                       & (F.col('_bkt') == F.col('_sbkt')))
                   .select('_side', '_row', '_ts',
                           F.coalesce(
                               F.last('_rrow', ignorenulls=True)
                               .over(w),
                               F.col('_seed')).alias('_rrow')))
    matched = F.when(F.col('_ts').isNotNull(), F.col('_rrow'))
    return (carried.where(F.col('_side') == 1)
            .select(F.col('_row.*'),
                    *[matched[c].alias(suffix + c)
                      for c in right_cols]))
