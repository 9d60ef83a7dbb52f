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
For such keys, range-bucket the timestamp into the partition key
(window over (key, ts_bucket) with a per-bucket seed carried from the
previous bucket) or split the hot key upstream; for typical user-id
distributions the plain composition is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: str, left_ts: str = 'ts', right_ts: str = 'ts',
              right_cols=(), suffix: str = 'r_') -> DataFrame:
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

    w = (Window.partitionBy('_on').orderBy('_ts', '_side')
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lu.unionByName(ru).select(
        '_side', '_row', '_ts',
        F.last('_rrow', ignorenulls=True).over(w).alias('_rrow'))
    matched = F.when(F.col('_ts').isNotNull(), F.col('_rrow'))
    return (carried.where(F.col('_side') == 1)
            .select(F.col('_row.*'),
                    *[matched[c].alias(suffix + c)
                      for c in right_cols]))
