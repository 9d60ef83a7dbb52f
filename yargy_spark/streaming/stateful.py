"""Custom stateful streaming operator: per-conversation entity state.

``applyInPandasWithState`` over the streaming mention table keeps one
state record per conversation (running mention total + distinct
person blocking keys) and emits an updated summary row whenever the
conversation receives new mentions.  State is SESSION-scoped: an idle
gap longer than the timeout finalizes the session (the stored summary
is emitted once more, then evicted — bounded state), and a
conversation that resumes later starts a fresh session from zero.
Every output row carries ``session_start`` (processing-time ms of
the session's first batch), so sinks can key on
(conv_id, session_start) — without it, a resumed session's smaller
totals would silently overwrite the finished session's row in
update-mode sinks.  Lifetime totals aggregate the emitted session
summaries downstream.

The reference has no streaming at all (SURVEY.md §1.3); this is the
Spark-native extension for the custom-stateful-operator pattern.

STATE SCHEMA v2 (session_start added): queries checkpointed under the
v1 two-field state cannot restart against this operator — state
schema evolution is not supported for applyInPandasWithState; restart
such queries with a fresh checkpoint location.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                               StringType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField('conv_id', StringType()),
    # session identifier: processing-time ms of the session's first
    # batch — lets sinks distinguish a resumed session from the
    # finished one it would otherwise overwrite
    StructField('session_start', LongType()),
    StructField('n_mentions', LongType()),
    StructField('n_person_keys', IntegerType()),
    StructField('person_keys', ArrayType(StringType())),
])

STATE_SCHEMA = StructType([
    StructField('session_start', LongType()),
    StructField('n_mentions', LongType()),
    StructField('person_keys', ArrayType(StringType())),
])


def _update(key: Tuple[str], batches: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # session end: surface the final summary once, then evict —
        # a later resumed session carries a NEW session_start, so its
        # rows can never overwrite this finished session's row in a
        # (conv_id, session_start)-keyed sink
        if state.exists:
            start, n, keys = state.get
            yield pd.DataFrame([{
                'conv_id': conv_id,
                'session_start': start,
                'n_mentions': n,
                'n_person_keys': len(keys),
                'person_keys': list(keys),
            }])
        state.remove()
        return
    if state.exists:
        start, n, keys = state.get
    else:
        start, n, keys = state.getCurrentProcessingTimeMs(), 0, []
    keys = set(keys)
    for pdf in batches:
        n += len(pdf)
        keys.update(k for k in pdf['norm_key'] if k is not None)
    ordered = sorted(keys)          # once: state AND output share it
    state.update((start, n, ordered))
    state.setTimeoutDuration(30 * 60 * 1000)
    yield pd.DataFrame([{
        'conv_id': conv_id,
        'session_start': start,
        'n_mentions': n,
        'n_person_keys': len(ordered),
        'person_keys': ordered,
    }])


def conversation_entity_state(mentions: DataFrame) -> DataFrame:
    """Streaming mentions -> per-conversation running entity summary
    (update output mode)."""
    return (mentions
            .groupBy('conv_id')
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                'update', GroupStateTimeout.ProcessingTimeTimeout))
