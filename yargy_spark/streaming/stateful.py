"""Custom stateful streaming operator: per-conversation entity state.

``applyInPandasWithState`` over the streaming mention table keeps one
state record per conversation (running mention total + distinct
person blocking keys) and emits an updated summary row whenever the
conversation receives new mentions.  State is SESSION-scoped: an idle
gap longer than the timeout finalizes the session (the stored summary
is emitted once more, then evicted — bounded state), and a
conversation that resumes later starts a fresh session from zero.
Sinks that need lifetime totals should key on (conv_id, session) or
aggregate the emitted session summaries downstream.

The reference has no streaming at all (SURVEY.md §1.3); this is the
Spark-native extension for the custom-stateful-operator pattern.
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
    StructField('n_mentions', LongType()),
    StructField('n_person_keys', IntegerType()),
    StructField('person_keys', ArrayType(StringType())),
])

STATE_SCHEMA = StructType([
    StructField('n_mentions', LongType()),
    StructField('person_keys', ArrayType(StringType())),
])


def _update(key: Tuple[str], batches: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # session end: surface the final summary once, then evict —
        # silent removal would let a later resumed session's smaller
        # totals overwrite the finished session's row in update sinks
        # with no trace of the completed session
        if state.exists:
            n, keys = state.get
            yield pd.DataFrame([{
                'conv_id': conv_id,
                'n_mentions': n,
                'n_person_keys': len(keys),
                'person_keys': list(keys),
            }])
        state.remove()
        return
    n, keys = (state.get if state.exists else (0, []))
    keys = set(keys)
    for pdf in batches:
        n += len(pdf)
        keys.update(k for k in pdf['norm_key'] if k is not None)
    state.update((n, sorted(keys)))
    state.setTimeoutDuration(30 * 60 * 1000)
    yield pd.DataFrame([{
        'conv_id': conv_id,
        'n_mentions': n,
        'n_person_keys': len(keys),
        'person_keys': sorted(keys),
    }])


def conversation_entity_state(mentions: DataFrame) -> DataFrame:
    """Streaming mentions -> per-conversation running entity summary
    (update output mode)."""
    return (mentions
            .groupBy('conv_id')
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                'update', GroupStateTimeout.ProcessingTimeTimeout))
