"""As-of join (union-and-carry composition) semantics."""

import datetime as dt

import pytest

pytestmark = pytest.mark.spark


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m)


def test_asof_backward_with_ties(spark):
    from yargy_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 'u1', _ts(5)),   # after err@3 -> 103
         (2, 'u1', _ts(3)),   # same instant as err@3 -> included
         (3, 'u1', _ts(1)),   # before any error -> null
         (4, 'u2', _ts(9)),   # u2 has no errors -> null
         (5, 'u3', _ts(8))],  # err@2 then err@7 -> latest wins (107)
        'event_id long, user_id string, ts timestamp')
    right = spark.createDataFrame(
        [('u1', _ts(3), 103),
         ('u3', _ts(2), 102),
         ('u3', _ts(7), 107)],
        'user_id string, ts timestamp, event_id long')

    out = asof_join(left, right, on='user_id',
                    right_cols=('event_id',))
    got = {r['event_id']: r['r_event_id'] for r in out.collect()}
    assert got == {1: 103, 2: 103, 3: None, 4: None, 5: 107}
    # left columns survive untouched
    assert set(out.columns) == {'event_id', 'user_id', 'ts',
                                'r_event_id'}


def test_asof_single_shuffle_plan(spark):
    """The composition shuffles once on the join key (window exchange);
    no cartesian/range explosion appears in the plan."""
    from yargy_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 'u1', _ts(5))],
        'event_id long, user_id string, ts timestamp')
    right = spark.createDataFrame(
        [('u1', _ts(3), 103)],
        'user_id string, ts timestamp, event_id long')
    plan = asof_join(left, right, on='user_id',
                     right_cols=('event_id',)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert 'CartesianProduct' not in plan
    assert 'BroadcastNestedLoopJoin' not in plan


def test_asof_right_row_is_atomic(spark):
    """A null field in the LATEST right row must not backfill from an
    older right row — the attached right row is all-or-nothing."""
    from yargy_spark.operators.events import asof_join
    left = spark.createDataFrame(
        [(1, 'u1', _ts(3))],
        'event_id long, user_id string, ts timestamp')
    right = spark.createDataFrame(
        [('u1', _ts(1), 'A', 500),
         ('u1', _ts(2), None, 200)],
        'user_id string, ts timestamp, err string, code long')
    out = asof_join(left, right, on='user_id',
                    right_cols=('err', 'code')).collect()[0]
    assert out['r_code'] == 200 and out['r_err'] is None


def test_asof_ts_bucketed_parity_on_skew(spark):
    """The hot-key mitigation (ts_bucket_width) must return exactly
    the unbucketed rows on a single-key skew fixture — every left ts
    falls in SOME bucket relative to its match: same bucket, a later
    bucket (seeded carry), or a left-only bucket."""
    import random

    from yargy_spark.operators.events import asof_join

    rng = random.Random(7)
    # one pathologically hot key: 400 left events, 40 right events,
    # clumped so many buckets are left-only or right-only
    left = spark.createDataFrame(
        [(i, 'hot', _ts(rng.randrange(0, 59)))
         for i in range(400)]
        + [(1000, 'cold', _ts(30)), (1001, 'hot', None)],
        'event_id long, user_id string, ts timestamp')
    right = spark.createDataFrame(
        [('hot', _ts(m), 100 + m)
         for m in sorted(rng.sample(range(0, 59), 40))]
        + [('cold', _ts(31), 999)],
        'user_id string, ts timestamp, event_id long')

    plain = asof_join(left, right, on='user_id',
                      right_cols=('event_id',))
    for width in (60.0, 300.0, 1e9):  # 1-min, 5-min, one-bucket
        bucketed = asof_join(left, right, on='user_id',
                             right_cols=('event_id',),
                             ts_bucket_width=width)
        assert sorted(map(tuple, bucketed.collect())) \
            == sorted(map(tuple, plain.collect())), width
    # the carry window really is bucketed: its exchange keys on both
    # the join key and the bucket id
    plan = asof_join(left, right, on='user_id',
                     right_cols=('event_id',), ts_bucket_width=60.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert '_bkt' in plan


def test_asof_null_semantics(spark):
    """Null-key/null-ts right rows never match; null-key/null-ts left
    rows pass through unmatched (SQL join / merge_asof semantics)."""
    from yargy_spark.operators.events import asof_join
    left = spark.createDataFrame(
        [(1, 'u1', _ts(5)), (2, None, _ts(5)), (3, 'u1', None)],
        'event_id long, user_id string, ts timestamp')
    right = spark.createDataFrame(
        [('u1', _ts(1), 101), (None, _ts(1), 102), ('u1', None, 103)],
        'user_id string, ts timestamp, event_id long')
    got = {r['event_id']: r['r_event_id']
           for r in asof_join(left, right, on='user_id',
                              right_cols=('event_id',)).collect()}
    assert got == {1: 101, 2: None, 3: None}
    # identical through the bucketed path: null-KEY left rows ride a
    # null-safe seeds join (a plain equi-join would drop them)
    got_b = {r['event_id']: r['r_event_id']
             for r in asof_join(left, right, on='user_id',
                                right_cols=('event_id',),
                                ts_bucket_width=60.0).collect()}
    assert got_b == {1: 101, 2: None, 3: None}
