"""Column-level helper surface (yargy_spark.functions)."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_span_and_key_helpers(spark):
    from yargy_spark import functions as fn
    df = spark.createDataFrame(
        [(0, 5, 3, 8, 'Иван', 'Ульянов'),
         (10, 14, 20, 25, 'САША', 'Быков')],
        'a_start int, a_stop int, b_start int, b_stop int, '
        'first string, last string')
    out = df.select(
        fn.span_struct('a_start', 'a_stop').alias('a'),
        fn.span_struct('b_start', 'b_stop').alias('b'),
        fn.lemma_key('first', 'last').alias('key'),
    ).select(
        fn.span_length(F.col('a')).alias('len_a'),
        fn.spans_overlap(F.col('a'), F.col('b')).alias('ovl'),
        'key',
        fn.salted(F.col('key'), 16, F.col('key')).alias('salted'),
    ).collect()
    assert [r['len_a'] for r in out] == [5, 4]
    assert [r['ovl'] for r in out] == [True, False]
    assert out[0]['key'] == 'иван|ульянов'
    assert out[1]['key'] == 'саша|быков'
    base, _, salt = out[0]['salted'].rpartition('#')
    assert base == 'иван|ульянов' and 0 <= int(salt) < 16


def test_md5_int_matches_duckdb(spark):
    """The portable hash must replay identically in DuckDB (the oracle
    contract every dedup op rests on)."""
    import duckdb
    from yargy_spark import functions as fn
    words = ['hello', 'привет', 'x y z']
    df = spark.createDataFrame([(w,) for w in words], 'w string')
    got = {r['w']: r['h'] for r in
           df.select('w', fn.md5_int(F.col('w')).alias('h')).collect()}
    con = duckdb.connect()
    for w in words:
        (h,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::int64", [w]
        ).fetchone()
        assert got[w] == h
