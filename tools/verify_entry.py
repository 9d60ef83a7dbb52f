"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB over
the same sf dir, compare row count / schema / order-insensitive values.

Usage: python tools/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def norm_value(v):
    if isinstance(v, Decimal):
        return format(v.normalize(), 'f')
    if isinstance(v, float):
        return '%.9g' % v
    if isinstance(v, bool):
        return int(v)
    return v


def norm_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm_value(row[i]) for i in order) for row in rows]
    return sorted(columns), sorted(map(repr, out))


def main():
    import duckdb
    from yargy_spark.plans.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    unknown = sorted(only - set(qs))
    if unknown:
        # a typo'd name silently verifying nothing would report success
        print('unknown queries: %s' % unknown)
        sys.exit(2)

    spark = build_session(app='verify-entry', master='local[8]',
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, t + '.parquet')
        if os.path.exists(path):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM '%s'" % (t, path))

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print('%-22s SPARK ERROR: %s' % (name, str(exc)[:200]))
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print('%-22s rows-only: %d rows' % (name, len(s_rows)))
            continue
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as exc:
            print('%-22s ORACLE ERROR: %s' % (name, str(exc)[:200]))
            failures.append(name)
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        oc, orr = norm_rows(o_cols, o_rows)
        ok_schema = sc == oc
        ok_count = len(sr) == len(orr)
        ok_vals = sr == orr
        status = 'OK' if (ok_schema and ok_count and ok_vals) else 'FAIL'
        print('%-22s %s  rows=%d/%d schema=%s values=%s'
              % (name, status, len(sr), len(orr), ok_schema, ok_vals))
        if status == 'FAIL':
            failures.append(name)
            if not ok_schema:
                print('   spark cols:', sc, '\n   oracle cols:', oc)
            if ok_schema:
                miss = [r for r in orr if r not in set(sr)][:3]
                extra = [r for r in sr if r not in set(orr)][:3]
                print('   missing:', miss)
                print('   extra:  ', extra)

    spark.stop()
    print('\n%d failures' % len(failures), failures)
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
