"""Iceberg-style table layer: partitioned parquet + JSON manifests,
partition-granular resume, per-partition lineage and counters.

No Iceberg runtime jar is available offline (SURVEY.md §7.1 R3), so
this module provides the snapshot/manifest behavior the north_rule
requires behind a narrow API; a real Iceberg catalog slots in by
swapping these functions for catalog calls.

Layout for a table at <root>:
    <root>/data/bucket=<k>/...parquet      (bucketed by conv hash)
    <root>/_manifests/snap-<id>.json       (one per commit)
    <root>/_manifests/current              (text: latest snapshot id)

Manifest JSON:
    {snapshot_id, parent_id, created_utc, partitions:
        {bucket: {rows: n}}, totals: {rows: n}, note}

Resume contract: ``pending_buckets`` diffs the desired bucket set
against all committed manifests, so a restarted job processes only
unfinished buckets (anti-join restart, SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = 'bucket'


def with_bucket(df: DataFrame, n_buckets: int,
                key: str = 'conv_id') -> DataFrame:
    """Deterministic bucketing column — the table's partition spec
    (bucket(N, conv_id) per SURVEY.md §2.10)."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
        .cast('int'))


def _manifest_dir(root: str) -> str:
    return os.path.join(root, '_manifests')


def committed_partitions(root: str) -> Dict[int, dict]:
    """Union of partition stats over all committed snapshots."""
    mdir = _manifest_dir(root)
    done: Dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return done
    for name in sorted(os.listdir(mdir)):
        if not name.startswith('snap-'):
            continue
        with open(os.path.join(mdir, name), 'r', encoding='utf-8') as fh:
            snap = json.load(fh)
        for bucket, stats in snap.get('partitions', {}).items():
            done[int(bucket)] = stats
    return done


def pending_buckets(root: str, n_buckets: int) -> List[int]:
    done = committed_partitions(root)
    return [b for b in range(n_buckets) if b not in done]


def current_snapshot(root: str) -> Optional[str]:
    path = os.path.join(_manifest_dir(root), 'current')
    if not os.path.exists(path):
        return None
    with open(path, 'r', encoding='utf-8') as fh:
        return fh.read().strip()


def commit_append(df: DataFrame, root: str,
                  note: str = '', counters: Optional[dict] = None) -> dict:
    """Append df (must carry the bucket column) as a new snapshot:
    write data partitioned by bucket, then write the manifest with
    per-partition row counts (lineage) and job counters."""
    stats_rows = df.groupBy(BUCKET_COL).count().collect()
    partitions = {int(r[BUCKET_COL]): {'rows': int(r['count'])}
                  for r in stats_rows}

    (df.write.mode('append')
       .partitionBy(BUCKET_COL)
       .parquet(os.path.join(root, 'data')))

    parent = current_snapshot(root)
    snapshot_id = 'snap-%d' % (int(time.time() * 1000))
    manifest = {
        'snapshot_id': snapshot_id,
        'parent_id': parent,
        'created_utc': time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime()),
        'partitions': partitions,
        'totals': {'rows': sum(p['rows'] for p in partitions.values()),
                   'partitions': len(partitions)},
        'counters': counters or {},
        'note': note,
    }
    mdir = _manifest_dir(root)
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, snapshot_id + '.json'), 'w',
              encoding='utf-8') as fh:
        json.dump(manifest, fh, ensure_ascii=False, indent=1)
    with open(os.path.join(mdir, 'current'), 'w', encoding='utf-8') as fh:
        fh.write(snapshot_id)
    return manifest


def read_table(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, 'data'))


# -------------------------------------------------- table maintenance

def snapshots(root: str) -> List[dict]:
    """Committed manifests in commit order (oldest first)."""
    mdir = _manifest_dir(root)
    out = []
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.startswith('snap-'):
            with open(os.path.join(mdir, name), 'r',
                      encoding='utf-8') as fh:
                out.append(json.load(fh))
    return out


def expire_snapshots(root: str, keep_last: int = 1) -> int:
    """Collapse manifests older than the newest ``keep_last`` into one
    base manifest (partition lineage merged, later stats win), so the
    manifest dir stays O(keep_last) on long-running tables while the
    resume contract (``pending_buckets``) is preserved.  Returns the
    number of manifests removed."""
    mdir = _manifest_dir(root)
    names = sorted(n for n in os.listdir(mdir)
                   if n.startswith('snap-')) if os.path.isdir(mdir) \
        else []
    if len(names) <= keep_last + 1:
        return 0
    old, _kept = names[:-keep_last], names[-keep_last:]
    merged_parts: Dict[str, dict] = {}
    total_rows = 0
    for name in old:
        with open(os.path.join(mdir, name), 'r',
                  encoding='utf-8') as fh:
            snap = json.load(fh)
        for bucket, stats in snap.get('partitions', {}).items():
            merged_parts[bucket] = stats
        total_rows += snap.get('totals', {}).get('rows', 0)
    base = {
        'snapshot_id': old[0][:-5],   # keeps sort position
        'parent_id': None,
        'created_utc': time.strftime('%Y-%m-%dT%H:%M:%SZ',
                                     time.gmtime()),
        'partitions': merged_parts,
        'totals': {'rows': total_rows,
                   'partitions': len(merged_parts)},
        'counters': {'expired_snapshots': len(old)},
        'note': 'base (expired %d snapshots)' % len(old),
    }
    with open(os.path.join(mdir, old[0]), 'w', encoding='utf-8') as fh:
        json.dump(base, fh, ensure_ascii=False, indent=1)
    for name in old[1:]:
        os.remove(os.path.join(mdir, name))
    return len(old) - 1


def compact_bucket(spark: SparkSession, root: str, bucket: int,
                   target_files: int = 1) -> int:
    """Rewrite one bucket partition into ``target_files`` files
    (small-file compaction) via dynamic partition overwrite; row
    content is unchanged.  Returns the bucket's row count."""
    path = os.path.join(root, 'data')
    df = (spark.read.parquet(path)
          .where(F.col(BUCKET_COL) == bucket))
    n = df.count()
    (df.coalesce(target_files)
       .write.mode('overwrite')
       .option('partitionOverwriteMode', 'dynamic')
       .partitionBy(BUCKET_COL)
       .parquet(path))
    return n
