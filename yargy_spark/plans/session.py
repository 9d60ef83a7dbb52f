"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (SURVEY.md §2.10, §4.3):
 - AQE + skew-join handling on (hot blocking keys in entity linking),
 - Arrow batching for the pandas-UDF extraction kernel,
 - auto broadcast threshold left enabled (dimension tables: lexicon,
   gazetteers are tiny vs the transcript fact table),
 - shuffle partitions default sized for local[32] test runs; a real
   cluster overrides via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = 'yargy-spark',
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict | None = None) -> SparkSession:
    if master is None:
        cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
        master = 'local[%s]' % cpus
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get(
            'SPARK_GRAFT_SHUFFLE_PARTITIONS', '32'))

    builder = (
        SparkSession.builder
        .appName(app)
        .master(master)
        .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.execution.arrow.maxRecordsPerBatch', '4096')
        .config('spark.sql.session.timeZone', 'UTC')
        .config('spark.driver.memory',
                os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g'))
        .config('spark.ui.enabled', 'false')
    )
    for key, value in (extra or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
