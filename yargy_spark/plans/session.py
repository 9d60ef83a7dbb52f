"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (SURVEY.md §2.10, §4.3):
 - AQE + skew-join handling on (hot blocking keys in entity linking),
 - Arrow batching for the pandas-UDF extraction kernel,
 - auto broadcast threshold left enabled (dimension tables: lexicon,
   gazetteers are tiny vs the transcript fact table),
 - shuffle partitions default sized for local[32] test runs; under
   spark-submit, master/partitions come from --master/--conf (builder
   options are only set when NOT already provided by the launcher —
   an unconditional .master() here would silently override
   ``--master yarn`` and run the whole job on the driver).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = 'yargy-spark',
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict | None = None) -> SparkSession:
    # honor launcher-provided settings: under spark-submit the driver
    # JVM gateway ALREADY exists (PYSPARK_GATEWAY_PORT is set) and
    # carries --master / --conf — explicit builder calls here would
    # override them (e.g. silently turning --master yarn into
    # local[32]); local defaults apply only to plain-python launches
    launched_by_submit = 'PYSPARK_GATEWAY_PORT' in os.environ
    if master is None and not launched_by_submit:
        cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
        master = 'local[%s]' % cpus
    if shuffle_partitions is None and not launched_by_submit:
        shuffle_partitions = int(os.environ.get(
            'SPARK_GRAFT_SHUFFLE_PARTITIONS', '32'))

    builder = SparkSession.builder.appName(app)
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config('spark.sql.shuffle.partitions',
                                 str(shuffle_partitions))
    builder = (
        builder
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
