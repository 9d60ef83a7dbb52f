"""Structured Streaming ingestion: incremental transcript extraction.

The reference is strictly batch (one text in, matches out —
SURVEY.md §1.3); this module is the Spark-native extension for
continuously arriving transcripts: a file/rate/kafka source of turns
flows through the SAME broadcast extraction kernel via
``transform(extract_mentions)``, with an event-time watermark so
per-conversation aggregates tolerate late turns.

The extraction operator is stateless per turn, so it composes with
readStream unchanged — one code path for batch and streaming
(a core reason the kernel lives behind mapInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType, TimestampType)

TRANSCRIPT_SCHEMA = StructType([
    StructField('conv_id', StringType()),
    StructField('turn_idx', IntegerType()),
    StructField('role', StringType()),
    StructField('text', StringType()),
    StructField('tool', StringType()),
    StructField('ts', TimestampType()),
])


def stream_transcripts(spark: SparkSession, path: str,
                       max_files: int = 16) -> DataFrame:
    """File-based streaming source of transcript turns (json lines);
    a Kafka source drops in by swapping this reader."""
    return (spark.readStream
            .schema(TRANSCRIPT_SCHEMA)
            .option('maxFilesPerTrigger', max_files)
            .json(path))


def stream_mentions(turns: DataFrame) -> DataFrame:
    """Streaming mention extraction: identical kernel, per micro-batch."""
    from ..operators.extract import extract_mentions
    return extract_mentions(turns)


def windowed_mention_counts(turns: DataFrame,
                            watermark: str = '10 minutes',
                            window: str = '5 minutes') -> DataFrame:
    """Late-data-tolerant rollup: mentions per fact type per event-time
    window.  The event-time column passes through the extraction UDF
    (``passthrough``), the watermark bounds aggregate state."""
    from ..operators.extract import extract_mentions
    mentions = extract_mentions(turns, passthrough=('ts',))
    return (mentions
            .withWatermark('ts', watermark)
            .groupBy(F.window('ts', window), 'fact_type')
            .agg(F.count('*').alias('n_mentions')))


def run_stream_to_parquet(turns: DataFrame, out_dir: str,
                          checkpoint_dir: str):
    """Continuous extraction to parquet with exactly-once file sink."""
    mentions = stream_mentions(turns)
    return (mentions.writeStream
            .format('parquet')
            .option('path', out_dir)
            .option('checkpointLocation', checkpoint_dir)
            .outputMode('append')
            .trigger(availableNow=True)
            .start())
