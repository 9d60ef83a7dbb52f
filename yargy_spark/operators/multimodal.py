"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / resize / frame-sample are Pandas-UDF stages over
``mapInPandas``.  The media libraries are not available in this
container, so the codec boundary is explicit:

  * ``decode_image`` raises NotImplementedError (clearly-marked stub —
    swap in PIL/ffmpeg at deploy time),
  * ``fake_decode`` is a deterministic stand-in (byte histogram) used
    by tests and the feature extractor, so the Spark-side plumbing —
    schema, Arrow batching, partitioning, UDF signature — is real and
    tested end-to-end.

``synth_media`` derives a deterministic binary payload per document
(md5 bytes repeated), so the same table exists in any engine for
oracle checks on the metadata path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                               LongType, StringType, StructField,
                               StructType)

MEDIA_SCHEMA = StructType([
    StructField('doc_id', LongType()),
    StructField('media_type', StringType()),
    StructField('width', IntegerType()),
    StructField('height', IntegerType()),
    StructField('n_bytes', IntegerType()),
    StructField('payload', StringType()),  # hex; binary stays opaque
])

FEATURE_SCHEMA = StructType([
    StructField('doc_id', LongType()),
    StructField('n_bytes', IntegerType()),
    StructField('byte_mean_x100', LongType()),
    StructField('histogram', ArrayType(FloatType())),
])


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: payload = md5(text) hex repeated
    4x (64 'bytes'), metadata derived from doc fields."""
    payload = F.repeat(F.md5(F.col('text')), 4)
    return docs.select(
        'doc_id',
        F.when(F.col('doc_id') % 3 == 0, 'image')
         .when(F.col('doc_id') % 3 == 1, 'audio')
         .otherwise('video').alias('media_type'),
        (F.col('doc_id') % 64 + 16).cast('int').alias('width'),
        (F.col('doc_id') % 48 + 16).cast('int').alias('height'),
        (F.length(payload) / 2).cast('int').alias('n_bytes'),
        payload.alias('payload'))


def decode_image(payload: bytes):
    """Real codec boundary — NOT IMPLEMENTED in this container.
    Deploy-time implementations plug in PIL/torchvision here."""
    raise NotImplementedError(
        'image decoding requires a codec library not present in this '
        'environment; use fake_decode for plumbing tests')


def fake_decode(payload_hex: str) -> np.ndarray:
    """Deterministic decode stand-in: hex payload -> byte array."""
    return np.frombuffer(bytes.fromhex(payload_hex), dtype=np.uint8)


def extract_features(media: DataFrame) -> DataFrame:
    """Pandas-UDF feature extraction over Arrow batches: byte mean +
    16-bin normalized histogram per payload.  The batch shape, schema
    and partitioning are exactly what a real image featurizer uses —
    only ``fake_decode`` is the stand-in."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf['doc_id'].values,
                                       pdf['payload'].values):
                if payload is None:   # null text upstream -> null
                    continue          # payload; skip like the text UDFs
                arr = fake_decode(payload)
                hist = np.histogram(arr, bins=16, range=(0, 256))[0]
                hist = (hist / max(len(arr), 1)).astype('float32')
                rows.append({
                    'doc_id': int(doc_id),
                    'n_bytes': int(len(arr)),
                    # empty payload: mean of [] is NaN and int(NaN)
                    # raises — report 0, don't kill the task
                    'byte_mean_x100': (int(arr.mean() * 100)
                                       if len(arr) else 0),
                    'histogram': hist.tolist(),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select('doc_id', 'payload').mapInPandas(
        fn, FEATURE_SCHEMA)


def media_metadata(docs: DataFrame) -> DataFrame:
    """Metadata-only projection (fully engine-portable: used for the
    SQL-oracle check of the multimodal plumbing)."""
    m = synth_media(docs)
    return m.select('doc_id', 'media_type', 'width', 'height', 'n_bytes')
