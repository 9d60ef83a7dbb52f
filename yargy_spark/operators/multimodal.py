"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / resize / frame-sample are Pandas-UDF stages over
``mapInPandas``.  The codec boundary is explicit and PARTLY real:

  * ``decode_image`` is a pure-Python decoder for the public
    uncompressed raster formats — binary PPM (P6) / PGM (P5) and
    24-bit BI_RGB BMP — returning an ``(h, w, c)`` uint8 array.
    Compressed formats (JPEG/PNG/video) still raise
    NotImplementedError: those need codec libraries (PIL/ffmpeg)
    that plug in at deploy time behind the same signature.
  * ``fake_decode`` is the byte-histogram stand-in kept for the
    compressed-payload plumbing tests.

``synth_media`` derives a deterministic binary payload per document
(md5 bytes repeated) for the metadata path; ``synth_ppm_media``
derives a deterministic REAL P6 image per document so the full
encode -> binary column -> ``decode_image`` -> stats path is
oracle-checkable in any engine from doc_id arithmetic alone.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType,
                               IntegerType, LongType, StringType,
                               StructField, StructType)

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


def _ppm_header_tokens(payload: bytes, n: int):
    """Yield the first ``n`` whitespace-separated header tokens after
    the magic, skipping ``#`` comments (netpbm spec allows comments
    anywhere in the header), and the offset where the raster starts
    (exactly one whitespace byte after the last header token)."""
    pos, out = 2, []
    while len(out) < n:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b'#':
            while pos < len(payload) and payload[pos] != 0x0a:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError('truncated netpbm header')
        out.append(int(payload[start:pos]))
    # the spec mandates exactly ONE whitespace byte between the last
    # header token and the raster; validate it instead of assuming —
    # a truncated header would otherwise shift every raster byte
    if not payload[pos:pos + 1].isspace():
        raise ValueError(
            'netpbm header must end with a single whitespace byte, '
            'got %r at offset %d' % (payload[pos:pos + 1], pos))
    return out, pos + 1  # single whitespace separates header/raster


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an uncompressed public raster format to an ``(h, w, c)``
    uint8 array.  Pure Python/numpy — no codec library:

      * ``P6`` binary PPM (c=3) and ``P5`` binary PGM (c=1),
        maxval <= 255, ``#`` header comments handled;
      * ``BM`` 24-bit uncompressed (BI_RGB) BMP: bottom-up or
        top-down (negative height), 4-byte row padding, BGR -> RGB.

    Compressed formats remain the deploy-time codec boundary
    (reference parity note: the reference's external-tool boundary is
    dot.py:18-26 shelling to graphviz; same pattern — pure fallback
    in-tree, rich codec pluggable)."""
    magic = payload[:2]
    if magic in (b'P6', b'P5'):
        channels = 3 if magic == b'P6' else 1
        (width, height, maxval), off = _ppm_header_tokens(payload, 3)
        if maxval > 255:
            raise NotImplementedError('16-bit netpbm not supported')
        n = width * height * channels
        # exact-size check: a writer that ended the header with CRLF
        # (nonstandard — '\r' counts as the separator and '\n' lands
        # in the raster) or truncated the raster leaves a size
        # mismatch; refuse loudly rather than decode shifted bytes
        if len(payload) - off != n:
            raise ValueError(
                'netpbm raster is %d bytes, expected exactly %d '
                '(CRLF-terminated header or truncated payload?)'
                % (len(payload) - off, n))
        raster = np.frombuffer(payload, np.uint8, count=n, offset=off)
        return raster.reshape(height, width, channels)
    if magic == b'BM':
        pix_off = int.from_bytes(payload[10:14], 'little')
        width = int.from_bytes(payload[18:22], 'little', signed=True)
        height = int.from_bytes(payload[22:26], 'little', signed=True)
        bpp = int.from_bytes(payload[28:30], 'little')
        compression = int.from_bytes(payload[30:34], 'little')
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                'only 24-bit uncompressed (BI_RGB) BMP is supported')
        top_down, height = height < 0, abs(height)
        stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundary
        rows = np.frombuffer(payload, np.uint8, count=stride * height,
                             offset=pix_off).reshape(height, stride)
        img = rows[:, :width * 3].reshape(height, width, 3)[..., ::-1]
        return img if top_down else img[::-1]
    raise NotImplementedError(
        'compressed image formats (JPEG/PNG/...) require a codec '
        'library not present in this environment; P6/P5/24-bit BMP '
        'decode natively, use fake_decode for other plumbing tests')


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) or (h, w) uint8 array as binary PPM/PGM —
    the synth side of the decode round-trip."""
    gray = arr.ndim == 2 or arr.shape[2] == 1
    magic = b'P5' if gray else b'P6'
    h, w = arr.shape[:2]
    return (magic + b'\n%d %d\n255\n' % (w, h)
            + np.ascontiguousarray(arr, dtype=np.uint8).tobytes())


PPM_MEDIA_SCHEMA = StructType([
    StructField('doc_id', LongType()),
    StructField('payload', BinaryType()),
])

DECODE_SCHEMA = StructType([
    StructField('doc_id', LongType()),
    StructField('width', IntegerType()),
    StructField('height', IntegerType()),
    StructField('channels', IntegerType()),
    StructField('n_bytes', IntegerType()),
    StructField('byte_sum', LongType()),
    StructField('byte_mean_x100', LongType()),
])


def synth_ppm_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL P6 payload per document: width/height and
    every raster byte are pure doc_id arithmetic (byte j =
    ((doc_id%256)*7 + j*13) % 256, w = doc_id%8+4, h = doc_id%6+4),
    so an independent engine can recompute the decoded stats without
    running the codec.  In deployment this stage is just the parquet
    scan of a real ``binary`` column — map-only either way."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf['doc_id'].values:
                doc_id = int(doc_id)
                w, h = doc_id % 8 + 4, doc_id % 6 + 4
                j = np.arange(w * h * 3, dtype=np.int64)
                raster = (((doc_id % 256) * 7 + j * 13) % 256)
                rows.append({'doc_id': doc_id, 'payload': encode_ppm(
                    raster.astype(np.uint8).reshape(h, w, 3))})
            yield pd.DataFrame(
                rows, columns=['doc_id', 'payload'])

    return docs.select('doc_id').mapInPandas(fn, PPM_MEDIA_SCHEMA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Run the REAL ``decode_image`` codec over a binary payload
    column and emit per-image stats.  Width/height/channels come from
    the decoded array (header parsing is exercised, not trusted
    metadata).  Map-only: Scan -> mapInPandas, zero Exchanges; the
    per-batch work is O(bytes), Arrow moves the binary column once.

    NULL payloads (failed fetches) are SKIPPED, same contract as
    ``extract_features`` and the text UDFs — count them with an
    anti-join of the input against the output (`media.join(stats,
    'doc_id', 'left_anti')`); an un-decodable non-NULL payload still
    raises (loud), only absence is silent."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf['doc_id'].values,
                                       pdf['payload'].values):
                if payload is None:
                    continue
                arr = decode_image(bytes(payload))
                h, w = arr.shape[:2]
                c = 1 if arr.ndim == 2 else arr.shape[2]
                total = int(arr.sum(dtype=np.int64))
                rows.append({
                    'doc_id': int(doc_id), 'width': w, 'height': h,
                    'channels': c, 'n_bytes': int(arr.size),
                    'byte_sum': total,
                    'byte_mean_x100': total * 100 // max(arr.size, 1),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.select('doc_id', 'payload').mapInPandas(
        fn, DECODE_SCHEMA)


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
