"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / resize / frame-sample are Pandas-UDF stages over
``mapInPandas``.  The codec boundary is explicit and PARTLY real:

  * ``decode_image`` is a pure-Python decoder for the public raster
    formats — binary PPM (P6) / PGM (P5), 24-bit BI_RGB BMP, and
    8-bit PNG (stdlib-zlib DEFLATE + scanline unfilter) — returning
    an ``(h, w, c)`` uint8 array.  JPEG/video still raise
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

      * 8-bit PNG (gray / gray+alpha / RGB / RGBA / palette with
        optional tRNS alpha, non-interlaced) — DEFLATE via stdlib
        zlib + per-scanline unfilter (``decode_png``);
      * baseline JPEG (SOF0, grayscale / 4:4:4) — real Huffman
        entropy decode + numpy IDCT (``jpeg.decode_jpeg``; tables
        read from the file's own DQT/DHT segments).

    Progressive/subsampled JPEG and video remain the deploy-time
    codec boundary (reference parity note: the reference's
    external-tool boundary is dot.py:18-26 shelling to graphviz;
    same pattern — pure fallback in-tree, rich codec pluggable)."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b'\xff\xd8':
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
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
        'unsupported image format: P6/P5, 24-bit BMP, 8-bit PNG and '
        'baseline JPEG decode natively; progressive/subsampled JPEG '
        'and video require a codec library not present in this '
        'environment (use fake_decode for other plumbing tests)')


_PNG_SIG = b'\x89PNG\r\n\x1a\n'
# 8-bit color types <-> channel counts (palette type 3 handled
# separately in decode_png: one index byte/pixel + PLTE lookup)
_PNG_CTYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_CHANNELS_CTYPE = {v: k for k, v in _PNG_CTYPE_CHANNELS.items()}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, height: int, width: int,
                  channels: int) -> np.ndarray:
    """Reverse the per-scanline filters (types 0-4) of a decompressed
    PNG image stream: each scanline is 1 filter-type byte + w*c
    sample bytes (8-bit depth).  Filters 0/2 are row-vectorized;
    1/3/4 have a left-neighbor dependency and run per byte — fine for
    thumbnail-scale payloads; a SIMD codec plugs in at deploy time
    behind the same ``decode_image`` signature."""
    stride = width * channels
    need = height * (stride + 1)
    if len(raw) != need:
        raise ValueError(
            'PNG image stream is %d bytes, expected exactly %d '
            '(truncated IDAT or dimension mismatch)' % (len(raw), need))
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int64)
        pos += stride
        if ftype == 0:                        # None
            cur = row
        elif ftype == 2:                      # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):              # Sub / Average / Paeth
            cur = row.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(prev[x])) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pred = _paeth(a, int(prev[x]), c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError('unknown PNG filter type %d (row %d)'
                             % (ftype, y))
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-Python PNG decode via stdlib zlib (DEFLATE) + per-scanline
    unfiltering: 8-bit grayscale / gray+alpha / RGB / RGBA /
    palette (color type 3, PLTE lookup + optional tRNS alpha),
    non-interlaced.  Chunk walk validates lengths and stops at IEND;
    IDAT chunks concatenate into ONE zlib stream (spec §10 — chunk
    boundaries carry no meaning).  Explicit boundaries raise
    NotImplementedError: sub-byte/16-bit depths, Adam7 interlace."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError('not a PNG payload')
    pos, width, height, channels = 8, None, None, None
    color, plte, trns = None, None, None
    idat = []
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos:pos + 4], 'big')
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError('truncated PNG chunk %r' % ctype)
        pos += 12 + length  # length + type + data + crc
        if ctype == b'IHDR':
            width = int.from_bytes(data[0:4], 'big')
            height = int.from_bytes(data[4:8], 'big')
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8:
                raise NotImplementedError(
                    'PNG bit depth %d not supported (8 only)' % depth)
            if color != 3 and color not in _PNG_CTYPE_CHANNELS:
                raise NotImplementedError(
                    'PNG color type %d not supported' % color)
            if interlace != 0:
                raise NotImplementedError(
                    'Adam7 interlaced PNG not supported')
            # palette scanlines carry one index byte per pixel
            channels = 1 if color == 3 else _PNG_CTYPE_CHANNELS[color]
        elif ctype == b'PLTE':
            if not data or len(data) % 3:
                raise ValueError(
                    'PLTE length %d is not a positive multiple of 3'
                    % len(data))
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b'tRNS' and color == 3:
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b'IDAT':
            idat.append(data)
        elif ctype == b'IEND':
            break
    if width is None or not idat:
        raise ValueError('PNG missing IHDR or IDAT')
    raw = zlib.decompress(b''.join(idat))
    arr = _png_unfilter(raw, height, width, channels)
    if color != 3:
        return arr
    # palette: indices -> RGB rows; tRNS appends per-entry alpha
    # (may be shorter than the palette — the rest default opaque)
    if plte is None:
        raise ValueError('palette PNG missing PLTE chunk')
    lut = plte
    if trns is not None:
        if len(trns) > len(plte):
            raise ValueError(
                'tRNS has %d entries for a %d-entry palette'
                % (len(trns), len(plte)))
        alpha = np.full(len(plte), 255, np.uint8)
        alpha[:len(trns)] = trns
        lut = np.concatenate([plte, alpha[:, None]], axis=1)
    idx = arr[:, :, 0]
    top = int(idx.max())
    if top >= len(lut):
        raise ValueError('palette index %d out of range '
                         '(%d PLTE entries)' % (top, len(lut)))
    return lut[idx]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib
    return (len(data).to_bytes(4, 'big') + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, 'big'))


def _png_filter_stream(flat: np.ndarray, bpp: int,
                       row_filter=None) -> bytes:
    """Apply per-scanline PNG filters to an (h, stride) int64 sample
    matrix, producing the pre-DEFLATE image stream.  ``row_filter``
    maps row index -> filter type 0-4 (default: all 0) so round-trip
    tests can exercise every unfilter branch deterministically."""
    h, stride = flat.shape
    lines = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ftype = int(row_filter(y)) if row_filter else 0
        cur = flat[y]
        if ftype == 0:
            enc = cur
        elif ftype == 2:
            enc = (cur - prev) & 0xFF
        elif ftype in (1, 3, 4):
            enc = cur.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(prev[x])) >> 1
                else:
                    cc = int(prev[x - bpp]) if x >= bpp else 0
                    pred = _paeth(a, int(prev[x]), cc)
                enc[x] = (int(cur[x]) - pred) & 0xFF
        else:
            raise ValueError('unknown PNG filter type %d' % ftype)
        lines.append(ftype)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    return bytes(lines)


def encode_png(arr: np.ndarray, row_filter=None) -> bytes:
    """Encode an (h, w[, c]) uint8 array as 8-bit PNG (gray /
    gray+alpha / RGB / RGBA by channel count)."""
    import zlib
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = _PNG_CHANNELS_CTYPE[c]
    lines = _png_filter_stream(
        arr.reshape(h, w * c).astype(np.int64), c, row_filter)
    ihdr = (w.to_bytes(4, 'big') + h.to_bytes(4, 'big')
            + bytes([8, color, 0, 0, 0]))
    return (_PNG_SIG + _png_chunk(b'IHDR', ihdr)
            + _png_chunk(b'IDAT', zlib.compress(lines))
            + _png_chunk(b'IEND', b''))


def encode_png_palette(indices: np.ndarray, palette: np.ndarray,
                       trns=None, row_filter=None) -> bytes:
    """Encode an (h, w) uint8 index matrix + (n, 3) uint8 palette as
    an 8-bit color-type-3 PNG; optional ``trns`` gives per-entry
    alpha (spec §11.3.2 — may be shorter than the palette, the rest
    default opaque).  Round-trip twin of ``decode_png``'s palette
    path."""
    import zlib
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    h, w = idx.shape
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    lines = _png_filter_stream(idx.astype(np.int64), 1, row_filter)
    ihdr = (w.to_bytes(4, 'big') + h.to_bytes(4, 'big')
            + bytes([8, 3, 0, 0, 0]))
    out = (_PNG_SIG + _png_chunk(b'IHDR', ihdr)
           + _png_chunk(b'PLTE', pal.tobytes()))
    if trns is not None:
        out += _png_chunk(
            b'tRNS', np.ascontiguousarray(trns, np.uint8).tobytes())
    return (out + _png_chunk(b'IDAT', zlib.compress(lines))
            + _png_chunk(b'IEND', b''))


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) or (h, w) uint8 array as binary PPM/PGM —
    the synth side of the decode round-trip."""
    gray = arr.ndim == 2 or arr.shape[2] == 1
    magic = b'P5' if gray else b'P6'
    h, w = arr.shape[:2]
    return (magic + b'\n%d %d\n255\n' % (w, h)
            + np.ascontiguousarray(arr, dtype=np.uint8).tobytes())


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode an (n_frames,) or (n_frames, channels) int16 array as
    a canonical RIFF/WAVE PCM payload (fmt tag 1, 16-bit LE,
    interleaved frames)."""
    s = np.asarray(samples, dtype='<i2')
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = np.ascontiguousarray(s).tobytes()
    fmt = (int(1).to_bytes(2, 'little')          # PCM
           + channels.to_bytes(2, 'little')
           + int(rate).to_bytes(4, 'little')
           + int(rate * channels * 2).to_bytes(4, 'little')
           + int(channels * 2).to_bytes(2, 'little')
           + int(16).to_bytes(2, 'little'))
    body = (b'WAVE'
            + b'fmt ' + len(fmt).to_bytes(4, 'little') + fmt
            + b'data' + len(data).to_bytes(4, 'little') + data
            + (b'\x00' if len(data) % 2 else b''))  # word padding
    return b'RIFF' + len(body).to_bytes(4, 'little') + body


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE PCM payload -> ((n_frames, channels) int16
    array, sample_rate).  Pure Python/numpy: chunk walk with word
    alignment, unknown chunks (LIST, fact, ...) skipped; 16-bit
    signed LE native, 8-bit unsigned promoted to centered int16
    ((v - 128) << 8, the canonical widening).  Compressed WAVE
    (fmt tag != 1) raises NotImplementedError — the same loud
    boundary discipline as decode_image."""
    if payload[:4] != b'RIFF' or payload[8:12] != b'WAVE':
        raise ValueError('not a RIFF/WAVE payload')
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], 'little')
        chunk = payload[pos + 8:pos + 8 + size]
        if len(chunk) != size:
            raise ValueError('WAVE chunk %r truncated' % cid)
        pos += 8 + size + (size % 2)             # word alignment
        if cid == b'fmt ':
            tag = int.from_bytes(chunk[0:2], 'little')
            if tag != 1:
                raise NotImplementedError(
                    'compressed WAVE (fmt tag %d) not supported — '
                    'PCM only' % tag)
            fmt = {'channels': int.from_bytes(chunk[2:4], 'little'),
                   'rate': int.from_bytes(chunk[4:8], 'little'),
                   'bits': int.from_bytes(chunk[14:16], 'little')}
        elif cid == b'data':
            data = chunk
    if fmt is None or data is None:
        raise ValueError('WAVE missing fmt or data chunk')
    c, bits = fmt['channels'], fmt['bits']
    if bits == 16:
        arr = np.frombuffer(data, '<i2')
    elif bits == 8:
        arr = (np.frombuffer(data, np.uint8).astype(np.int16)
               - 128) << 8
    else:
        raise NotImplementedError(
            '%d-bit WAVE not supported (8/16 only)' % bits)
    if c < 1 or len(arr) % c:
        raise ValueError('WAVE data is not a whole number of '
                         '%d-channel frames' % c)
    return arr.reshape(-1, c), fmt['rate']


AUDIO_STATS_SCHEMA = StructType([
    StructField('doc_id', LongType()),
    StructField('n_frames', IntegerType()),
    StructField('channels', IntegerType()),
    StructField('sample_rate', IntegerType()),
    StructField('amp_sum', LongType()),
    StructField('amp_mean_x100', LongType()),
])


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL RIFF/WAVE PCM payload per document:
    n_frames = doc_id%50+20, channels = doc_id%2+1, rate =
    8000 + (doc_id%4)*4000, interleaved sample k = ((doc_id%256)*31
    + k*17) % 4096 - 2048.  PCM is lossless, so a SQL oracle replays
    the decoded amplitude stats exactly while the Spark side
    round-trips real RIFF bytes through decode_wav."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf['doc_id'].values:
                doc_id = int(doc_id)
                n = doc_id % 50 + 20
                c = doc_id % 2 + 1
                rate = 8000 + (doc_id % 4) * 4000
                k = np.arange(n * c, dtype=np.int64)
                s = ((doc_id % 256) * 31 + k * 17) % 4096 - 2048
                rows.append({'doc_id': doc_id, 'payload': encode_wav(
                    s.astype(np.int16).reshape(n, c), rate)})
            if rows:
                yield pd.DataFrame(rows, columns=['doc_id', 'payload'])

    return docs.select('doc_id').mapInPandas(fn, PPM_MEDIA_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """Run the REAL ``decode_wav`` codec over a binary payload column
    and emit per-clip amplitude stats (same contract as
    ``decode_stats``: map-only mapInPandas, NULL payloads skipped,
    undecodable non-NULL payloads raise loudly)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf['doc_id'].values,
                                       pdf['payload'].values):
                if payload is None:
                    continue
                arr, rate = decode_wav(bytes(payload))
                n, c = arr.shape
                total = int(np.abs(arr.astype(np.int64)).sum())
                rows.append({
                    'doc_id': int(doc_id), 'n_frames': n,
                    'channels': c, 'sample_rate': int(rate),
                    'amp_sum': total,
                    'amp_mean_x100': total * 100 // max(n * c, 1),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in
                               AUDIO_STATS_SCHEMA.fields])

    return media.select('doc_id', 'payload').mapInPandas(
        fn, AUDIO_STATS_SCHEMA)


def encode_y4m(frames: np.ndarray, rate=(25, 1),
               colorspace: str = 'mono') -> bytes:
    """Encode video frames as YUV4MPEG2 (y4m) — the public
    UNCOMPRESSED video container (raw planar frames behind a text
    header; what ffmpeg/mjpegtools pipe between stages).
    ``frames``: (n, h, w) uint8 for mono, (n, h, w, 3) YCbCr for
    C444; C420 takes full-res YCbCr and 2x2 box-averages the chroma
    planes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape[:3]
    header = b'YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n' % (
        w, h, rate[0], rate[1], colorspace.encode())
    out = bytearray(header)
    for f in range(n):
        out += b'FRAME\n'
        if colorspace == 'mono':
            out += frames[f].tobytes()
        elif colorspace == '444':
            for p in range(3):
                out += frames[f, :, :, p].tobytes()
        elif colorspace == '420':
            out += frames[f, :, :, 0].tobytes()
            for p in (1, 2):
                out += _downsample2_u8(frames[f, :, :, p]).tobytes()
        else:
            raise ValueError('colorspace must be mono/444/420')
    return bytes(out)


def _downsample2_u8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode='edge')
    return plane.reshape(plane.shape[0] // 2, 2, plane.shape[1] // 2,
                         2).mean(axis=(1, 3)).astype(np.uint8)


def decode_y4m(payload: bytes):
    """Decode a YUV4MPEG2 payload -> (frames, meta).  Pure Python:
    header tag parse (W/H/F required, C defaults to 420 per the
    format's convention), then raw planar frames after each FRAME
    line.  Cmono -> (n, h, w); C444/C420 -> (n, h, w, 3) YCbCr with
    subsampled chroma upsampled nearest (mirrors decode_jpeg).
    C422 and the other colorspaces raise NotImplementedError;
    truncated frame data raises ValueError."""
    if not payload.startswith(b'YUV4MPEG2'):
        raise ValueError('not a YUV4MPEG2 payload')
    nl = payload.index(b'\n')
    tags = payload[10:nl].split()
    meta = {'colorspace': '420'}
    for tag in tags:
        key, val = tag[:1], tag[1:]
        if key == b'W':
            meta['width'] = int(val)
        elif key == b'H':
            meta['height'] = int(val)
        elif key == b'F':
            num, den = val.split(b':')
            meta['rate'] = (int(num), int(den))
        elif key == b'C':
            meta['colorspace'] = val.decode().rstrip()
    if 'width' not in meta or 'height' not in meta:
        raise ValueError('y4m header missing W or H')
    h, w = meta['height'], meta['width']
    cs = meta['colorspace']
    if cs.startswith('420'):        # 420 / 420jpeg / 420paldv siting
        plane_sizes = [h * w, (h // 2) * (w // 2), (h // 2) * (w // 2)]
        if h % 2 or w % 2:
            raise ValueError('C420 y4m requires even dims')
    elif cs == '444':
        plane_sizes = [h * w] * 3
    elif cs == 'mono':
        plane_sizes = [h * w]
    else:
        raise NotImplementedError(
            'y4m colorspace C%s not supported (mono/444/420*)' % cs)
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b'\n', pos)
        if payload[pos:pos + 5] != b'FRAME':
            raise ValueError('y4m FRAME marker missing at %d' % pos)
        pos = fnl + 1
        planes = []
        for size in plane_sizes:
            if pos + size > len(payload):
                raise ValueError('y4m frame data truncated')
            planes.append(np.frombuffer(payload, np.uint8,
                                        count=size, offset=pos))
            pos += size
        if cs == 'mono':
            frames.append(planes[0].reshape(h, w))
        else:
            y = planes[0].reshape(h, w)
            if cs == '444':
                cb, cr = (p.reshape(h, w) for p in planes[1:])
            else:
                cb, cr = (np.repeat(np.repeat(
                    p.reshape(h // 2, w // 2), 2, axis=0), 2, axis=1)
                    for p in planes[1:])
            frames.append(np.stack([y, cb, cr], axis=-1))
    return np.stack(frames) if frames else np.zeros(
        (0, h, w) if cs == 'mono' else (0, h, w, 3), np.uint8), meta


FRAME_STATS_SCHEMA = StructType([
    StructField('doc_id', LongType()),
    StructField('frame_idx', IntegerType()),
    StructField('width', IntegerType()),
    StructField('height', IntegerType()),
    StructField('n_frames', IntegerType()),
    StructField('byte_sum', LongType()),
    StructField('byte_mean_x100', LongType()),
])


def synth_y4m_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL y4m payload per document: Cmono,
    n_frames = doc_id%6+2, w = doc_id%8+4, h = doc_id%6+4, frame f
    byte j = ((doc_id%256)*7 + f*29 + j*13) % 256 — raw planar
    video is lossless, so a SQL oracle replays sampled-frame stats
    exactly."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf['doc_id'].values:
                doc_id = int(doc_id)
                n = doc_id % 6 + 2
                w, h = doc_id % 8 + 4, doc_id % 6 + 4
                f = np.arange(n, dtype=np.int64)[:, None]
                j = np.arange(h * w, dtype=np.int64)[None, :]
                frames = (((doc_id % 256) * 7 + f * 29 + j * 13)
                          % 256).astype(np.uint8).reshape(n, h, w)
                rows.append({'doc_id': doc_id, 'payload':
                             encode_y4m(frames, colorspace='mono')})
            if rows:
                yield pd.DataFrame(rows, columns=['doc_id', 'payload'])

    return docs.select('doc_id').mapInPandas(fn, PPM_MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling over a binary video column: decode_y4m each
    payload, keep every ``every_k``-th frame, emit per-frame stats.
    Map-only mapInPandas like the other codec operators — at scale
    the sampled-frame RASTERS would be emitted as a binary column
    for downstream feature extraction; the stats row is the gated
    witness that sampling touched the right frames.  NULL payloads
    skipped (same contract as decode_stats)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf['doc_id'].values,
                                       pdf['payload'].values):
                if payload is None:
                    continue
                frames, meta = decode_y4m(bytes(payload))
                n = frames.shape[0]
                for idx in range(0, n, every_k):
                    fr = frames[idx]
                    total = int(fr.astype(np.int64).sum())
                    rows.append({
                        'doc_id': int(doc_id), 'frame_idx': idx,
                        'width': meta['width'],
                        'height': meta['height'], 'n_frames': n,
                        'byte_sum': total,
                        'byte_mean_x100':
                            total * 100 // max(fr.size, 1),
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in
                               FRAME_STATS_SCHEMA.fields])

    return media.select('doc_id', 'payload').mapInPandas(
        fn, FRAME_STATS_SCHEMA)


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


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL PNG payload per document: same raster
    arithmetic as ``synth_ppm_media`` (byte j = ((doc_id%256)*7 +
    j*13) % 256, w = doc_id%8+4, h = doc_id%6+4) but with channels =
    doc_id%4+1 (grayscale / gray+alpha / RGB / RGBA) and row filter
    type (doc_id + y) % 5 — every PNG color layout AND every filter
    branch is exercised corpus-wide, while an independent engine can
    still recompute the decoded stats from doc_id arithmetic alone.

    Docs with ``doc_id % 7 == 3`` instead emit a PALETTE (color type
    3) PNG: the same byte stream becomes 256-range indices into a
    fixed arithmetic palette entry i = ((i*3+1)%256, (i*5+2)%256,
    (i*7+3)%256); odd doc_ids add a 128-entry tRNS chunk (alpha i =
    (i*11+4)%256, entries 128..255 default opaque per spec 11.3.2),
    so the PLTE lookup AND the short-tRNS path are driver-gated, and
    the decoded bytes stay pure doc_id arithmetic for the oracle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pal_i = np.arange(256, dtype=np.int64)
        pal = np.stack([(pal_i * 3 + 1) % 256, (pal_i * 5 + 2) % 256,
                        (pal_i * 7 + 3) % 256], axis=1).astype(np.uint8)
        trns = ((pal_i[:128] * 11 + 4) % 256).astype(np.uint8)
        for pdf in batches:
            rows = []
            for doc_id in pdf['doc_id'].values:
                doc_id = int(doc_id)
                w, h = doc_id % 8 + 4, doc_id % 6 + 4
                rf = lambda y, d=doc_id: (d + y) % 5
                if doc_id % 7 == 3:
                    j = np.arange(w * h, dtype=np.int64)
                    idx = (((doc_id % 256) * 7 + j * 13) % 256)
                    payload = encode_png_palette(
                        idx.astype(np.uint8).reshape(h, w), pal,
                        trns=trns if doc_id % 2 else None,
                        row_filter=rf)
                else:
                    c = doc_id % 4 + 1
                    j = np.arange(w * h * c, dtype=np.int64)
                    raster = (((doc_id % 256) * 7 + j * 13) % 256)
                    payload = encode_png(
                        raster.astype(np.uint8).reshape(h, w, c),
                        row_filter=rf)
                rows.append({'doc_id': doc_id, 'payload': payload})
            if rows:
                yield pd.DataFrame(rows, columns=['doc_id', 'payload'])

    return docs.select('doc_id').mapInPandas(fn, PPM_MEDIA_SCHEMA)


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL baseline-JPEG payload per document, built
    on the codec's lossless witness (jpeg.py module docstring): each
    image is bw x bh 8x8-constant blocks (bw = doc_id%3+1, bh =
    doc_id%2+1) with block j's value v = 32 + 2*(((doc_id%256)*7 +
    j*13) % 96) — EVEN, so the DC quantizer 16 divides 8*(v-128) and
    the lossy pipeline round-trips bit-exactly.  Every block still
    flows through the full entropy path (DC prediction + Huffman +
    EOB), so a SQL oracle replaying the v-arithmetic gates the real
    decoder, not a shortcut."""
    from .jpeg import encode_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf['doc_id'].values:
                doc_id = int(doc_id)
                bw, bh = doc_id % 3 + 1, doc_id % 2 + 1
                j = np.arange(bh * bw, dtype=np.int64)
                v = 32 + 2 * (((doc_id % 256) * 7 + j * 13) % 96)
                img = np.kron(v.reshape(bh, bw),
                              np.ones((8, 8), np.int64))
                rows.append({'doc_id': doc_id, 'payload':
                             encode_jpeg(img.astype(np.uint8))})
            if rows:
                yield pd.DataFrame(rows, columns=['doc_id', 'payload'])

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
