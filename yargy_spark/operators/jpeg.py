"""Pure-Python baseline JPEG (JFIF / SOF0) codec — numpy DCT, real
Huffman entropy coding, no external libraries.

Closes the last acknowledged image-codec boundary of
``multimodal.decode_image`` (reference parity note: the reference
treats binary media as an external-tool boundary; this repo decodes
the public formats in-process so `decode_stats` can gate them).

Scope — the baseline DCT process, decode side fully general within
it:

  * markers: SOI, APPn/COM (skipped), DQT (8-bit, multiple tables),
    SOF0, DHT (any canonical table, read from the file — NOT
    hard-wired to the encoder's), SOS, EOI;
  * entropy-coded segment: bit-level Huffman decode, DC prediction,
    AC run-length (EOB / ZRL), 0xFF00 byte unstuffing;
  * 8x8 dequantize -> de-zigzag -> orthonormal IDCT (numpy matmul)
    -> level shift -> clamp; right/bottom padding cropped to the
    SOF0 dims;
  * grayscale (1 component) and interleaved YCbCr (3 components,
    JFIF full-range matrix) at ANY integer sampling ratio — 4:4:4,
    4:2:0, 4:2:2 — subsampled chroma upsampled nearest-neighbor.

Explicit NotImplementedError boundaries (loud, never silent):
progressive (SOF2) and every non-SOF0 frame type, 16-bit DQT,
non-integer sampling ratios, restart intervals (DRI), and
arithmetic coding.

The encoder twin (``encode_jpeg``) emits spec-valid baseline JPEG:
its quantization and Huffman tables travel in DQT/DHT segments like
any other JPEG's, so agreement between the pair proves the container
format + entropy coder + transform, not a shared lookup table.  The
Huffman tables it WRITES are canonical fixed-length tables (12x4-bit
DC, 162x8-bit AC — valid per the spec's Kraft/all-ones rules, chosen
over the Annex K defaults so the code derives them instead of
transcribing them); the decoder reads whatever tables the file
declares.

Lossless-witness property used by the ``multimodal_jpeg`` driver
gate: for a block-constant image the forward DCT has a single DC
coefficient 8*(v-128); with the DC quantizer 16, any EVEN v
round-trips bit-exactly (8*(v-128) = 16*k), so decoded stats are
pure doc_id arithmetic a SQL oracle can replay — while the entropy
path still exercises real per-block Huffman coding.  Lossy behavior
on arbitrary images is bounded by the quantizer (see
tests/test_docops.py tolerance round-trips).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- DCT

_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# zigzag scan order, derived not transcribed: diagonals of constant
# u+v, even diagonals walked bottom-up (u descending)
_ZIG = sorted(((u, v) for u in range(8) for v in range(8)),
              key=lambda p: (p[0] + p[1],
                             -p[0] if (p[0] + p[1]) % 2 == 0 else p[0]))
_ZIG_IDX = np.array([u * 8 + v for u, v in _ZIG])

# encoder-side quantization tables (DQT carries them; any positive
# 8-bit ints are spec-valid).  DC step 16 gives the even-value
# lossless witness; flat AC step 8 keeps lossy error tightly bounded
# (|err per coef| <= 4 -> L2 per block <= 32).
Q_LUMA = np.full((8, 8), 8, np.uint8)
Q_LUMA[0, 0] = 16
Q_CHROMA = Q_LUMA.copy()


# ------------------------------------------------------- Huffman spec

def _canonical_codes(bits, huffval):
    """(BITS[1..16], HUFFVAL) -> {(length, code): symbol} exactly as
    ITU-T T.81 C.2 generates them (code 0 first at the shortest
    length, +1 per symbol, <<1 per length step)."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _fixed_length_table(symbols, ln):
    """A canonical table giving every symbol the same code length —
    valid when count < 2**ln (Kraft) and, as the spec requires, the
    all-ones code stays unassigned."""
    assert len(symbols) < (1 << ln)
    bits = [0] * 16
    bits[ln - 1] = len(symbols)
    return bits, list(symbols)


_DC_SYMBOLS = list(range(12))                     # categories 0..11
_AC_SYMBOLS = ([0x00, 0xF0]                       # EOB, ZRL
               + [(r << 4) | s for r in range(16)
                  for s in range(1, 11)])
_DC_SPEC = _fixed_length_table(_DC_SYMBOLS, 4)
_AC_SPEC = _fixed_length_table(_AC_SYMBOLS, 8)
_DC_ENC = {v: (ln, code) for (ln, code), v
           in _canonical_codes(*_DC_SPEC).items()}
_AC_ENC = {v: (ln, code) for (ln, code), v
           in _canonical_codes(*_AC_SPEC).items()}


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ------------------------------------------------------------ bit I/O

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        # drop the emitted high bits — otherwise acc grows with the
        # whole stream and every shift turns O(stream length)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:               # pad with 1-bits per F.1.2.3
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError('JPEG entropy stream truncated')
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError('JPEG entropy stream truncated at FF')
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1        # stuffed FF
            elif 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError(
                    'JPEG restart markers (DRI/RSTn) not supported')
            else:
                raise ValueError(
                    'unexpected marker FF%02X inside entropy data'
                    % nxt)
        # keep only the unread low bits before appending — the read
        # side of the same unbounded-int growth trap as _BitWriter
        self.acc = (((self.acc & ((1 << self.nbits) - 1)) << 8)
                    | byte)
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError('invalid Huffman code in JPEG stream')


def _extend(bits: int, size: int) -> int:
    """Received SIZE-bit value -> signed coefficient (T.81 F.2.2.1)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------ encoder

def _encode_block(writer, coefq, pred_dc, dc_enc, ac_enc):
    """Quantized zigzag coefficient vector -> entropy bits; returns
    this block's DC for the caller's predictor."""
    dc = int(coefq[0])
    diff = dc - pred_dc
    size = _bit_size(diff)
    ln, code = dc_enc[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1,
                     size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coefq[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coefq[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_enc[0xF0]          # ZRL
            writer.write(code, ln)
            run -= 16
        size = _bit_size(v)
        ln, code = ac_enc[(run << 4) | size]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]              # EOB
        writer.write(code, ln)
    return dc


def _mcu_block_list(plane: np.ndarray, hc: int, vc: int,
                    mcux: int, mcuy: int):
    """Pad (edge-replicate) a component plane to the MCU grid and
    return its 8x8 blocks in interleaved scan order: raster over
    MCUs, then the component's vc x hc blocks raster-order within
    each MCU (T.81 A.2.3)."""
    ph = 8 * vc * mcuy - plane.shape[0]
    pw = 8 * hc * mcux - plane.shape[1]
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode='edge')
    blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            for v in range(vc):
                for u in range(hc):
                    by, bx = my * vc + v, mx * hc + u
                    blocks.append(plane[by * 8:by * 8 + 8,
                                        bx * 8:bx * 8 + 8])
    return blocks


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box average (the conventional 4:2:0 chroma reduction);
    odd dims edge-pad first so every output sample averages a full
    quad."""
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode='edge')
    return plane.reshape(plane.shape[0] // 2, 2,
                         plane.shape[1] // 2, 2).mean(axis=(1, 3))


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, 'big') \
        + payload


def _dht_payload(cls, tid, spec):
    bits, vals = spec
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = (arr[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def encode_jpeg(arr: np.ndarray, subsampling: str = '444') -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as
    baseline JFIF (SOF0), tables in DQT/DHT.  ``subsampling``:
    ``'444'`` (every plane full-resolution, the lossless-witness
    path) or ``'420'`` (chroma 2x2 box-averaged, Y sampling 2x2 —
    the common camera/web layout)."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError('JPEG dims out of range: %dx%d' % (w, h))
    if subsampling not in ('444', '420'):
        raise ValueError('subsampling must be 444 or 420')
    if gray:
        planes = [arr.astype(np.float64)]
        quants = [Q_LUMA]
        comp_q = [0]
        comp_hv = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(arr.astype(np.uint8))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        quants = [Q_LUMA, Q_CHROMA, Q_CHROMA]
        comp_q = [0, 1, 1]
        if subsampling == '420':
            planes = [planes[0], _downsample2(planes[1]),
                      _downsample2(planes[2])]
            comp_hv = [(2, 2), (1, 1), (1, 1)]
        else:
            comp_hv = [(1, 1)] * 3

    out = bytearray(b'\xff\xd8')                     # SOI
    out += _seg(0xE0, b'JFIF\x00\x01\x01\x00'        # APP0
                + b'\x00\x01\x00\x01\x00\x00')
    seen = set()
    for tid, q in zip(comp_q, quants):
        if tid in seen:
            continue
        seen.add(tid)
        out += _seg(0xDB, bytes([tid])
                    + bytes(int(q.reshape(64)[i]) for i in _ZIG_IDX))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, 'big') + w.to_bytes(2, 'big') \
        + bytes([ncomp])
    for ci in range(ncomp):
        hc, vc = comp_hv[ci]
        sof += bytes([ci + 1, (hc << 4) | vc, comp_q[ci]])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_SPEC))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_SPEC))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])                 # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    hmax = max(hc for hc, _ in comp_hv)
    vmax = max(vc for _, vc in comp_hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    writer = _BitWriter()
    block_lists = [_mcu_block_list(p, hc, vc, mcux, mcuy)
                   for p, (hc, vc) in zip(planes, comp_hv)]
    preds = [0] * ncomp
    for m in range(mcux * mcuy):                     # interleaved MCUs
        for ci in range(ncomp):
            hc, vc = comp_hv[ci]
            for k in range(hc * vc):
                block = block_lists[ci][m * hc * vc + k] - 128.0
                coef = _dct2(block)
                q = quants[comp_q[ci]].astype(np.float64)
                coefq = np.rint(coef / q).astype(np.int64) \
                    .reshape(64)[_ZIG_IDX]
                preds[ci] = _encode_block(writer, coefq, preds[ci],
                                          _DC_ENC, _AC_ENC)
    out += writer.flush()
    out += b'\xff\xd9'                               # EOI
    return bytes(out)


# ------------------------------------------------------------ decoder

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JFIF payload to (h, w) uint8 for
    grayscale, (h, w, 3) for YCbCr color — any integer sampling
    ratio (4:4:4, 4:2:0, 4:2:2, ...); subsampled chroma is
    upsampled nearest-neighbor.  Tables come from the file's own
    DQT/DHT segments."""
    if payload[:2] != b'\xff\xd8':
        raise ValueError('not a JPEG payload (no SOI)')
    pos = 2
    quants, dc_tables, ac_tables = {}, {}, {}
    frame = None
    while True:
        if pos + 2 > len(payload):
            raise ValueError('JPEG truncated before SOS')
        if payload[pos] != 0xFF:
            raise ValueError('JPEG marker sync lost at %d' % pos)
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError('JPEG has no scan data (EOI before SOS)')
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                                 # standalone
        if pos + 2 > len(payload):
            raise ValueError('JPEG segment length truncated')
        seg_len = int.from_bytes(payload[pos:pos + 2], 'big')
        data = payload[pos + 2:pos + seg_len]
        if len(data) != seg_len - 2:
            raise ValueError('JPEG segment payload truncated')
        pos += seg_len
        if marker == 0xDB:                           # DQT
            dpos = 0
            while dpos < len(data):
                pq, tq = data[dpos] >> 4, data[dpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        '16-bit DQT not supported')
                tbl = np.zeros(64, np.int64)
                tbl[_ZIG_IDX] = np.frombuffer(
                    data[dpos + 1:dpos + 65], np.uint8)
                quants[tq] = tbl.reshape(8, 8)
                dpos += 65
        elif marker == 0xC4:                         # DHT
            dpos = 0
            while dpos < len(data):
                cls, tid = data[dpos] >> 4, data[dpos] & 0x0F
                bits = list(data[dpos + 1:dpos + 17])
                n = sum(bits)
                vals = list(data[dpos + 17:dpos + 17 + n])
                tbl = _canonical_codes(bits, vals)
                (dc_tables if cls == 0 else ac_tables)[tid] = tbl
                dpos += 17 + n
        elif marker == 0xC0:                         # SOF0
            prec = data[0]
            if prec != 8:
                raise NotImplementedError(
                    'JPEG precision %d not supported' % prec)
            h = int.from_bytes(data[1:3], 'big')
            w = int.from_bytes(data[3:5], 'big')
            ncomp = data[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = data[6 + 3 * ci:9 + 3 * ci]
                hc, vc = hv >> 4, hv & 0x0F
                if not (1 <= hc <= 4 and 1 <= vc <= 4):
                    raise ValueError(
                        'JPEG sampling factor 0x%02X out of range'
                        % hv)
                comps.append({'id': cid, 'tq': tq,
                              'hc': hc, 'vc': vc})
            if ncomp == 1:
                # single-component scans are non-interleaved: data
                # units cover the image block grid regardless of the
                # declared sampling factors (T.81 A.2.2)
                comps[0]['hc'] = comps[0]['vc'] = 1
            frame = {'h': h, 'w': w, 'comps': comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                'non-baseline JPEG frame FF%02X (progressive/'
                'arithmetic/lossless) not supported' % marker)
        elif marker == 0xDD:
            raise NotImplementedError(
                'JPEG restart intervals (DRI) not supported')
        elif marker == 0xDA:                         # SOS
            if frame is None:
                raise ValueError('JPEG SOS before SOF0')
            ns = data[0]
            if ns != len(frame['comps']):
                raise NotImplementedError(
                    'non-interleaved multi-scan JPEG not supported')
            for si in range(ns):
                cid, tds = data[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in frame['comps']
                            if c['id'] == cid)
                comp['dc'] = dc_tables[tds >> 4]
                comp['ac'] = ac_tables[tds & 0x0F]
            break
        # APPn / COM / other: skipped

    h, w, comps = frame['h'], frame['w'], frame['comps']
    hmax = max(c['hc'] for c in comps)
    vmax = max(c['vc'] for c in comps)
    for c in comps:
        if hmax % c['hc'] or vmax % c['vc']:
            raise NotImplementedError(
                'non-integer JPEG sampling ratio %dx%d vs max %dx%d'
                % (c['hc'], c['vc'], hmax, vmax))
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((8 * c['vc'] * mcuy, 8 * c['hc'] * mcux),
                       np.float64) for c in comps]
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, comp in enumerate(comps):
            hc, vc = comp['hc'], comp['vc']
            for k in range(vc * hc):
                v, u = divmod(k, hc)
                size = reader.read_symbol(comp['dc'])
                preds[ci] += _extend(reader.read_bits(size), size)
                zz = np.zeros(64, np.int64)
                zz[0] = preds[ci]
                i = 1
                while i < 64:
                    rs = reader.read_symbol(comp['ac'])
                    if rs == 0x00:                   # EOB
                        break
                    if rs == 0xF0:                   # ZRL
                        i += 16
                        continue
                    run, size = rs >> 4, rs & 0x0F
                    i += run
                    if i > 63:
                        raise ValueError(
                            'JPEG AC index overrun (corrupt stream)')
                    zz[i] = _extend(reader.read_bits(size), size)
                    i += 1
                coef = np.zeros(64, np.float64)
                coef[_ZIG_IDX] = zz * quants[comp['tq']].reshape(
                    64)[_ZIG_IDX]
                block = _idct2(coef.reshape(8, 8)) + 128.0
                by, bx = my * vc + v, mx * hc + u
                planes[ci][by * 8:by * 8 + 8,
                           bx * 8:bx * 8 + 8] = block

    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c['vc'], hmax // c['hc']
        if ry > 1:                   # nearest-neighbor chroma upsample
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = full[0]
    elif len(comps) == 3:
        out = ycbcr_to_rgb(np.stack(full, axis=-1))
    else:
        raise NotImplementedError(
            '%d-component JPEG not supported' % len(comps))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
