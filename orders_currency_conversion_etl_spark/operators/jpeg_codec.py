"""Pure-Python baseline JPEG codec (r10) — zero native dependencies.

Completes the dependency-free decode tier (PPM r9, PNG r10,
JPEG here): a user handing the engine JFIF bytes no longer hits the
PIL gate for the single most common compressed format in real
corpora. Reference parity note: the reference has no media handling
at all (its payloads are Postgres rows,
dags/order_currency_conversion_dag.py:95-103); this module is
north-star EXT surface for multimodal columns.

Scope (documented, enforced, honestly gated):
- baseline sequential DCT (SOF0), 8-bit, grayscale or 3-component
  YCbCr — 4:4:4 (what :func:`encode_jpeg` emits) AND chroma-
  subsampled 4:2:0 / 4:2:2 / 4:4:0 (r14: sampling factors 1 or 2,
  interleaved-MCU traversal per T.81 A.2.3, nearest-neighbor chroma
  upsampling; :func:`encode_jpeg_subsampled` writes the fixtures and
  a hand-assembled two-MCU stream pins the block order against the
  spec rather than against this encoder);
- PROGRESSIVE DCT (SOF2, r14): multi-scan coefficient accumulation
  per ITU T.81 §G — DC first/refinement, AC first/refinement with
  spectral selection, successive approximation, EOB runs and
  refinement correction bits; incomplete scan scripts reconstruct
  from whatever arrived (the progressive-preview contract).
  :func:`encode_jpeg_progressive` writes a 14-scan script covering
  every scan type for the roundtrip pin, and the decisive oracle is
  cross-PIPELINE: progressive and baseline encodings share the exact
  quantized coefficients, so their decodes must match byte-for-byte;
- restart markers (DRI/RSTn) handled on decode;
- arithmetic coding, 12-bit, hierarchical (SOF3/5/...), sampling
  factors above 2, and progressive-with-subsampling raise
  ``NotImplementedError`` naming the limitation.

JPEG is lossy by design, so unlike the PNG path there is no byte
round-trip to pin. Correctness rests on three independent legs
(tests/test_llm_ops.py):
1. a HAND-ASSEMBLED spec vector — a single-block grayscale stream
   with a unit quant table and a hand-built Huffman table, whose
   DC-only block must decode to an exactly computable constant;
2. encode->decode error bounds derived from the quantization tables
   (solid colors within +-3 at quality 75; smooth gradients within a
   looser analytic bound);
3. the registered query's within-tolerance booleans, cross-checked by
   the DuckDB oracle on dims/mode plus the tolerance contract.

Performance shape: entropy decode is inherently bit-serial, so it
runs inside Arrow-batched ``mapInPandas`` like every other decoder
here — per-row Python, amortized over executor-side batches, never on
the driver. DCT/IDCT/color transforms are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (JPEG Annex K)
# --------------------------------------------------------------------------

#: Standard luminance / chrominance quantization tables, natural order.
_Q_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_Q_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: Zigzag scan order: _ZIGZAG[k] = (row, col) of the k-th coefficient.
#: Odd anti-diagonals run top-right -> bottom-left (row ascending),
#: even ones the reverse — (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),...
#: Spec-pinned in tests against the published sequence, because an
#: encoder/decoder PAIR round-trips under ANY permutation — only
#: interop with real JPEG streams catches a wrong scan order.
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
    return order


_ZIGZAG = _zigzag_order()
_ZROWS = np.array([r for r, _ in _ZIGZAG])
_ZCOLS = np.array([c for _, c in _ZIGZAG])

#: Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL).
_DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: 8x8 DCT-II matrix T (T @ block @ T.T = forward, T.T @ F @ T = inverse):
#: T[u,x] = c(u)/2 * cos((2x+1)u*pi/16), c(0)=1/sqrt(2) else 1.
def _dct_matrix() -> np.ndarray:
    T = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = c / 2 * np.cos((2 * x + 1) * u * np.pi / 16)
    return T


_T = _dct_matrix()


# Table-build memoization (r11): every image carries the same four
# Annex K Huffman specs and (per quality) the same two quant tables, so
# rebuilding them per call dominated tiny-image encode/decode — ~35% of
# encode and ~45% of decode in the registry's solid-color workload.
# Keys are the raw byte content (counts/symbols are all < 256), capped
# defensively for adversarial streams carrying many distinct tables.
_TABLE_CACHE_CAP = 64
_CODES_CACHE: dict[tuple[bytes, bytes], dict[int, tuple[int, int]]] = {}
_DECODE_CACHE: dict[tuple[bytes, bytes], dict[tuple[int, int], int]] = {}
_QSCALE_CACHE: dict[tuple[bytes, int], np.ndarray] = {}


def _canonical_codes(bits: "list[int]", vals: "list[int]") -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical JPEG code assignment."""
    key = (bytes(bits), bytes(vals))
    hit = _CODES_CACHE.get(key)
    if hit is not None:
        return hit
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(_CODES_CACHE) >= _TABLE_CACHE_CAP:
        _CODES_CACHE.clear()
    _CODES_CACHE[key] = out
    return out


def _decode_table(bits: "list[int]", vals: "list[int]") -> dict[tuple[int, int], int]:
    """(length, code) -> value, for bit-serial decoding."""
    key = (bytes(bits), bytes(vals))
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    enc = _canonical_codes(bits, vals)
    out = {(length, code): v for v, (code, length) in enc.items()}
    if len(_DECODE_CACHE) >= _TABLE_CACHE_CAP:
        _DECODE_CACHE.clear()
    _DECODE_CACHE[key] = out
    return out


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    key = (base.tobytes(), quality)
    hit = _QSCALE_CACHE.get(key)
    if hit is not None:
        return hit
    q = max(1, min(100, quality))
    s = 5000 // q if q < 50 else 200 - 2 * q
    out = (base * s + 50) // 100
    out = np.clip(out, 1, 255).astype(np.int32)
    out.setflags(write=False)  # shared across calls — must stay immutable
    if len(_QSCALE_CACHE) >= _TABLE_CACHE_CAP:
        _QSCALE_CACHE.clear()
    _QSCALE_CACHE[key] = out
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended-bits value for v (F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bitsval = v if v > 0 else v + (1 << size) - 1
    return size, bitsval


def _extend(bitsval: int, size: int) -> int:
    """Inverse of :func:`_magnitude` (JPEG EXTEND procedure)."""
    if size == 0:
        return 0
    if bitsval < (1 << (size - 1)):
        return bitsval - (1 << size) + 1
    return bitsval


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        # Drop the drained high bits: without this the Python bigint
        # grows by 8 bits per emitted byte and every shift above turns
        # O(stream length), making the whole entropy pass O(n^2).
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(width: int, height: int, rgb: bytes):
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _edge_pad(comp: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Hand-rolled edge pad: np.pad's Python-side setup cost (~60 us)
    dominated tiny-image encode (r11 profile)."""
    h, w = comp.shape
    if ph == h and pw == w:
        return comp
    out = np.empty((ph, pw), dtype=comp.dtype)
    out[:h, :w] = comp
    out[h:, :w] = comp[h - 1 :, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _dct_quant_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (H/8, W/8, 64) zigzag quantized int64."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ijxy,vy->ijuv", _T, blocks, _T)
    return np.round(coef / qt).astype(np.int64)[:, :, _ZROWS, _ZCOLS]


def _component_coefficients(width: int, height: int, rgb: bytes, quality: int):
    """Shared front half of the 4:4:4 encoders: RGB -> YCbCr -> pad ->
    blockwise DCT -> quantize -> zigzag. Returns (zz_planes, qy, qc)
    where ``zz_planes[ci]`` is an int64 array of shape
    (blocks_h, blocks_w, 64). The progressive writer serializing THESE
    exact values is what makes the cross-pipeline oracle exact."""
    y, cb, cr = _rgb_to_ycbcr(width, height, rgb)
    qy, qc = _scaled_q(_Q_LUM, quality), _scaled_q(_Q_CHROM, quality)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    return (
        [
            _dct_quant_blocks(_edge_pad(y, ph, pw), qy),
            _dct_quant_blocks(_edge_pad(cb, ph, pw), qc),
            _dct_quant_blocks(_edge_pad(cr, ph, pw), qc),
        ],
        qy,
        qc,
    )


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _jpeg_dqt(tid: int, qt: np.ndarray) -> bytes:
    return _jpeg_seg(
        0xFFDB, bytes([tid]) + qt[_ZROWS, _ZCOLS].astype(np.uint8).tobytes()
    )


def _jpeg_dht(cls: int, tid: int, spec: "tuple[list[int], list[int]]") -> bytes:
    bits, vals = spec
    return _jpeg_seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _emit_entropy_block(w, zz, pred, ci, dct_codes, act_codes) -> None:
    """One block's baseline entropy coding (DC diff + AC run-length)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, bitsval = _magnitude(diff)
    code, length = dct_codes[size]
    w.write(code, length)
    if size:
        w.write(bitsval, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bitsval = _magnitude(v)
        code, length = act_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bitsval, size)
        run = 0
    if run:
        code, length = act_codes[0x00]  # EOB
        w.write(code, length)


def encode_jpeg(width: int, height: int, rgb: bytes, quality: int = 75) -> bytes:
    """Minimal baseline JFIF writer: 3 components, 4:4:4 (no chroma
    subsampling), Annex K Huffman tables, quality-scaled Annex K quant
    tables. Deterministic: same pixels -> same bytes."""
    zz_planes, qy, qc = _component_coefficients(width, height, rgb, quality)
    dc_l, ac_l = _canonical_codes(*_DC_LUM_SPEC), _canonical_codes(*_AC_LUM_SPEC)
    dc_c, ac_c = _canonical_codes(*_DC_CHROM_SPEC), _canonical_codes(*_AC_CHROM_SPEC)
    bh, bw = zz_planes[0].shape[:2]
    planes = [
        (zz_planes[0], dc_l, ac_l),
        (zz_planes[1], dc_c, ac_c),
        (zz_planes[2], dc_c, ac_c),
    ]

    w = _BitWriter()
    pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for ci, (zplane, dct_codes, act_codes) in enumerate(planes):
                _emit_entropy_block(
                    w, zplane[by, bx], pred, ci, dct_codes, act_codes
                )
    scan = w.flush()

    sof = _jpeg_seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _jpeg_seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + _jpeg_dqt(0, qy) + _jpeg_dqt(1, qc)
        + sof
        + _jpeg_dht(0, 0, _DC_LUM_SPEC) + _jpeg_dht(1, 0, _AC_LUM_SPEC)
        + _jpeg_dht(0, 1, _DC_CHROM_SPEC) + _jpeg_dht(1, 1, _AC_CHROM_SPEC)
        + sos + scan + b"\xff\xd9"
    )


def encode_jpeg_subsampled(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 75,
    factors: "tuple[int, int]" = (2, 2),
) -> bytes:
    """Chroma-subsampled baseline JFIF writer (r14): luma carries
    sampling ``factors`` (``(2, 2)`` = 4:2:0, ``(2, 1)`` = 4:2:2,
    ``(1, 2)`` = 4:4:0), chroma is box-averaged down by the same
    factors and coded 1x1 — the interleaved-MCU layout of T.81 A.2.3
    (luma's v x h blocks in raster order, then one Cb and one Cr block
    per MCU). Exists so the subsampled DECODE path has a real fixture;
    the test expectation recomputes downsample/DCT/quant/IDCT/upsample
    independently."""
    hs, vs = factors
    if hs not in (1, 2) or vs not in (1, 2) or (hs, vs) == (1, 1):
        raise ValueError("factors must subsample: (2, 2), (2, 1) or (1, 2)")
    y, cb, cr = _rgb_to_ycbcr(width, height, rgb)
    qy, qc = _scaled_q(_Q_LUM, quality), _scaled_q(_Q_CHROM, quality)
    mcus_x = -(-width // (8 * hs))
    mcus_y = -(-height // (8 * vs))
    ypad = _edge_pad(y, mcus_y * vs * 8, mcus_x * hs * 8)

    def down(c: np.ndarray) -> np.ndarray:
        ch, cw = -(-height // vs), -(-width // hs)
        cpad = _edge_pad(c, ch * vs, cw * hs)
        return cpad.reshape(ch, vs, cw, hs).mean(axis=(1, 3))

    cbp = _edge_pad(down(cb), mcus_y * 8, mcus_x * 8)
    crp = _edge_pad(down(cr), mcus_y * 8, mcus_x * 8)
    zzy = _dct_quant_blocks(ypad, qy)
    zzcb = _dct_quant_blocks(cbp, qc)
    zzcr = _dct_quant_blocks(crp, qc)

    dc_l, ac_l = _canonical_codes(*_DC_LUM_SPEC), _canonical_codes(*_AC_LUM_SPEC)
    dc_c, ac_c = _canonical_codes(*_DC_CHROM_SPEC), _canonical_codes(*_AC_CHROM_SPEC)
    w = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for v in range(vs):
                for u in range(hs):
                    _emit_entropy_block(
                        w, zzy[my * vs + v, mx * hs + u], pred, 0, dc_l, ac_l
                    )
            _emit_entropy_block(w, zzcb[my, mx], pred, 1, dc_c, ac_c)
            _emit_entropy_block(w, zzcr[my, mx], pred, 2, dc_c, ac_c)
    scan = w.flush()

    sof = _jpeg_seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _jpeg_seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + _jpeg_dqt(0, qy) + _jpeg_dqt(1, qc)
        + sof
        + _jpeg_dht(0, 0, _DC_LUM_SPEC) + _jpeg_dht(1, 0, _AC_LUM_SPEC)
        + _jpeg_dht(0, 1, _DC_CHROM_SPEC) + _jpeg_dht(1, 1, _AC_CHROM_SPEC)
        + sos + scan + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# Progressive encoder (r14): a fixed 14-scan script that exercises all
# four scan types of ITU T.81 §G — DC first (Al=1), DC refinement,
# and per component AC first + AC refinement over two spectral bands.
# AC scans need EOBn symbols Annex K's tables don't carry, so each AC
# scan emits a custom DHT built from the symbols it actually uses
# (equal-length canonical code, all-ones code left unused).
# --------------------------------------------------------------------------


def _equal_length_spec(symbols: "list[int]") -> "tuple[list[int], list[int]]":
    """Canonical Huffman spec giving every symbol the same length
    L = ceil(log2(n+1)) — valid (Kraft < 1) and decodable; the +1
    keeps the all-ones code unused per JPEG convention."""
    syms = sorted(set(symbols)) or [0x00]
    L = len(syms).bit_length()  # ceil(log2(n+1)): 2^L > n
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


class _ProgressiveACWriter:
    """AC scan emitter with the EOB-run / buffered-correction-bit
    accounting of T.81 §G.1.2.2-3 (the same bookkeeping public
    encoders use): correction bits for already-nonzero coefficients
    are buffered and flushed after the next newly-nonzero coefficient
    or with the pending EOB run."""

    def __init__(self, writer: "_BitWriter | None", codes: "dict | None"):
        self.w = writer
        self.codes = codes
        self.eobrun = 0
        self.pending_bits: "list[int]" = []
        self.used: "set[int]" = set()

    def _emit(self, sym: int) -> None:
        self.used.add(sym)
        if self.w is not None:
            code, length = self.codes[sym]
            self.w.write(code, length)

    def _emit_bits(self, val: int, n: int) -> None:
        if self.w is not None and n:
            self.w.write(val, n)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self._emit(r << 4)
            self._emit_bits(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self._emit_bits(b, 1)
        self.pending_bits = []

    def ac_first_block(self, zz, ss: int, se: int, al: int) -> None:
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = (abs(v) >> al) * (1 if v >= 0 else -1)  # magnitude shift
            if t == 0:
                run += 1
                continue
            self.flush_eobrun()
            while run > 15:
                self._emit(0xF0)
                run -= 16
            size, bitsval = _magnitude(t)
            self._emit((run << 4) | size)
            self._emit_bits(bitsval, size)
            run = 0
        if run:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine_block(self, zz, ss: int, se: int, al: int) -> None:
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in vals]
        # last NEWLY-nonzero index: ZRLs are only emitted while one
        # remains ahead — trailing zeros/corrections fold into the EOB
        # run instead (T.81 G.1.2.3's "not if foldable into EOB")
        new_last = -1
        for i, a in enumerate(absv):
            if a == 1:
                new_last = i
        run = 0
        buffered: "list[int]" = []
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            # ZRLs are due EAGERLY at any nonzero position (history or
            # new) so each emitted symbol's appended correction bits
            # are exactly the history positions the decoder traverses
            # for THAT symbol's 16-zero window
            while run > 15 and i <= new_last:
                self.flush_eobrun()
                self._emit(0xF0)
                run -= 16
                for bit in buffered:
                    self._emit_bits(bit, 1)
                buffered = []
            if a > 1:  # history: correction bit, buffered
                buffered.append(a & 1)
                continue
            # newly nonzero (magnitude exactly 1 at this precision)
            self.flush_eobrun()
            self._emit((run << 4) | 1)
            self._emit_bits(1 if vals[i] >= 0 else 0, 1)
            for bit in buffered:
                self._emit_bits(bit, 1)
            buffered = []
            run = 0
        if run > 0 or buffered:
            # the tail (zero-history positions and/or corrections past
            # the last newly-nonzero coefficient) folds into the EOB
            # run; its correction bits ride along and are emitted
            # right after the EOBn code, in block order
            self.eobrun += 1
            self.pending_bits.extend(buffered)
            if self.eobrun == 0x7FFF or len(self.pending_bits) > 900:
                self.flush_eobrun()


def encode_jpeg_progressive(
    width: int, height: int, rgb: bytes, quality: int = 75
) -> bytes:
    """Progressive JFIF writer (SOF2): the same quantized coefficients
    as :func:`encode_jpeg` (shared :func:`_component_coefficients`)
    serialized as a 14-scan script that exercises every §G scan type —

      1. DC first, interleaved, Al=1
      2. DC refinement, interleaved, Ah=1 Al=0
      3-8.  per component: AC first Ss=1..5 and Ss=6..63, Al=1
      9-14. per component: AC refinement over the same bands, Ah=1

    AC scans carry EOBn symbols Annex K has no codes for, so each AC
    scan runs a DRY pass to collect its symbol set and emits a custom
    equal-length DHT before its SOS. Decoding this stream must equal
    decoding the baseline encoding of the same pixels BYTE-FOR-BYTE —
    the cross-pipeline oracle pinned in tests."""
    zz_planes, qy, qc = _component_coefficients(width, height, rgb, quality)
    bh, bw = zz_planes[0].shape[:2]

    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_dqt(0, qy) + _jpeg_dqt(1, qc)
    out += _jpeg_seg(
        0xFFC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )

    def sos(comps: "list[tuple[int, int, int]]", ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for cid, dc_tid, ac_tid in comps:
            body += bytes([cid, (dc_tid << 4) | ac_tid])
        return _jpeg_seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first (Al=1), interleaved, Annex K DC tables
    out += _jpeg_dht(0, 0, _DC_LUM_SPEC) + _jpeg_dht(0, 1, _DC_CHROM_SPEC)
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    w = _BitWriter()
    dc_specs = [
        _canonical_codes(*_DC_LUM_SPEC),
        _canonical_codes(*_DC_CHROM_SPEC),
        _canonical_codes(*_DC_CHROM_SPEC),
    ]
    pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                v = int(zz_planes[ci][by, bx, 0]) >> 1  # arithmetic, Al=1
                diff = v - pred[ci]
                pred[ci] = v
                size, bitsval = _magnitude(diff)
                code, length = dc_specs[ci][size]
                w.write(code, length)
                if size:
                    w.write(bitsval, size)
    out += w.flush()

    # scan 2: DC refinement (Ah=1, Al=0), one raw bit per block/comp
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
    w = _BitWriter()
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                w.write(int(zz_planes[ci][by, bx, 0]) & 1, 1)
    out += w.flush()

    # AC scans: per component, two spectral bands, first then refine
    bands = [(1, 5), (6, 63)]
    for ah, al in ((0, 1), (1, 0)):
        for ci in range(3):
            for ss, se in bands:
                plane = zz_planes[ci]
                # dry pass: which AC symbols does this scan use?
                dry = _ProgressiveACWriter(None, None)
                for by in range(bh):
                    for bx in range(bw):
                        if ah == 0:
                            dry.ac_first_block(plane[by, bx], ss, se, al)
                        else:
                            dry.ac_refine_block(plane[by, bx], ss, se, al)
                dry.flush_eobrun()
                spec = _equal_length_spec(sorted(dry.used))
                out += _jpeg_dht(1, 0, spec)
                out += sos([(ci + 1, 0, 0)], ss, se, ah, al)
                w = _BitWriter()
                live = _ProgressiveACWriter(w, _canonical_codes(*spec))
                for by in range(bh):
                    for bx in range(bw):
                        if ah == 0:
                            live.ac_first_block(plane[by, bx], ss, se, al)
                        else:
                            live.ac_refine_block(plane[by, bx], ss, se, al)
                live.flush_eobrun()
                out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Bit-serial reader over entropy-coded data with byte unstuffing;
    RSTn markers surface as events so the MCU loop can reset."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by sync_restart
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
                else:  # EOI or next segment: feed zeros
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        # Truncate consumed high bits so acc stays a machine-word-sized
        # int (<= ~40 bits after _fill) instead of accreting every byte
        # ever read — unmasked, each bits() call costs O(bytes so far)
        # and a few-hundred-KB scan goes quadratic.
        self.acc &= (1 << self.n) - 1
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and byte-align."""
        self.n = 0
        self.acc = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG restart interval: RST marker not found")


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _entropy_end(payload: bytes, start: int) -> int:
    """Offset of the marker terminating an entropy-coded segment:
    stuffed 0x00, RSTn and fill bytes belong to the scan; anything
    else ends it."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            if nxt == 0xFF:  # fill byte
                i += 1
                continue
            return i
        i += 1
    return n


def decode_jpeg(payload: bytes) -> tuple[int, int, str, bytes]:
    """Parse a JFIF stream -> (w, h, 'RGB'|'L', pixels).

    Supports SOF0 baseline AND SOF2 progressive (r14, ITU T.81 §G —
    DC/AC first + refinement scans, spectral selection, successive
    approximation, EOB runs), 8-bit, 1 or 3 components, sampling
    factors 1 or 2 for baseline (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0; r14 —
    progressive still requires 1x1), optional restart intervals. A
    progressive
    stream ending early (fewer scans than the script implies) is
    reconstructed from what arrived — the progressive-preview
    contract. Everything else raises NotImplementedError naming the
    limitation."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    coefs = None  # progressive accumulator: [ci][by][bx] -> list[64]
    any_scan = False
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        length = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                vals = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                qt = np.zeros((8, 8), dtype=np.int32)
                qt[_ZROWS, _ZCOLS] = vals
                qtables[tid] = qt
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker in (0xFFC0, 0xFFC2):
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            sampling = []
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hs}x{vs} unsupported — "
                        "only 1/2 (4:4:4, 4:2:2, 4:4:0, 4:2:0); install PIL"
                    )
                if marker == 0xFFC2 and samp != 0x11:
                    raise NotImplementedError(
                        "progressive JPEG with chroma subsampling unsupported — "
                        "re-encode 4:4:4 or install PIL"
                    )
                comps.append((cid, qid))
                sampling.append((hs, vs))
            if nc == 1:
                sampling = [(1, 1)]  # a single component is never subsampled
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components unsupported")
            frame = (w_, h, comps, sampling)
            progressive = marker == 0xFFC2
            if progressive:
                bh, bw = -(-h // 8), -(-w_ // 8)
                coefs = [
                    [[[0] * 64 for _ in range(bw)] for _ in range(bh)]
                    for _ in range(nc)
                ]
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xFFDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFFDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tids >> 4, tids & 0x0F))
            scan_start = pos + 2 + length
            if not progressive:
                return _decode_scan(
                    payload, scan_start, frame, scan_comps, qtables, htables,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            _progressive_scan(
                payload, scan_start, frame, scan_comps, htables, coefs,
                ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
            )
            any_scan = True
            pos = _entropy_end(payload, scan_start)
            continue
        pos += 2 + length
    if progressive and any_scan:
        return _reconstruct_progressive(frame, coefs, qtables)
    raise ValueError("JPEG stream ended before SOS")


def _progressive_scan(
    payload, start, frame, scan_comps, htables, coefs, ss, se, ah, al,
    restart_interval,
):
    """Apply ONE progressive scan's coefficient deltas (T.81 §G.2):
    DC first/refine (possibly interleaved), AC first/refine (single
    component per spec, with EOB runs and refinement correction
    bits)."""
    w, h, comps, _sampling = frame
    cid_index = {cid: i for i, (cid, _qid) in enumerate(comps)}
    bh, bw = -(-h // 8), -(-w // 8)
    reader = _BitReader(payload, start)
    p1 = 1 << al
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG DC scan with Se != 0")
        pred = [0] * len(scan_comps)
        mcu = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    reader.sync_restart()
                    pred = [0] * len(scan_comps)
                for si, (cid, dc_tid, _ac) in enumerate(scan_comps):
                    block = coefs[cid_index[cid]][by][bx]
                    if ah == 0:
                        size = _huff_decode(reader, htables[(0, dc_tid)])
                        pred[si] += _extend(reader.bits(size), size)
                        block[0] = pred[si] << al
                    elif reader.bits(1):
                        block[0] |= p1
                mcu += 1
        return
    if len(scan_comps) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    cid, _dc_tid, ac_tid = scan_comps[0]
    table = htables[(1, ac_tid)]
    plane = coefs[cid_index[cid]]
    eobrun = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            mcu += 1
            block = plane[by][bx]
            if ah == 0:  # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(reader, table)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + (reader.bits(r) if r else 0)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past band end")
                    block[k] = _extend(reader.bits(s), s) << al
                    k += 1
                continue
            # AC refinement (the libjpeg-shaped traversal: corrections
            # are read at every already-nonzero position passed over)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(reader, table)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) + (reader.bits(r) if r else 0)
                            break
                        newval = 0  # ZRL: 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "JPEG AC refinement symbol with size != 1"
                            )
                        newval = p1 if reader.bits(1) else -p1
                    while k <= se:
                        if block[k] != 0:
                            if reader.bits(1) and (abs(block[k]) & p1) == 0:
                                block[k] += p1 if block[k] >= 0 else -p1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        block[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if block[k] != 0:
                        if reader.bits(1) and (abs(block[k]) & p1) == 0:
                            block[k] += p1 if block[k] >= 0 else -p1
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(frame, coefs, qtables):
    """All scans applied: dequantize + IDCT every block (vectorized
    einsum over the whole block grid) and color-convert."""
    w, h, comps, _sampling = frame
    nc = len(comps)
    bh, bw = -(-h // 8), -(-w // 8)
    planes = []
    for ci, (_cid, qid) in enumerate(comps):
        qt = qtables[qid]
        zz = np.array(coefs[ci], dtype=np.int64).reshape(bh, bw, 64)
        quant = (zz * qt[_ZROWS, _ZCOLS]).astype(np.float64)
        nat = np.zeros((bh, bw, 8, 8), dtype=np.float64)
        nat[:, :, _ZROWS, _ZCOLS] = quant
        blocks = np.einsum("ux,ijuv,vy->ijxy", _T, nat, _T) + 128.0
        planes.append(blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    if nc == 1:
        pix = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return w, h, "L", pix.tobytes()
    y, cb, cr = (p[:h, :w] for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    pix = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, "RGB", pix.tobytes()


def _decode_scan(payload, start, frame, scan_comps, qtables, htables, restart_interval):
    """Baseline interleaved scan: MCUs of h_i x v_i blocks per
    component (T.81 A.2.3), generalized for chroma subsampling (r14 —
    previously all factors had to be 1x1)."""
    w, h, comps, sampling = frame
    nc = len(comps)
    hmax = max(hs for hs, _vs in sampling)
    vmax = max(vs for _hs, vs in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component block planes sized to the full MCU grid
    planes = [
        np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for hs, vs in sampling
    ]
    qid_by_cid = dict(comps)
    ci_by_cid = {cid: i for i, (cid, _q) in enumerate(comps)}
    reader = _BitReader(payload, start)
    pred = [0] * nc
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * nc
            for cid, dc_tid, ac_tid in scan_comps:
                ci = ci_by_cid[cid]
                hs, vs = sampling[ci]
                dc_table = htables[(0, dc_tid)]
                ac_table = htables[(1, ac_tid)]
                qt = qtables[qid_by_cid[cid]]
                for v in range(vs):  # raster order within the MCU
                    for u in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, dc_table)
                        diff = _extend(reader.bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_table)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = rs >> 4, rs & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run past end of block")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZROWS, _ZCOLS] = zz * qt[_ZROWS, _ZCOLS]
                        block = _T.T @ coef @ _T + 128.0
                        by = (my * vs + v) * 8
                        bx = (mx * hs + u) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
            mcu += 1
    return _assemble_pixels(planes, w, h, nc, sampling, hmax, vmax)


def _assemble_pixels(planes, w, h, nc, sampling, hmax, vmax):
    """Upsample subsampled component planes to full resolution
    (nearest-neighbor replication — a spec-legal decoder choice, and
    the one the test expectations compute independently), crop, and
    color-convert."""
    full = []
    for ci, plane in enumerate(planes):
        hs, vs = sampling[ci]
        if (hs, vs) != (hmax, vmax):
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if nc == 1:
        pix = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, "L", pix.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    pix = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, "RGB", pix.tobytes()
