"""Pure-Python GIF codec (r14, VERDICT r13 ask #7 — the next codec
tier where PIL is absent): LZW pixel decode for GIF87a/GIF89a and a
deterministic single-frame encoder for fuzz roundtrips, stdlib+numpy
only, following the PNG (multimodal.py) / JPEG (jpeg_codec.py)
codec-verification pattern.

Scope, honestly stated:
- **Decode**: first image frame of an 87a/89a stream — logical screen
  descriptor, global AND local color tables, every extension block
  skipped by its own length framing (graphic control / comment /
  application, including NETSCAPE loops), 4-pass interlace
  deinterlacing, and the full GIF-variant LZW: variable code width
  from ``min_code_size+1`` to 12 bits LSB-first, clear / end-of-
  information codes, table rebuild on clear, and the DEFERRED-clear
  case (a full 4096-entry table with no clear emitted keeps decoding
  at 12 bits — mandated by the spec's errata and produced by real
  encoders). Output is palette-mapped 8-bit RGB.
- **Encode**: one frame, global color table, real LZW compression
  (code-width growth, clear emitted when the table fills), optional
  interlace. Transparency/animation are read-side skips, not write
  surface.
- The LZW symbol loop is per-code Python by nature (each output
  string depends on the table state the previous code created — the
  same inherent sequential dependency as PNG's Paeth filter); the
  palette→RGB expansion is a vectorized numpy fancy-index, and at the
  query altitude everything runs Arrow-batched inside mapInPandas,
  embarrassingly parallel across documents.

Reference parity: none — the reference pipeline has no media surface
(its payload handling is the opaque pandas round-trip at
order_currency_conversion_dag.py:95-103); codec verification is
north-star EXT surface like the PNG/JPEG tiers.
"""

from __future__ import annotations

import struct

_GIF_SIGS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, dynamic code width 3..12)
# --------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected_pixels: int) -> bytearray:
    """GIF LZW -> index stream. Raises on codes past the table edge
    (corrupt stream) and on pixel under/overrun vs the image
    descriptor's area — truncation must be loud, not padded."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table as immutable byte strings; entries 0..clear-1 are literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: "bytes | None" = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream ended without end-of-information")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << 12):  # full table = deferred clear:
                table.append(prev + entry[:1])  # stop adding, keep reading
        elif code == len(table) and len(table) < (1 << 12):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table size {len(table)}")
        out.extend(entry)
        if len(out) > expected_pixels:
            raise ValueError(
                f"GIF LZW produced {len(out)}+ pixels, image area is "
                f"{expected_pixels}"
            )
        prev = entry
        # width grows when the NEXT code could not be represented;
        # at 4096 the table stops growing (deferred clear) and the
        # width stays 12 until a clear code arrives
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) != expected_pixels:
        raise ValueError(
            f"GIF LZW produced {len(out)} pixels, image area is {expected_pixels}"
        )
    return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Index stream -> GIF LZW bytes (clear emitted up front and on
    table overflow — the classic encoder; decoders must also survive
    streams that DON'T clear, covered by the deferred-clear decode
    test)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: "dict[bytes, int]" = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emissions = 0  # data codes since the last clear
    emit(clear, width)

    def emit_data(code: int) -> None:
        # The DECODER appends one table entry per data code it reads
        # (from the second one after a clear) and widens when its
        # table size hits 2^width — for emission m its size is
        # clear + 1 + m, capped at 4096 once full. The width bump must
        # therefore follow EVERY data emission, including the final
        # run and the one right before a clear, where this encoder
        # adds nothing itself (the classic LZW off-by-one).
        nonlocal emissions, width
        emit(code, width)
        emissions += 1
        dec_size = min(clear + 1 + emissions, 1 << 12)
        if dec_size == (1 << width) and width < 12:
            width += 1

    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit_data(table[run])
        if next_code == (1 << 12):
            # table full: clear instead of assigning an
            # unrepresentable code (12 bits cap at 4095)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
            emissions = 0
        else:
            table[cand] = next_code
            next_code += 1
        run = bytes([b])
    if run:
        emit_data(table[run])
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Container
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: "list[bytes]", height: int) -> "list[bytes]":
    ordered: "list[bytes | None]" = [None] * height
    it = iter(rows)
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            ordered[y] = next(it)
    return ordered  # type: ignore[return-value]


def _interlace_order(height: int) -> "list[int]":
    return [
        y for start, step in _INTERLACE_PASSES for y in range(start, height, step)
    ]


def decode_gif(payload: bytes) -> "tuple[int, int, str, bytes]":
    """First frame of a GIF -> (width, height, 'RGB', pixels). Width/
    height are the FRAME's (image descriptor), matching what
    :func:`multimodal.gif_dims`'s logical screen reports for the
    synthesized single-frame fixtures; palette indices are mapped
    through the local color table when present, else the global one."""
    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image frame")
        if block == 0x21:  # extension: label + length-framed sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _left, _top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = payload[pos : pos + 3 * n]
            if len(table) != 3 * n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has neither local nor global color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF before LZW minimum code size")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"GIF LZW minimum code size {min_code_size} out of range")
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(payload[pos : pos + sz])
            if len(chunks[-1]) != sz:
                raise ValueError("truncated GIF data sub-block")
            pos += sz
        idx = _lzw_decode(min_code_size, b"".join(chunks), w * h)
        if iflags & 0x40:  # interlaced: reorder rows
            rows = [bytes(idx[y * w : (y + 1) * w]) for y in range(h)]
            idx = bytearray(b"".join(_deinterlace(rows, h)))
        arr = np.frombuffer(bytes(idx), dtype=np.uint8)
        if arr.size and int(arr.max()) * 3 + 3 > len(table):
            raise ValueError("GIF pixel index beyond color table")
        pal = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
        rgb = pal[arr]  # vectorized palette map
        return int(w), int(h), "RGB", rgb.tobytes()
    raise ValueError("GIF ended without trailer or image")


def gif_frames(payload: bytes) -> "list[dict]":
    """Animation enumeration, HEADER tier: walk every frame's graphic
    control extension + image descriptor and SEEK over the LZW data by
    its own sub-block length framing — O(frames + data/255 block
    headers), no LZW decode, no palette map. Per frame: left/top/
    width/height, interlace flag, local-palette size (0 = uses
    global), delay in centiseconds, disposal method and transparency
    index (None when unset) from the preceding GCE, if any. The
    companion :func:`decode_gif` decodes the FIRST frame; full
    animation compositing (disposal restore, partial-frame overlay) is
    out of scope — enumeration is what corpus triage needs."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    flags = payload[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    frames: "list[dict]" = []
    gce: "dict | None" = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            return frames
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control: fixed 4-byte body
                if pos + 6 > len(payload) or payload[pos] != 4:
                    raise ValueError("malformed GIF graphic control extension")
                gflags = payload[pos + 1]
                delay = payload[pos + 2] | (payload[pos + 3] << 8)
                tindex = payload[pos + 4] if gflags & 0x01 else None
                gce = {
                    "delay_cs": delay,
                    "disposal": (gflags >> 2) & 0x07,
                    "transparent_index": tindex,
                }
                pos += 5
                if payload[pos] != 0:
                    raise ValueError("unterminated GIF graphic control extension")
                pos += 1
            else:  # comment/application/plain-text: skip sub-blocks
                while True:
                    if pos >= len(payload):
                        raise ValueError("truncated GIF extension")
                    sz = payload[pos]
                    pos += 1
                    if sz == 0:
                        break
                    pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        local_colors = (2 << (iflags & 0x07)) if iflags & 0x80 else 0
        pos += 3 * local_colors
        pos += 1  # LZW minimum code size
        while True:  # seek over data sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            pos += sz
        frames.append(
            {
                "left": left,
                "top": top,
                "width": w,
                "height": h,
                "interlaced": bool(iflags & 0x40),
                "local_colors": local_colors,
                "delay_cs": gce["delay_cs"] if gce else 0,
                "disposal": gce["disposal"] if gce else 0,
                "transparent_index": gce["transparent_index"] if gce else None,
            }
        )
        gce = None
    raise ValueError("GIF ended without trailer")


def encode_gif_animation(
    frames: "list[tuple[int, int, bytes]]",
    palette: bytes,
    delays_cs: "list[int] | None" = None,
    loop: bool = True,
) -> bytes:
    """Multi-frame GIF89a writer for the enumeration roundtrips: each
    frame is (width, height, indices) rendered full-canvas at (0, 0)
    against one global palette, with a graphic control extension per
    frame carrying its delay. The canvas is the largest frame."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    if delays_cs is not None and len(delays_cs) != len(frames):
        raise ValueError("one delay per frame")
    n_colors = len(palette) // 3
    if len(palette) % 3 or not 0 < n_colors <= 256:
        raise ValueError("palette must be 1..256 packed RGB triples")
    size_exp = max(1, (n_colors - 1).bit_length())
    table = palette + b"\x00" * (3 * ((1 << size_exp) - n_colors))
    cw = max(w for w, _h, _i in frames)
    chh = max(h for _w, h, _i in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", cw, chh)
    out.append(0x80 | (size_exp - 1))
    out += b"\x00\x00"
    out += table
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code_size = max(2, size_exp)
    for i, (w, h, idx) in enumerate(frames):
        if len(idx) != w * h:
            raise ValueError(f"frame {i}: indices length {len(idx)} != {w}x{h}")
        if idx and max(idx) >= n_colors:
            raise ValueError(f"frame {i}: pixel index beyond palette")
        delay = delays_cs[i] if delays_cs else 0
        out += bytes([0x21, 0xF9, 4, 0x00, delay & 0xFF, (delay >> 8) & 0xFF, 0, 0])
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x00)
        out.append(min_code_size)
        lzw = _lzw_encode(min_code_size, idx)
        for j in range(0, len(lzw), 255):
            chunk = lzw[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlace: bool = False,
    loop_extension: bool = False,
) -> bytes:
    """Single-frame GIF89a writer: ``indices`` are palette positions
    (one byte per pixel, row-major), ``palette`` is packed RGB triples
    (length padded to the next power-of-two entry count as the format
    requires). ``loop_extension`` prepends a NETSCAPE application
    extension so decode-side extension skipping is exercised by
    roundtrips."""
    if len(indices) != width * height:
        raise ValueError(f"indices length {len(indices)} != {width}x{height}")
    if len(palette) % 3 or not palette:
        raise ValueError("palette must be non-empty packed RGB triples")
    n_colors = len(palette) // 3
    if n_colors > 256:
        raise ValueError("GIF palettes cap at 256 colors")
    if indices and max(indices) >= n_colors:
        raise ValueError("pixel index beyond palette")
    size_exp = max(1, (n_colors - 1).bit_length())  # table size 2^(exp)
    table = palette + b"\x00" * (3 * ((1 << size_exp) - n_colors))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (size_exp - 1))  # GCT present, size field
    out += b"\x00\x00"  # background index, aspect
    out += table
    if loop_extension:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x40 if interlace else 0x00)
    if interlace:
        rows = [indices[y * width : (y + 1) * width] for y in range(height)]
        indices = b"".join(rows[y] for y in _interlace_order(height))
    min_code_size = max(2, size_exp)
    out.append(min_code_size)
    lzw = _lzw_encode(min_code_size, indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
