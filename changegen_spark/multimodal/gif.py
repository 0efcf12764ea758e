"""Pure-Python GIF87a/89a decoder for the multimodal decode path.

The second real image codec next to PNG (multimodal/png.py): header +
logical screen descriptor, global/local color tables, extension blocks
(skipped), interlaced row ordering, and a from-scratch LZW decompressor
with variable code width, clear/EOI codes, and the deferred-clear growth
rule.  Decodes the FIRST image frame (the still-image contract; animation
frames after the first are ignored).  Malformed or truncated streams raise
ValueError -> the caller's quarantine path.

Output is 8-bit grayscale via the same integer luma as the PNG path
((77R+150G+29B)>>8), so palettes with r==g==b decode to exactly that value.

The encoder exists so tests can synthesize real GIFs without PIL; it emits
spec-compliant variable-width LZW (with code-table growth and clear-on-full)
through an INDEPENDENT code path from the decoder -- decode(encode(px))
round-trips are a genuine two-implementation check.
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-flavored LZW: variable width starting at min_code_size+1 (LSB-first
    bit packing), clear code resets the table, width grows after the table
    fills 2^width (capped at 12 bits -- further codes reuse width 12 until a
    clear)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, None

    table, width, prev = reset()
    next_code = eoi + 1
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table, width, prev = reset()
                next_code = eoi + 1
                continue
            if code == eoi:
                if len(out) < n_pixels:
                    raise ValueError("LZW ended before all pixels decoded")
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("first LZW code not a literal")
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                if next_code < 4096:
                    table[next_code] = entry
                    next_code += 1
            else:
                raise ValueError("LZW code out of range (corrupt stream)")
            out += entry
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    raise ValueError("LZW stream exhausted before EOI/pixel count")


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos -> (payload, new pos)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        block = data[pos : pos + n]
        if len(block) < n:
            raise ValueError("truncated sub-block payload")
        out += block
        pos += n


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """GIF bytes -> (width, height, 8-bit grayscale pixels, row-major) for
    the first image frame.  Raises ValueError on malformed input."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    packed = data[10]
    global_table: bytes | None = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = data[pos : pos + 3 * n]
        if len(global_table) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block introducer 0x{b:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _left, _top, width, height, ipacked = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = data[pos : pos + 3 * n]
            if len(table) < 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("image has no color table")
        if width == 0 or height == 0 or width * height > 64 * 1024 * 1024:
            raise ValueError("implausible dimensions")
        if pos >= len(data):
            raise ValueError("truncated before LZW minimum code size")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW minimum code size {min_code_size}")
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code_size, lzw, width * height)
        if len(idx) < width * height:
            raise ValueError("decoded pixel count short")
        idx = idx[: width * height]
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            deinterlaced = bytearray(width * height)
            src_row = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    deinterlaced[y * width : (y + 1) * width] = idx[
                        src_row * width : (src_row + 1) * width
                    ]
                    src_row += 1
            idx = deinterlaced
        n_colors = len(table) // 3
        lut = bytes(
            (77 * table[3 * i] + 150 * table[3 * i + 1] + 29 * table[3 * i + 2])
            >> 8
            for i in range(n_colors)
        )
        try:
            return width, height, bytes(lut[v] for v in idx)
        except IndexError:
            raise ValueError("pixel index outside color table") from None
    raise ValueError("no image descriptor before trailer")


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    """Spec-compliant variable-width LZW encoder (independent of the
    decoder): dict-based longest-match, emits clear when the table hits
    4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for p in pixels:
        cand = run + bytes([p])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # GIF width growth: a code's width is the width in effect when
            # the DECODER will have that many entries
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([p])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
    *,
    interlace: bool = False,
) -> bytes:
    """Index pixels + palette -> GIF89a bytes.  Palette is padded to the
    next power of two (>= 4 entries, so min LZW code size >= 2)."""
    if len(indices) != width * height:
        raise ValueError("pixel buffer size mismatch")
    n = 4
    while n < len(palette):
        n *= 2
    if n > 256:
        raise ValueError("palette too large")
    depth = n.bit_length() - 1
    table = bytearray()
    for r, g, b in palette:
        table += bytes((r, g, b))
    table += bytes(3 * (n - len(palette)))
    if interlace:
        reordered = bytearray()
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                reordered += indices[y * width : (y + 1) * width]
        indices = bytes(reordered)
    min_code_size = max(2, depth)
    lzw = _lzw_encode(min_code_size, indices)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += table
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
