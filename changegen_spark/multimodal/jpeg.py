"""Pure-Python baseline JPEG decoder (numpy for the IDCT only).

The third real image codec (after png.py / gif.py): marker parse, DQT/DHT
table handling, baseline sequential SOF0 scans — grayscale and YCbCr with
4:4:4 or 4:2:0 sampling — canonical Huffman entropy decode with byte
unstuffing and DRI/RSTn restart handling, dequantization, de-zigzag, and a
matrix-form 8x8 IDCT.  Progressive (SOF2), arithmetic coding, 12-bit
precision, and hierarchical modes raise ValueError -> the caller's
quarantine path.

Output is the LUMA plane (JPEG's Y component IS the integer luma the other
decoders emit), cropped to the declared dimensions — chroma components are
entropy-decoded to keep the bitstream in sync but only Y is reconstructed.

JPEG is lossy, so unlike PNG/GIF/WAV the fixture oracle cannot compare
against pre-encoding source arrays; correctness evidence is the
two-implementation round-trip in tests/test_jpeg.py (an INDEPENDENT
encoder, exact for constant blocks, PSNR-bounded for dense content) and
the decode-determinism pin in the media fixture.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

ZIGZAG = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = A.T @ F @ A
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def idct2(coeffs: np.ndarray) -> np.ndarray:
    """8x8 DCT-III (inverse of the JPEG FDCT), float64."""
    return _A.T @ coeffs @ _A


class _Huff:
    """Canonical Huffman decoder from a DHT (bits, values) spec."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00 and
    surfaces RSTn markers to the MCU loop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy data exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit restart marker mid-symbol")
            else:
                # EOI or another marker: decoder ran past the scan
                raise ValueError("marker inside entropy data (truncated scan?)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self, n: int):
        """Byte-align, consume the expected RSTn marker, reset bit state."""
        self.nbits = 0
        d = self.data
        if self.pos + 2 > len(d) or d[self.pos] != 0xFF or d[self.pos + 1] != 0xD0 + n:
            raise ValueError("missing/incorrect restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """JPEG F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """JPEG bytes -> (width, height, 8-bit luma pixels, row-major).

    Raises ValueError on malformed/truncated/unsupported input."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    restart_interval = 0
    frame = None  # (w, h, components)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(body[p : p + 128], dtype=">u2").astype(
                        np.int32
                    )
                    p += 128
                if tbl.size != 64:
                    raise ValueError("truncated DQT table")
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = body[p + 17 : p + 17 + n]
                if len(bits) != 16 or len(values) != n:
                    raise ValueError("truncated DHT table")
                huff[(cls, tid)] = _Huff(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported sample precision {precision}")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode (progressive/arith/hier)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            w, h, comps = frame
            if w == 0 or h == 0 or w * h > 64 * 1024 * 1024:
                raise ValueError("implausible dimensions")
            ns = body[0]
            scan_tables = {}
            for i in range(ns):
                cid, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            if ns != len(comps):
                raise ValueError("non-interleaved scans unsupported")
            return _decode_scan(
                data, pos + seglen, w, h, comps, scan_tables, qt, huff,
                restart_interval,
            )
        # APPn/COM/others: skipped
        pos += seglen
    raise ValueError("no SOS marker (no image data)")


def _decode_scan(data, pos, w, h, comps, scan_tables, qt, huff, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("unsupported sampling factors (1 or 2 only)")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # only Y (first component) is reconstructed; others entropy-advance
    y_cid, y_h, y_v, y_tq = comps[0]
    if y_tq not in qt:
        raise ValueError("missing quant table for luma")
    yq = qt[y_tq]
    plane = np.zeros((mcus_y * y_v * 8, mcus_x * y_h * 8), dtype=np.float64)
    reader = _BitReader(data, pos)
    dc_pred = {c[0]: 0 for c in comps}
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart(rst_n)
                rst_n = (rst_n + 1) & 7
                dc_pred = {c[0]: 0 for c in comps}
            mcu_count += 1
            for cid, ch, cv, tq in comps:
                td, ta = scan_tables[cid]
                dct = huff.get((0, td))
                act = huff.get((1, ta))
                if dct is None or act is None:
                    raise ValueError("missing Huffman table for scan")
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.huff(dct)
                        if t > 11:
                            raise ValueError("bad DC magnitude category")
                        diff = _extend(reader.bits(t), t)
                        dc_pred[cid] += diff
                        zz[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        if cid != y_cid:
                            continue  # chroma: bitstream advanced, skip IDCT
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * yq
                        px = idct2(block.reshape(8, 8)) + 128.0
                        py0 = (my * y_v + by) * 8
                        px0 = (mx * y_h + bx) * 8
                        plane[py0 : py0 + 8, px0 : px0 + 8] = px
    out = np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, out.tobytes()


# --- independent encoder (tests/fixtures) -----------------------------------
# Shares only the math definitions (basis matrix, zigzag) with the decoder;
# entropy coding, table construction, and segment assembly are separate
# code.  Emits FLAT canonical Huffman tables (every symbol at one length L
# with n_symbols < 2^L, so the reserved all-ones code stays unused) — legal
# DHT content that also exercises the decoder's table parser on
# non-Annex-K tables.

QUANT_DEFAULT = np.array(
    [8, 6, 6, 7, 6, 5, 8, 7, 7, 7, 9, 9, 8, 10, 12, 20, 13, 12, 11, 11, 12,
     25, 18, 19, 15, 20, 29, 26, 31, 30, 29, 26, 28, 28, 32, 36, 46, 39, 32,
     34, 44, 35, 28, 28, 40, 55, 41, 44, 48, 49, 52, 52, 52, 31, 39, 57, 61,
     56, 50, 60, 46, 51, 52, 50],
    dtype=np.int32,
)  # libjpeg quality-90 luma table (public spec scaling of Annex K)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s


def _flat_table(symbols: list[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """All-one-length canonical table over the symbols actually used."""
    syms = sorted(set(symbols))
    length = max(2, len(syms).bit_length())  # n < 2^L keeps all-ones unused
    if len(syms) >= (1 << length):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    first = 0
    for lo in range(1, length):
        first = (first + bits[lo - 1]) << 1
    codes = {s: (length, first + i) for i, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _category(v: int) -> int:
    return abs(v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _block_symbols(zz: np.ndarray, dc_pred: int) -> tuple[list, list, int]:
    """Quantized zigzag coefficients -> (dc syms, ac syms) as
    (symbol, value_bits, n_bits) triples lists."""
    diff = int(zz[0]) - dc_pred
    t = _category(diff)
    dc = [(t, _mag_bits(diff, t), t)]
    ac = []
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))
            run -= 16
        s = _category(v)
        ac.append(((run << 4) | s, _mag_bits(v, s), s))
        run = 0
    if last < 63:
        ac.append((0x00, 0, 0))  # EOB
    return dc, ac, int(zz[0])


def _quant_blocks(plane: np.ndarray, q: np.ndarray) -> tuple[int, int, list]:
    """Pad to 8-multiples (edge replication), FDCT+quantize every block."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane.astype(np.float64) - 128.0, ((0, ph), (0, pw)), mode="edge")
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = []
    for by in range(bh):
        row = []
        for bx in range(bw):
            f = _A @ padded[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] @ _A.T
            zz = np.round(f.reshape(64)[ZIGZAG] / q).astype(np.int32)
            row.append(zz)
        blocks.append(row)
    return bh, bw, blocks


def encode_jpeg(
    y: bytes,
    width: int,
    height: int,
    *,
    cb: bytes | None = None,
    cr: bytes | None = None,
    sampling: int = 1,
    quant: np.ndarray = QUANT_DEFAULT,
    restart_interval: int = 0,
) -> bytes:
    """Planes -> baseline JFIF bytes.  Grayscale when ``cb`` is None; color
    interleaves Y/Cb/Cr with 4:4:4 (sampling=1) or 4:2:0 (sampling=2 —
    chroma planes supplied at half resolution)."""
    yp = np.frombuffer(y, dtype=np.uint8).reshape(height, width)
    color = cb is not None
    cw, ch_ = (width + sampling - 1) // sampling, (height + sampling - 1) // sampling
    planes = [(1, yp, sampling)]
    if color:
        planes.append((2, np.frombuffer(cb, dtype=np.uint8).reshape(ch_, cw), 1))
        planes.append((3, np.frombuffer(cr, dtype=np.uint8).reshape(ch_, cw), 1))

    # FDCT+quant everything first so Huffman tables can cover actual symbols
    qb = {cid: _quant_blocks(p, quant) for cid, p, _s in planes}
    # MCU-ordered symbol stream
    mcus_x = (width + 8 * sampling - 1) // (8 * sampling)
    mcus_y = (height + 8 * sampling - 1) // (8 * sampling)
    stream = []  # per MCU: list of (cid, dc_triples, ac_triples)
    dc_pred = {cid: 0 for cid, _p, _s in planes}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                stream.append(("RST",))
                dc_pred = {cid: 0 for cid, _p, _s in planes}
            mcu_count += 1
            for cid, _p, s in planes:
                bh, bw, blocks = qb[cid]
                for by in range(s):
                    for bx in range(s):
                        gy, gx = my * s + by, mx * s + bx
                        if gy >= bh or gx >= bw:
                            zz = np.zeros(64, dtype=np.int32)
                            zz[0] = dc_pred[cid]  # repeat-edge DC, zero AC
                        else:
                            zz = blocks[gy][gx]
                        dc, ac, dcval = _block_symbols(zz, dc_pred[cid])
                        dc_pred[cid] = dcval
                        stream.append((cid, dc, ac))

    dc_syms = [t[0] for e in stream if e[0] != "RST" for t in e[1]]
    ac_syms = [t[0] for e in stream if e[0] != "RST" for t in e[2]]
    dc_bits, dc_vals, dc_codes = _flat_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _flat_table(ac_syms)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    dq = bytes([0]) + bytes(int(v) for v in quant)
    out += seg(0xDB, dq)
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    sof += bytes([1, (sampling << 4) | sampling, 0])
    if color:
        sof += bytes([2, 0x11, 0, 3, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid, _p, _s in planes:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw_ = _BitWriter()
    rst = 0
    for e in stream:
        if e[0] == "RST":
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            continue
        _cid, dc, ac = e
        for sym, vb, nb in dc:
            ln, code = dc_codes[sym]
            bw_.write(code, ln)
            if nb:
                bw_.write(vb, nb)
        for sym, vb, nb in ac:
            ln, code = ac_codes[sym]
            bw_.write(code, ln)
            if nb:
                bw_.write(vb, nb)
    bw_.flush()
    out += bw_.out
    out += bytes([0xFF, 0xD9])
    return bytes(out)
