"""YUV4MPEG2 (.y4m) video parser for the multimodal frame-sampling path.

Y4M is the uncompressed interchange format the reference tooling world
(ffmpeg/mjpegtools) uses for raw video; it is fully parseable with the
stdlib: an ASCII stream header (``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<fmt>``),
then one ``FRAME`` line + planar YUV payload per frame.  Supported chroma
formats: C420 (and its jpeg/mpeg2/paldv tagged variants), C422, C444, and
Cmono.  Malformed headers, unknown chroma formats, and truncated frame
payloads raise ValueError -> the caller's quarantine path.

The luma (Y) plane is always the first w*h bytes of a frame, so per-frame
luma statistics need no chroma math; ``frame_mean_e6`` is the shared
integer-exact definition used by both the fixture builder (source planes)
and the decode stage (parsed planes).
"""

from __future__ import annotations

Y4M_SIG = b"YUV4MPEG2"

# chroma tag -> (chroma plane bytes) as a fraction of w*h, numerator/denominator
_CHROMA_FRACTION = {
    "420": (1, 2),  # two quarter-size planes
    "420jpeg": (1, 2),
    "420mpeg2": (1, 2),
    "420paldv": (1, 2),
    "422": (1, 1),  # two half-size planes
    "444": (2, 1),  # two full-size planes
    "mono": (0, 1),
}


def _parse_header(line: bytes) -> tuple[int, int, int, int, str]:
    """``YUV4MPEG2 ...`` stream header -> (w, h, fps_num, fps_den, chroma)."""
    parts = line.decode("ascii", errors="strict").split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps_num, fps_den = 0, 1
    chroma = "420jpeg"  # the format's documented default
    for p in parts[1:]:
        if not p:
            continue
        tag, val = p[0], p[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            chroma = val
        # I (interlacing), A (aspect), X (extensions) don't affect plane sizes
    if not w or not h or w < 1 or h < 1:
        raise ValueError("missing/implausible W/H in Y4M header")
    if chroma not in _CHROMA_FRACTION:
        raise ValueError(f"unsupported chroma format C{chroma}")
    if chroma != "mono" and (w % 2 or h % 2) and chroma.startswith("420"):
        raise ValueError("odd dimensions with 4:2:0 chroma")
    return w, h, fps_num, fps_den, chroma


def decode_y4m(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Y4M bytes -> (width, height, fps_num, fps_den, [luma planes]).

    Each returned plane is the w*h Y bytes of one frame (chroma is parsed
    for sizing/validation but not returned -- luma is what the feature
    stages consume).  Raises ValueError on malformed/truncated input."""
    if not data.startswith(Y4M_SIG):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    w, h, fps_num, fps_den, chroma = _parse_header(data[:nl])
    luma_size = w * h
    cnum, cden = _CHROMA_FRACTION[chroma]
    frame_size = luma_size + luma_size * cnum // cden
    planes: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME marker")
        pos = fnl + 1
        frame = data[pos : pos + frame_size]
        if len(frame) < frame_size:
            raise ValueError("truncated frame payload")
        planes.append(frame[:luma_size])
        pos += frame_size
    return w, h, fps_num, fps_den, planes


def frame_mean_e6(plane: bytes) -> int:
    """Integer-exact e6-scaled mean luma: (sum*1e6 + n/2) // n.  Shared by
    the fixture builder and the decode stage (see module docstring)."""
    n = len(plane)
    if n == 0:
        return 0
    s = sum(plane)
    return (s * 1_000_000 + n // 2) // n


def frame_mad_e6(a: bytes, b: bytes) -> int:
    """Integer-exact e6-scaled mean absolute luma difference between two
    frames — the standard cheap motion metric (scene-cut spikes, static
    segments near zero).  Same shared-definition parity contract as
    frame_mean_e6."""
    if len(a) != len(b) or not a:
        raise ValueError("frame size mismatch")
    s = sum(abs(x - y) for x, y in zip(a, b))
    n = len(a)
    return (s * 1_000_000 + n // 2) // n


def encode_y4m(
    width: int,
    height: int,
    luma_planes: list[bytes],
    *,
    fps: tuple[int, int] = (30, 1),
    chroma: str = "420jpeg",
) -> bytes:
    """Gray frames -> Y4M bytes (chroma planes filled with neutral 0x80).
    Exists so tests/fixtures can synthesize real streams without ffmpeg;
    also a legitimate raw-video sink for gray content."""
    cnum, cden = _CHROMA_FRACTION[chroma]
    chroma_fill = bytes([0x80]) * (width * height * cnum // cden)
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    out = bytearray(head.encode("ascii"))
    for plane in luma_planes:
        if len(plane) != width * height:
            raise ValueError("luma plane size mismatch")
        out += b"FRAME\n"
        out += plane
        out += chroma_fill
    return bytes(out)
