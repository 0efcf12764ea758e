"""Property-based codec tests (hypothesis): round-trips must hold for ANY
parameter combination, not just the fixture's — sizes, bit depths, channel
counts, palette sizes, chroma formats, filter types drawn at random."""

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from changegen_spark.multimodal.gif import decode_gif, encode_gif
from changegen_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
from changegen_spark.multimodal.png import decode_png, encode_png
from changegen_spark.multimodal.wav import decode_wav
from changegen_spark.multimodal.y4m import decode_y4m, encode_y4m

_SETTINGS = dict(max_examples=25, deadline=None)


@settings(**_SETTINGS)
@given(
    bits=st.sampled_from([8, 16, 24, 32]),
    channels=st.integers(1, 4),
    n=st.integers(0, 300),
    rate=st.sampled_from([8000, 22050, 48000]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_any_params(bits, channels, n, rate, seed):
    rng = np.random.default_rng(seed)
    if bits == 8:
        src = rng.integers(0, 256, size=(n, channels), dtype=np.int64)
        raw = src.astype(np.uint8).tobytes()
        norm = (src.astype(np.float64) - 128.0) / 128.0
    else:
        lo, hi = -(1 << (bits - 1)), 1 << (bits - 1)
        src = rng.integers(lo, hi, size=(n, channels), dtype=np.int64)
        if bits == 24:
            raw = b"".join(
                int(v & 0xFFFFFF).to_bytes(3, "little") for v in src.reshape(-1)
            )
        else:
            raw = src.astype(f"<i{bits // 8}").tobytes()
        norm = src.astype(np.float64) / float(1 << (bits - 1))
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    w.writeframes(raw)
    w.close()
    got_rate, got_ch, arr = decode_wav(buf.getvalue())
    assert (got_rate, got_ch) == (rate, channels)
    assert arr.shape == (n, channels)
    assert np.array_equal(arr, norm)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ncol=st.integers(2, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_any_params(w, h, ncol, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = [(i % 256, i % 256, i % 256) for i in range(ncol)]
    idx = bytes(rng.integers(0, ncol, size=w * h, dtype=np.uint8))
    gw, gh, gray = decode_gif(encode_gif(w, h, idx, pal, interlace=interlace))
    assert (gw, gh) == (w, h)
    assert gray == bytes(pal[v][0] for v in idx)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 16).map(lambda v: v * 2),  # even for 4:2:0
    h=st.integers(1, 16).map(lambda v: v * 2),
    nf=st.integers(0, 5),
    chroma=st.sampled_from(["420jpeg", "422", "444", "mono"]),
    seed=st.integers(0, 2**31),
)
def test_y4m_roundtrip_any_params(w, h, nf, chroma, seed):
    rng = np.random.default_rng(seed)
    planes = [
        bytes(rng.integers(0, 256, size=w * h, dtype=np.uint8)) for _ in range(nf)
    ]
    W, H, _fn, _fd, got = decode_y4m(encode_y4m(w, h, planes, chroma=chroma))
    assert (W, H) == (w, h)
    assert got == planes


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    filt=st.integers(0, 4),
    ctype=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_any_params(w, h, filt, ctype, seed):
    rng = np.random.default_rng(seed)
    gray = bytes(rng.integers(0, 256, size=w * h, dtype=np.uint8))
    gw, gh, px = decode_png(encode_png(w, h, gray, filter_type=filt, color_type=ctype))
    assert (gw, gh, px) == (w, h, gray)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    v=st.integers(0, 255),
    rst=st.sampled_from([0, 1, 3]),
)
def test_jpeg_flat_exact_any_params(w, h, v, rst):
    """Uniform images round-trip EXACTLY at any size/value: every block is
    DC-only and the DC quant step (8) divides 8*(v-128)."""
    img = np.full((h, w), v, dtype=np.uint8)
    gw, gh, px = decode_jpeg(
        encode_jpeg(img.tobytes(), w, h, restart_interval=rst)
    )
    assert (gw, gh) == (w, h)
    assert np.array_equal(np.frombuffer(px, dtype=np.uint8).reshape(h, w), img)


@settings(max_examples=10, deadline=None)
@given(h=st.integers(8, 40), w=st.integers(8, 40), seed=st.integers(0, 2**31))
def test_jpeg_psnr_floor_any_size(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    _, _, px = decode_jpeg(encode_jpeg(img.tobytes(), w, h))
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(float)
    mse = np.mean((got - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 20