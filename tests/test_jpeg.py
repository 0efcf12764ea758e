"""Baseline JPEG codec tests: encoder and decoder are independent
implementations (separate entropy coding, table construction, and segment
assembly; shared math constants only), so round-trips are a genuine
two-implementation check — exact where quantization provably cannot move a
coefficient, PSNR-bounded on dense content."""

import numpy as np
import pytest

from changegen_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(11)


def _roundtrip(img: np.ndarray, **kw) -> np.ndarray:
    h, w = img.shape
    gw, gh, px = decode_jpeg(encode_jpeg(img.tobytes(), w, h, **kw))
    assert (gw, gh) == (w, h)
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_flat_blocks_exact():
    """Uniform image: every block is DC-only and the DC (8*(v-128)) is
    recovered exactly regardless of the quant step's rounding."""
    img = np.full((32, 40), 100, dtype=np.uint8)
    assert np.array_equal(_roundtrip(img), img)


def test_gradient_high_psnr():
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    out = _roundtrip(img)
    assert _psnr(out, img) > 45
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 4


def test_noise_bounded():
    img = RNG.integers(0, 256, size=(24, 24), dtype=np.uint8)
    assert _psnr(_roundtrip(img), img) > 25


def test_non_multiple_of_8_dimensions():
    img = RNG.integers(0, 256, size=(19, 21), dtype=np.uint8)
    out = _roundtrip(img)
    assert out.shape == (19, 21)


def test_restart_intervals():
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    plain = _roundtrip(img)
    rst = _roundtrip(img, restart_interval=2)
    # restart markers change framing, not reconstruction
    assert np.array_equal(plain, rst)


@pytest.mark.parametrize("sampling", [1, 2])
def test_color_scans_recover_luma(sampling):
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    cdim = (40 // sampling, 48 // sampling)
    out = _roundtrip(
        img,
        cb=np.full(cdim, 120, np.uint8).tobytes(),
        cr=np.full(cdim, 136, np.uint8).tobytes(),
        sampling=sampling,
    )
    assert _psnr(out, img) > 30


def test_malformed_inputs():
    img = np.full((16, 16), 77, dtype=np.uint8)
    good = encode_jpeg(img.tobytes(), 16, 16)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG" + good[4:])  # wrong magic
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated entropy data
    # progressive SOF2 is detected, not mis-decoded
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))
    # header-only stream: no SOS
    with pytest.raises(ValueError, match="SOS"):
        decode_jpeg(good[:sof])


def test_decode_images_dispatches_jpeg(spark):
    from changegen_spark.multimodal.assets import decode_images

    img = np.full((16, 16), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [(9, "image", encode_jpeg(img.tobytes(), 16, 16))],
        "asset_id long, kind string, payload binary",
    )
    r = decode_images(df).collect()[0]
    assert r["ok"] and (r["width"], r["height"]) == (16, 16)
    assert r["mean_px"] == 200.0  # flat block decodes exactly
