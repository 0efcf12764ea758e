"""Real-media codec tests: WAV (RIFF PCM/float), Y4M raw video, GIF (LZW).

Round-trips go through INDEPENDENT encoder paths (stdlib ``wave`` for PCM
WAV; the from-scratch LZW encoder vs decoder in gif.py; encode_y4m vs the
parser), so decode(encode(x)) == x is a genuine two-implementation check.
The committed fixture (tools/make_media.py) is verified payload-by-payload
against its expected columns — the same data the q_media_* oracles use.
"""

import io
import struct
import wave

import numpy as np
import pytest

from changegen_spark.multimodal.gif import decode_gif, encode_gif
from changegen_spark.multimodal.wav import (
    audio_features,
    decode_wav,
    spectral_features,
)
from changegen_spark.multimodal.y4m import (
    decode_y4m,
    encode_y4m,
    frame_mad_e6,
    frame_mean_e6,
)

RNG = np.random.default_rng(7)


def _pcm_wav(bits: int, channels: int, rate: int, n: int):
    """stdlib-wave encoded bytes + the normalized source array."""
    if bits == 8:
        src = RNG.integers(0, 256, size=(n, channels), dtype=np.int64)
        raw = src.astype(np.uint8).tobytes()
        norm = (src.astype(np.float64) - 128.0) / 128.0
    else:
        lo, hi = -(1 << (bits - 1)), 1 << (bits - 1)
        src = RNG.integers(lo, hi, size=(n, channels), dtype=np.int64)
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
    return buf.getvalue(), norm


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_pcm_roundtrip(bits, channels):
    data, norm = _pcm_wav(bits, channels, 16000, 800)
    rate, nch, arr = decode_wav(data)
    assert (rate, nch) == (16000, channels)
    assert np.array_equal(arr, norm)  # PCM is lossless: bit-exact


def test_wav_float32():
    f = RNG.uniform(-1, 1, size=(300, 2)).astype("<f4")
    data = f.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 2, 44100, 44100 * 8, 8, 32)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, nch, arr = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, nch) == (44100, 2)
    assert np.array_equal(arr, f.astype(np.float64))


def test_wav_quarantine_paths():
    good, _ = _pcm_wav(16, 1, 8000, 100)
    for bad in (
        b"RIFX" + good[4:],          # wrong container magic
        good[:40],                   # truncated data chunk
        good[:12],                   # no chunks at all
    ):
        with pytest.raises(ValueError):
            decode_wav(bad)
    # unsupported codec id (ADPCM=2) in an otherwise valid header
    adpcm = bytearray(good)
    adpcm[20] = 2
    with pytest.raises(ValueError, match="unsupported format"):
        decode_wav(bytes(adpcm))


def test_audio_features_shared_definition():
    data, norm = _pcm_wav(16, 2, 16000, 1000)
    rate, _, arr = decode_wav(data)
    # decoder output and pre-encoding source give identical features —
    # the factoring the q_media_audio_features oracle relies on
    assert audio_features(rate, arr) == audio_features(16000, norm)
    f = audio_features(16000, norm)
    assert f["n_frames"] == 1000 and f["duration_e6"] == 62500


@pytest.mark.parametrize("chroma", ["420jpeg", "420", "422", "444", "mono"])
def test_y4m_roundtrip(chroma):
    w, h = 16, 12
    planes = [
        bytes(RNG.integers(0, 256, size=w * h, dtype=np.uint8)) for _ in range(4)
    ]
    W, H, fn, fd, got = decode_y4m(encode_y4m(w, h, planes, fps=(25, 1), chroma=chroma))
    assert (W, H, fn, fd) == (w, h, 25, 1)
    assert got == planes


def test_y4m_malformed():
    good = encode_y4m(8, 8, [bytes(64)])
    with pytest.raises(ValueError):
        decode_y4m(good[:-10])  # truncated frame payload
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W16 F30:1\n")  # missing H
    with pytest.raises(ValueError, match="chroma"):
        decode_y4m(b"YUV4MPEG2 W8 H8 C410\nFRAME\n" + bytes(96))
    with pytest.raises(ValueError):
        decode_y4m(good.replace(b"FRAME", b"FRAMX"))


@pytest.mark.parametrize(
    "size,ncol,interlace",
    [((16, 16), 4, False), ((64, 48), 64, False), ((100, 80), 250, True),
     ((200, 200), 256, False)],  # 40k px forces width growth + table clears
)
def test_gif_roundtrip(size, ncol, interlace):
    w, h = size
    pal = [(i % 256, i % 256, i % 256) for i in range(ncol)]
    idx = bytes(RNG.integers(0, ncol, size=w * h, dtype=np.uint8))
    gw, gh, gray = decode_gif(encode_gif(w, h, idx, pal, interlace=interlace))
    # gray palette (r==g==b==v): integer luma returns v exactly
    assert (gw, gh) == (w, h)
    assert gray == bytes(pal[v][0] for v in idx)


def test_gif_nongray_palette_luma():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    idx = bytes([0, 1, 2, 3])
    _, _, gray = decode_gif(encode_gif(2, 2, idx, pal))
    assert gray == bytes(
        [(77 * 255) >> 8, (150 * 255) >> 8, (29 * 255) >> 8, (256 * 255) >> 8]
    )


def test_gif_malformed():
    pal = [(i, i, i) for i in range(4)]
    good = encode_gif(8, 8, bytes(RNG.integers(0, 4, size=64, dtype=np.uint8)), pal)
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[:-6])  # truncated sub-block chain
    # inflate the declared height (descriptor at 6+7+12: 0x2C l t w h):
    # LZW then exhausts before producing the claimed pixel count
    corrupt = bytearray(good)
    struct.pack_into("<H", corrupt, 25 + 7, 200)
    with pytest.raises(ValueError):
        decode_gif(bytes(corrupt))


def test_fixture_matches_expected_columns():
    """The committed media fixture decodes to exactly its expected columns
    (pure-pandas twin of the q_media_* oracle comparison)."""
    import pyarrow.parquet as pq

    from changegen_spark.multimodal.assets import _parse_image
    from changegen_spark.queries.media import ASSETS_PATH, FRAMES_PATH

    t = pq.read_table(ASSETS_PATH).to_pylist()
    frows = pq.read_table(FRAMES_PATH).to_pylist()
    frames = {(r["asset_id"], r["frame_idx"]): r["exp_mean_e6"] for r in frows}
    mads = {(r["asset_id"], r["frame_idx"]): r["exp_mad_e6"] for r in frows}
    assert len(t) >= 30 and frames
    for r in t:
        payload = r["payload"]
        if r["kind"] == "image":
            w, h, px = _parse_image(payload)
            n = len(px)
            assert (w, h) == (r["exp_width"], r["exp_height"]), r["fmt"]
            assert (sum(px) * 1_000_000 + n // 2) // n == r["exp_mean_e6"], r["fmt"]
        elif r["kind"] == "audio":
            rate, nch, arr = decode_wav(payload)
            assert (rate, nch) == (r["exp_sample_rate"], r["exp_n_channels"])
            f = audio_features(rate, arr)
            f.update(spectral_features(rate, arr))
            for k in ("n_frames", "duration_e6", "rms_e6", "peak_e6",
                      "zero_crossings", "centroid_e3", "rolloff_e3"):
                assert f[k] == r[f"exp_{k}"], (r["fmt"], k)
        else:
            w, h, _fn, _fd, planes = decode_y4m(payload)
            assert (w, h, len(planes)) == (
                r["exp_width"], r["exp_height"], r["exp_n_frames"]
            )
            for k, p in enumerate(planes):
                assert frame_mean_e6(p) == frames[(r["asset_id"], k)]
                if k:
                    assert frame_mad_e6(planes[k - 1], p) == mads[
                        (r["asset_id"], k)
                    ]
                else:
                    assert mads[(r["asset_id"], 0)] is None


def test_decode_audio_quarantines(spark):
    from changegen_spark.multimodal.assets import decode_audio

    good, _ = _pcm_wav(16, 1, 8000, 50)
    df = spark.createDataFrame(
        [(1, "audio", good), (2, "audio", good[:30]), (3, "audio", b"junk")],
        "asset_id long, kind string, payload binary",
    )
    rows = {r["asset_id"]: r for r in decode_audio(df).collect()}
    assert rows[1]["ok"] and rows[1]["n_frames"] == 50
    assert not rows[2]["ok"] and not rows[3]["ok"]


def test_decode_images_parses_gif(spark):
    from changegen_spark.multimodal.assets import decode_images

    pal = [(i, i, i) for i in range(16)]
    idx = bytes(RNG.integers(0, 16, size=12 * 10, dtype=np.uint8))
    gif = encode_gif(12, 10, idx, pal)
    df = spark.createDataFrame(
        [(7, "image", gif)], "asset_id long, kind string, payload binary"
    )
    r = decode_images(df).collect()[0]
    assert r["ok"] and (r["width"], r["height"]) == (12, 10)
    n = len(idx)
    assert r["mean_px"] == ((sum(idx) * 1_000_000 + n // 2) // n) / 1e6


def test_sample_frames_parses_y4m(spark):
    from changegen_spark.multimodal.assets import sample_frames

    planes = [bytes([k * 10] * 64) for k in range(5)]
    df = spark.createDataFrame(
        [(3, "video", encode_y4m(8, 8, planes))],
        "asset_id long, kind string, payload binary",
    )
    rows = sample_frames(df, every=2).orderBy("frame_idx").collect()
    assert [(r["frame_idx"], r["mean_px"]) for r in rows] == [
        (0, 0.0), (2, 20.0), (4, 40.0)
    ]
    assert bytes(rows[1]["frame"]) == planes[2]


def test_spectral_features_pure_tone():
    """A pure 1 kHz sine concentrates both the centroid and the 85%-energy
    rolloff at the tone (within one rfft bin of an 8000-sample window)."""
    rate, n, f0 = 16000, 8000, 1000.0
    t = np.arange(n) / rate
    sig = np.sin(2 * np.pi * f0 * t).reshape(-1, 1)
    sp = spectral_features(rate, sig)
    bin_hz = rate / n  # 2 Hz bins
    assert abs(sp["centroid_e3"] / 1000 - f0) < 2 * bin_hz
    assert abs(sp["rolloff_e3"] / 1000 - f0) <= bin_hz
    # silence and sub-2-frame edge cases degrade to zeros, not errors
    assert spectral_features(rate, np.zeros((100, 1))) == {
        "centroid_e3": 0, "rolloff_e3": 0
    }
    assert spectral_features(rate, np.zeros((1, 1)))["centroid_e3"] == 0


def test_frame_motion(spark):
    """Static repeats score 0; a uniform +10 shift scores exactly 10e6."""
    from changegen_spark.multimodal.assets import frame_motion

    p0 = bytes([100] * 64)
    planes = [p0, p0, bytes([110] * 64)]
    df = spark.createDataFrame(
        [(5, "video", encode_y4m(8, 8, planes))],
        "asset_id long, kind string, payload binary",
    )
    rows = {r["frame_idx"]: r["mad_e6"] for r in frame_motion(df).collect()}
    assert rows == {1: 0, 2: 10_000_000}


def test_frame_mad_shared_definition():
    a = bytes(RNG.integers(0, 256, size=100, dtype=np.uint8))
    b = bytes(RNG.integers(0, 256, size=100, dtype=np.uint8))
    s = sum(abs(x - y) for x, y in zip(a, b))
    assert frame_mad_e6(a, b) == (s * 1_000_000 + 50) // 100
    with pytest.raises(ValueError):
        frame_mad_e6(a, a[:50])


def test_resize_images_box_downsample_semantics(spark):
    """Known 4x3 gradient: odd height crops to 2 rows, 2x2 blocks use
    half-up integer means; truncated payloads quarantine."""
    from changegen_spark.multimodal.assets import resize_images
    from changegen_spark.multimodal.png import encode_png

    # rows: [0,10,20,30], [40,50,60,70], [80,90,100,110] -> crop to 2 rows
    px = bytes([0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110])
    good = encode_png(4, 3, px)
    df = spark.createDataFrame(
        [(1, "image", good), (2, "image", good[:20])],
        "asset_id long, kind string, payload binary",
    )
    rows = {r["asset_id"]: r for r in resize_images(df).collect()}
    ok = rows[1]
    assert (ok["rwidth"], ok["rheight"]) == (2, 1)
    # blocks: (0+10+40+50+2)//4=25, (20+30+60+70+2)//4=45
    assert ok["rmean_e6"] == ((25 + 45) * 1_000_000 + 1) // 2
    assert rows[2]["ok"] is False and rows[2]["rmean_e6"] is None


def test_mel_bands_localize_sine_energy():
    """A pure 2 kHz tone at sr 8 kHz concentrates its mel energy in the
    band containing 2 kHz; silence-adjacent bands sit at the log floor."""
    import numpy as np

    from changegen_spark.multimodal.wav import MEL_N_BANDS, mel_bands

    sr = 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 2000 * t).reshape(-1, 1)
    bands = mel_bands(sr, x)
    assert len(bands) == MEL_N_BANDS
    peak = int(np.argmax(bands))
    assert bands[peak] > 1000  # real energy, not the -10000 log floor
    assert min(bands) == -10000  # empty bands hit the epsilon floor


def test_extract_mel_quarantines_bad_payloads(spark):
    import pandas as pd

    from changegen_spark.multimodal.assets import extract_mel

    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"not a wav at all"))],
        "asset_id long, kind string, payload binary",
    )
    rows = extract_mel(df).collect()
    assert len(rows) == 1 and rows[0].ok is False and rows[0].band is None


def test_dhash_locality_and_separation(spark):
    """The perceptual property dHash exists for: a lightly-noised copy of
    an image stays within a small Hamming distance (near-dup detectable),
    an unrelated image is far (≈32 expected bits differ), and the engine
    hash equals the fixture builder's independent plain-Python
    implementation on fresh random images."""
    import numpy as np

    from changegen_spark.multimodal.assets import dhash_images
    from changegen_spark.multimodal.png import encode_png

    import importlib.util as _u
    import os as _os

    spec = _u.spec_from_file_location(
        "make_media", _os.path.join(_os.path.dirname(__file__), "..", "tools", "make_media.py")
    )
    mm = _u.module_from_spec(spec)
    spec.loader.exec_module(mm)

    rng = np.random.default_rng(11)
    w, h = 36, 28
    base = rng.integers(0, 256, size=h * w, dtype=np.uint8)
    # smooth the base so the gradient structure is stable under noise
    sm = base.reshape(h, w).astype(np.int64)
    sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1) + np.roll(sm, -1, 0)) // 4
    base = sm.astype(np.uint8).reshape(-1)
    noisy = np.clip(
        base.astype(np.int64) + rng.integers(-6, 7, size=base.size), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=h * w, dtype=np.uint8)

    rows = [
        (1, "image", encode_png(w, h, bytes(base))),
        (2, "image", encode_png(w, h, bytes(noisy))),
        (3, "image", encode_png(w, h, bytes(other))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, kind string, payload binary")
    got = {r.asset_id: r.dhash for r in dhash_images(df).collect()}

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert got[1] == mm.dhash_expected(bytes(base), w, h)  # impl parity
    assert ham(got[1], got[2]) <= 10, ham(got[1], got[2])  # near-dup close
    assert ham(got[1], got[3]) >= 16, ham(got[1], got[3])  # unrelated far


def test_media_dup_pairs_finds_planted_dups(spark):
    """The banded perceptual join must surface the two planted near-dups
    of asset 0 (cross-format GIF re-encode at hamming 0, noised PNG at
    hamming 1) — and, by pigeonhole over the 8 one-byte bands, the result
    is EXACT at the <=7 threshold, so the planted rows cannot be lost to
    banding."""
    from changegen_spark.queries.media import q_media_dup_pairs

    pairs = {(r.id_a, r.id_b): r.hamming for r in q_media_dup_pairs(spark, "").collect()}
    assert pairs[(0, 29)] == 0  # dup_gif_exact
    assert pairs[(0, 30)] == 1  # dup_png_noise
    assert pairs[(29, 30)] == 1  # the dups are near-dups of each other


def test_audio_and_video_dup_signatures_collide(spark):
    """The planted multimodal dups must collide on their dedup keys:
    dup_wav_requant (float32 → 16-bit PCM requantization) shares the
    dominant-bin fingerprint with its source; dup_y4m444 (mono footage
    re-encoded 444) shares the luma signature with y4mmono — while
    unrelated assets differ."""
    from changegen_spark.queries.media import (
        q_media_audio_fingerprint,
        q_media_video_signature,
    )

    afp = {r.fmt: r.afp for r in q_media_audio_fingerprint(spark, "").collect()}
    assert afp["dup_wav_requant"] == afp["wavf32c1"]
    assert afp["wav16c1"] != afp["wavf32c1"]

    vsig = {r.fmt: r.vsig for r in q_media_video_signature(spark, "").collect()}
    assert vsig["dup_y4m444"] == vsig["y4mmono"]
    assert len(set(vsig.values())) == 4  # 5 videos, exactly one collision


def test_media_scale_fixture_plants_exact_hamming(spark, tmp_path):
    """build_media_assets plants near-dups at EXACT Hamming distances:
    the banded join must recover precisely the planned pair set —
    (src, dup) at the planned t, plus same-source dup-dup pairs at
    |t1 - t2| — and the 4×16-bit banding (complete at ≤3) must agree
    with the 8×8-bit result filtered to ≤3."""
    from changegen_spark.multimodal.assets import dhash_images
    from changegen_spark.queries.media import dup_pairs_from_dhash
    from changegen_spark.sources.scaleup import build_media_assets, media_dup_plan

    n = 300
    path = build_media_assets(spark, str(tmp_path), n_assets=n, parts=4)
    assets = spark.read.parquet(path)
    assert assets.count() == n
    d = dhash_images(assets).filter("ok").select("asset_id", "dhash")

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dup_pairs_from_dhash(d, ham=7, band_hex=2).collect()
    }

    _, plan = media_dup_plan(n)
    want = {}
    for dup, (src, t) in plan.items():
        want[tuple(sorted((src, dup)))] = t
    dups_by_src = {}
    for dup, (src, t) in plan.items():
        dups_by_src.setdefault(src, []).append((dup, t))
    for src, lst in dups_by_src.items():
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                (d1, t1), (d2, t2) = lst[i], lst[j]
                want[tuple(sorted((d1, d2)))] = abs(t1 - t2)
    assert got == want

    got3 = {
        (r.id_a, r.id_b): r.hamming
        for r in dup_pairs_from_dhash(d, ham=3, band_hex=4).collect()
    }
    assert got3 == {k: v for k, v in got.items() if v <= 3}

    # r7 scale path: multi-index Hamming search must agree BYTE-FOR-BYTE
    # with the banded-exact result at its threshold — completeness of the
    # radius-1 half-probe scheme on planted dups at every distance 0..7
    # (those at 4..7 must be excluded by the refine, those at 0..3 found)
    from changegen_spark.queries.media import dup_pairs_mih

    got_mih = {
        (r.id_a, r.id_b): r.hamming for r in dup_pairs_mih(d).collect()
    }
    assert got_mih == got3


def test_banded_completeness_guard():
    """Requesting a threshold the banding cannot cover must raise."""
    import pytest as _pytest

    from changegen_spark.queries.media import dup_pairs_from_dhash

    with _pytest.raises(ValueError):
        dup_pairs_from_dhash(None, ham=4, band_hex=4)
