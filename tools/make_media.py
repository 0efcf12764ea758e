"""Build the shipped real-media fixture for the multimodal decode queries.

The container has no PIL/libav, so the repo ships REAL media bytes it can
both generate and verify without them:

* images  — PNG (every filter type x color type, via multimodal/png.py's
  encoder) and GIF (multimodal/gif.py's spec-compliant LZW encoder, plain
  and interlaced).  Gray-valued palettes/channels make the integer luma
  ((77R+150G+29B)>>8 == v when r==g==b==v) reproduce the source array
  exactly, so expected means are computed from the SOURCE pixels.
* audio   — WAV written by the STDLIB ``wave`` module (8/16/24/32-bit PCM
  — an encoder fully independent of multimodal/wav.py) plus IEEE-float32
  WAVs from a 10-line struct writer here.
* video   — Y4M streams (multimodal/y4m.py encoder) across chroma formats.

Every expected column is computed from the raw source arrays BEFORE
encoding (via the shared feature definitions ``audio_features`` /
``frame_mean_e6`` / the integer mean).  Lossless codecs must reproduce the
source arrays bit-for-bit, so a green oracle hash-match on these columns
verifies the DECODE step end to end.

Outputs (committed):
    fixtures/media_assets.parquet  — one row per asset, payload + expected
    fixtures/media_frames.parquet  — one row per video frame, expected mean

Rerun only when codecs/fixture shapes change:  python tools/make_media.py
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
import sys
import wave

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from changegen_spark.multimodal.gif import encode_gif
from changegen_spark.multimodal.png import encode_png
from changegen_spark.multimodal.wav import audio_features, mel_bands, peak_hash, spectral_features
from changegen_spark.multimodal.y4m import encode_y4m, frame_mad_e6, frame_mean_e6

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))


def mean_e6(px: bytes) -> int:
    """Integer-exact e6-scaled mean — the image twin of frame_mean_e6."""
    return (sum(px) * 1_000_000 + len(px) // 2) // len(px) if px else 0


def resize2_expected(px: bytes, w: int, h: int, f: int = 2) -> dict:
    """Expected box-downsample stats — plain-Python loops, deliberately
    independent of the engine's numpy resizer (multimodal.assets
    .resize_images): crop to f-divisible dims, each block (sum + f*f/2)//(f*f),
    then the standard half-up e6 mean of the resized pixels."""
    w2, h2 = (w // f) * f, (h // f) * f
    total, cnt = 0, 0
    for by in range(0, h2, f):
        for bx in range(0, w2, f):
            s = 0
            for dy in range(f):
                for dx in range(f):
                    s += px[(by + dy) * w + (bx + dx)]
            total += (s + (f * f) // 2) // (f * f)
            cnt += 1
    return {
        "rwidth": w2 // f,
        "rheight": h2 // f,
        "rmean_e6": (total * 1_000_000 + cnt // 2) // cnt,
    }


def dhash_expected(px: bytes, w: int, h: int) -> str:
    """Expected 64-bit difference hash (dHash) as 16 hex chars — plain
    Python loops, deliberately independent of the engine's numpy
    implementation (multimodal.assets.dhash_images).  Grid: 8 rows × 9
    cols of integer area regions [r*h//8,(r+1)*h//8) × [c*w//9,(c+1)*w//9);
    cell = half-up integer mean; bit r*8+c = 1 iff cell[r][c] < cell[r][c+1]."""
    cells = []
    for r in range(8):
        row = []
        for c in range(9):
            r0, r1 = r * h // 8, (r + 1) * h // 8
            c0, c1 = c * w // 9, (c + 1) * w // 9
            s, area = 0, (r1 - r0) * (c1 - c0)
            for y in range(r0, r1):
                for x in range(c0, c1):
                    s += px[y * w + x]
            row.append((s + area // 2) // area)
        cells.append(row)
    v = 0
    for r in range(8):
        for c in range(8):
            if cells[r][c] < cells[r][c + 1]:
                v |= 1 << (r * 8 + c)
    return f"{v:016x}"


def write_float32_wav(rate: int, channels: int, arr: np.ndarray) -> bytes:
    """IEEE-float (format 3) WAV writer — stdlib wave can't; independent of
    the decoder's parsing path."""
    data = arr.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, channels, rate, rate * 4 * channels, 4 * channels, 32)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main() -> None:
    rng = np.random.default_rng(42)
    assets = []  # (id, kind, fmt, payload, exp dict)
    frames = []  # (asset_id, frame_idx, exp_mean_e6)
    aid = 0

    def add(kind, fmt, payload, **exp):
        nonlocal aid
        assets.append((aid, kind, fmt, payload, exp))
        aid += 1

    # --- images: PNG across filters x color types -------------------------
    for filt in range(5):
        for ctype in (0, 2, 4, 6):
            w, h = 24 + 4 * filt, 18 + 2 * ctype
            gray = bytes(rng.integers(0, 256, size=w * h, dtype=np.uint8))
            add(
                "image", f"png_f{filt}c{ctype}",
                encode_png(w, h, gray, filter_type=filt, color_type=ctype),
                width=w, height=h, mean_e6=mean_e6(gray),
                dhash=dhash_expected(gray, w, h),
                **resize2_expected(gray, w, h),
            )
            if filt == 0 and ctype == 0:
                first_gray, fg_w, fg_h = gray, w, h
    # --- images: baseline JPEG (gray, restarts, 4:4:4 / 4:2:0 color) ------
    # JPEG is lossy: expected means come from DECODING the encoded bytes
    # (a decode-determinism pin, not source parity — the two-implementation
    # correctness evidence is the encoder/decoder round-trip PSNR suite in
    # tests/test_jpeg.py; see multimodal/jpeg.py docstring).
    from changegen_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    jy = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    jpegs = [
        ("jpeg_gray", encode_jpeg(jy.tobytes(), 48, 40)),
        ("jpeg_rst", encode_jpeg(jy.tobytes(), 48, 40, restart_interval=2)),
        ("jpeg_odd", encode_jpeg(jy[:19, :21].copy().tobytes(), 21, 19)),
        (
            "jpeg_444",
            encode_jpeg(
                jy.tobytes(), 48, 40,
                cb=np.full((40, 48), 120, np.uint8).tobytes(),
                cr=np.full((40, 48), 136, np.uint8).tobytes(),
                sampling=1,
            ),
        ),
        (
            "jpeg_420",
            encode_jpeg(
                jy.tobytes(), 48, 40,
                cb=np.full((20, 24), 120, np.uint8).tobytes(),
                cr=np.full((20, 24), 136, np.uint8).tobytes(),
                sampling=2,
            ),
        ),
    ]
    for fmt, payload in jpegs:
        # lossy: resize expectations also come from the DECODED pixels —
        # the same decode-determinism pin as the mean
        w, h, px = decode_jpeg(payload)
        add("image", fmt, payload, width=w, height=h, mean_e6=mean_e6(px),
            dhash=dhash_expected(px, w, h),
            **resize2_expected(px, w, h))

    # --- images: GIF (palette sizes, plain + interlaced) ------------------
    for ncol, interlace in ((4, False), (64, False), (250, True), (256, False)):
        w, h = 40, 30
        pal = [(i, i, i) for i in range(ncol)]  # gray palette: luma == index
        idx = bytes(rng.integers(0, ncol, size=w * h, dtype=np.uint8))
        add(
            "image", "gif_i" if interlace else f"gif{ncol}",
            encode_gif(w, h, idx, pal, interlace=interlace),
            width=w, height=h, mean_e6=mean_e6(idx),
            dhash=dhash_expected(idx, w, h),
            **resize2_expected(idx, w, h),
        )

    # --- images: planted near-duplicates of png_f0c0 (asset 0) ------------
    # cross-format exact dup (same pixels as GIF: identical dhash) and a
    # lightly-noised re-encode (small Hamming distance) — the inputs the
    # q_media_dup_pairs perceptual-dedup join exists to find.  A separate
    # rng keeps the main seed-42 draw sequence (and thus every other
    # asset's expectations) untouched.
    dup_rng = np.random.default_rng(7)
    gif_pal = [(i, i, i) for i in range(256)]
    add(
        "image", "dup_gif_exact",
        encode_gif(fg_w, fg_h, first_gray, gif_pal),
        width=fg_w, height=fg_h, mean_e6=mean_e6(first_gray),
        dhash=dhash_expected(first_gray, fg_w, fg_h),
        **resize2_expected(first_gray, fg_w, fg_h),
    )
    noised = bytes(
        int(min(255, max(0, b + int(d))))
        for b, d in zip(first_gray, dup_rng.integers(-2, 3, size=len(first_gray)))
    )
    add(
        "image", "dup_png_noise",
        encode_png(fg_w, fg_h, noised),
        width=fg_w, height=fg_h, mean_e6=mean_e6(noised),
        dhash=dhash_expected(noised, fg_w, fg_h),
        **resize2_expected(noised, fg_w, fg_h),
    )

    # --- audio: stdlib-wave PCM + float32 ---------------------------------
    def pcm_norm(bits, src):
        if bits == 8:
            return (src.astype(np.float64) - 128.0) / 128.0
        return src.astype(np.float64) / float(1 << (bits - 1))

    for bits in (8, 16, 24, 32):
        for channels in (1, 2):
            rate = 8000 if channels == 1 else 16000
            n = 1200 + 100 * bits
            if bits == 8:
                src = rng.integers(0, 256, size=(n, channels), dtype=np.int64)
                raw = src.astype(np.uint8).tobytes()
            else:
                lo, hi = -(1 << (bits - 1)), 1 << (bits - 1)
                src = rng.integers(lo, hi, size=(n, channels), dtype=np.int64)
                if bits == 24:
                    raw = b"".join(
                        int(v & 0xFFFFFF).to_bytes(3, "little") for v in src.reshape(-1)
                    )
                else:
                    raw = src.astype(f"<i{bits // 8}").tobytes()
            buf = io.BytesIO()
            wf = wave.open(buf, "wb")
            wf.setnchannels(channels)
            wf.setsampwidth(bits // 8)
            wf.setframerate(rate)
            wf.writeframes(raw)
            wf.close()
            norm = pcm_norm(bits, src)
            add(
                "audio", f"wav{bits}c{channels}", buf.getvalue(),
                sample_rate=rate, n_channels=channels,
                **audio_features(rate, norm), **spectral_features(rate, norm),
                mel_e3=mel_bands(rate, norm),
                **{"afp_frames": peak_hash(rate, norm)["afp_frames"],
                   "afp": peak_hash(rate, norm)["afp"]},
            )
    for channels in (1, 2):
        rate, n = 22050, 1700
        arr = rng.uniform(-1, 1, size=(n, channels)).astype("<f4").astype(np.float64)
        add(
            "audio", f"wavf32c{channels}",
            write_float32_wav(rate, channels, arr),
            sample_rate=rate, n_channels=channels,
            **audio_features(rate, arr), **spectral_features(rate, arr),
            mel_e3=mel_bands(rate, arr),
            **peak_hash(rate, arr),
        )
        if channels == 1:
            f32_mono = arr  # saved for the planted requantized dup below

    # --- audio: planted near-dup — the float32 mono track requantized to
    # 16-bit PCM via stdlib wave: decoded floats differ by quantization
    # noise (~-90 dB) but the dominant-bin sequence (and thus the
    # fingerprint) should collide — the audio dedup key the
    # q_media_audio_fingerprint stage exists for.
    q16 = np.clip(np.round(f32_mono * 32768.0), -32768, 32767).astype(np.int64)
    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(1)
    wf.setsampwidth(2)
    wf.setframerate(22050)
    wf.writeframes(q16.astype("<i2").tobytes())
    wf.close()
    qnorm = q16.astype(np.float64).reshape(-1, 1) / 32768.0
    add(
        "audio", "dup_wav_requant", buf.getvalue(),
        sample_rate=22050, n_channels=1,
        **audio_features(22050, qnorm), **spectral_features(22050, qnorm),
        mel_e3=mel_bands(22050, qnorm),
        **peak_hash(22050, qnorm),
    )

    # --- video: Y4M across chroma formats ---------------------------------
    for chroma, nf in (("420jpeg", 6), ("422", 4), ("444", 5), ("mono", 8)):
        w, h = 32, 24
        planes = [
            bytes(rng.integers(0, 256, size=w * h, dtype=np.uint8)) for _ in range(nf)
        ]
        vid_id = aid
        vsig = hashlib.md5(
            ",".join(dhash_expected(p, w, h) for p in planes).encode()
        ).hexdigest()[:16]
        add(
            "video", f"y4m{chroma}",
            encode_y4m(w, h, planes, fps=(25, 1), chroma=chroma),
            width=w, height=h, n_frames=nf, vsig=vsig,
        )
        for k, p in enumerate(planes):
            mad = frame_mad_e6(planes[k - 1], p) if k else None
            frames.append((vid_id, k, frame_mean_e6(p), mad))
        if chroma == "mono":
            mono_planes, mono_w, mono_h = planes, w, h

    # --- video: planted cross-format dup — the mono footage re-encoded
    # with 444 chroma: the luma planes (all the signature reads) are
    # identical, so the video signature must collide.
    dvid_id = aid
    dsig = hashlib.md5(
        ",".join(dhash_expected(p, mono_w, mono_h) for p in mono_planes).encode()
    ).hexdigest()[:16]
    add(
        "video", "dup_y4m444", encode_y4m(mono_w, mono_h, mono_planes, fps=(25, 1), chroma="444"),
        width=mono_w, height=mono_h, n_frames=len(mono_planes), vsig=dsig,
    )
    for k, p in enumerate(mono_planes):
        mad = frame_mad_e6(mono_planes[k - 1], p) if k else None
        frames.append((dvid_id, k, frame_mean_e6(p), mad))

    exp_keys = [
        "width", "height", "mean_e6", "rwidth", "rheight", "rmean_e6",
        "sample_rate", "n_channels",
        "n_frames", "duration_e6", "rms_e6", "peak_e6", "zero_crossings",
        "centroid_e3", "rolloff_e3", "afp_frames",
    ]
    cols = {
        "asset_id": pa.array([a[0] for a in assets], pa.int64()),
        "kind": pa.array([a[1] for a in assets], pa.string()),
        "fmt": pa.array([a[2] for a in assets], pa.string()),
        "payload": pa.array([a[3] for a in assets], pa.binary()),
    }
    for k in exp_keys:
        cols[f"exp_{k}"] = pa.array(
            [a[4].get(k) for a in assets], pa.int64()
        )
    cols["exp_afp"] = pa.array(
        [a[4].get("afp") for a in assets], pa.string()
    )
    cols["exp_vsig"] = pa.array(
        [a[4].get("vsig") for a in assets], pa.string()
    )
    cols["exp_dhash"] = pa.array(
        [a[4].get("dhash") for a in assets], pa.string()
    )
    cols["exp_mel_e3"] = pa.array(
        [a[4].get("mel_e3") for a in assets], pa.list_(pa.int64())
    )
    os.makedirs(FIXDIR, exist_ok=True)
    pq.write_table(pa.table(cols), os.path.join(FIXDIR, "media_assets.parquet"))
    pq.write_table(
        pa.table({
            "asset_id": pa.array([f[0] for f in frames], pa.int64()),
            "frame_idx": pa.array([f[1] for f in frames], pa.int64()),
            "exp_mean_e6": pa.array([f[2] for f in frames], pa.int64()),
            "exp_mad_e6": pa.array([f[3] for f in frames], pa.int64()),
        }),
        os.path.join(FIXDIR, "media_frames.parquet"),
    )
    total = sum(len(a[3]) for a in assets)
    print(f"wrote {len(assets)} assets ({total} payload bytes), {len(frames)} frame rows")


if __name__ == "__main__":
    main()
