"""Pure-stdlib RIFF/WAVE audio codec for the multimodal decode path.

A real audio decoder (no external library): RIFF chunk walk, ``fmt ``
parse, PCM 8-bit unsigned / 16/24/32-bit signed little-endian, and IEEE
float 32/64, any channel count.  Anything else (ADPCM, extensible headers,
truncated data) raises ValueError -> the caller's quarantine path, mirroring
the PNG codec's contract (multimodal/png.py).

``audio_features`` is the SHARED feature definition: the fixture builder
(tools/make_media.py) applies it to the raw pre-encoding sample array and
stores the result as expected columns; the Spark decode stage applies it to
the array it re-decodes from the WAV bytes.  PCM is lossless, so a correct
decoder reproduces the source array bit-for-bit and the features hash-match
-- the decode step itself is what the oracle verifies.

All feature outputs are integers (e6-scaled where fractional) so the
digest/oracle comparison never touches engine float formatting.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIG = b"RIFF"

# (audio_format, bits) -> numpy dtype for the frame payload
_PCM_DTYPES = {
    (1, 8): np.uint8,
    (1, 16): np.dtype("<i2"),
    (1, 32): np.dtype("<i4"),
    (3, 32): np.dtype("<f4"),
    (3, 64): np.dtype("<f8"),
}


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, float64 array [frames, ch])
    normalized to [-1, 1].

    Raises ValueError on malformed/truncated/unsupported input."""
    if len(data) < 12 or data[:4] != WAV_SIG or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    frames: bytes | None = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated {cid!r} chunk")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            frames = body
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if frames is None:
        raise ValueError("missing data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("implausible fmt values")
    if (audio_format, bits) == (1, 24):
        if len(frames) % (3 * n_channels):
            raise ValueError("data chunk not frame-aligned")
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        # sign-extend 24-bit little-endian into int32
        raw = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        raw = np.where(raw >= 1 << 23, raw - (1 << 24), raw)
        arr = raw.astype(np.float64) / float(1 << 23)
    else:
        dtype = _PCM_DTYPES.get((audio_format, bits))
        if dtype is None:
            raise ValueError(
                f"unsupported format/bits: {audio_format}/{bits}"
            )
        if block_align and len(frames) % block_align:
            raise ValueError("data chunk not frame-aligned")
        raw = np.frombuffer(frames, dtype=dtype)
        if audio_format == 3:
            arr = raw.astype(np.float64)
        elif bits == 8:
            arr = (raw.astype(np.float64) - 128.0) / 128.0
        else:
            arr = raw.astype(np.float64) / float(1 << (bits - 1))
    if arr.size % n_channels:
        raise ValueError("sample count not divisible by channel count")
    return sample_rate, n_channels, arr.reshape(-1, n_channels)


def audio_features(sample_rate: int, samples: np.ndarray) -> dict[str, int]:
    """Deterministic integer feature set over a [frames, channels] float
    array in [-1, 1].  Shared between the fixture builder (pre-encoding
    source array) and the decode stage (post-decode array); see module
    docstring for why that factoring is the parity check.

    - duration_e6: exact integer microseconds (round-half-up)
    - rms_e6 / peak_e6: e6-scaled, computed in float64 then rounded --
      bit-stable because both sides run the identical numpy expression on
      identical arrays
    - zero_crossings: strict sign flips on channel 0 (zeros break a run)
    """
    n_frames = int(samples.shape[0])
    duration_e6 = (n_frames * 2_000_000 + sample_rate) // (2 * sample_rate)
    if n_frames == 0:
        return {
            "n_frames": 0,
            "duration_e6": 0,
            "rms_e6": 0,
            "peak_e6": 0,
            "zero_crossings": 0,
        }
    flat = samples.reshape(-1)
    rms = float(np.sqrt(np.mean(flat * flat)))
    peak = float(np.max(np.abs(flat)))
    ch0 = samples[:, 0]
    zc = int(np.sum(ch0[:-1] * ch0[1:] < 0.0))
    return {
        "n_frames": n_frames,
        "duration_e6": duration_e6,
        "rms_e6": int(round(rms * 1_000_000)),
        "peak_e6": int(round(peak * 1_000_000)),
        "zero_crossings": zc,
    }


def spectral_features(sample_rate: int, samples: np.ndarray) -> dict[str, int]:
    """Frequency-domain features of channel 0 via rfft, e3-scaled Hz ints:

    - centroid_e3: magnitude-weighted mean frequency
    - rolloff_e3:  lowest frequency below which 85% of spectral ENERGY
      (magnitude^2) lies

    Shared-definition contract like ``audio_features``: builder and decode
    stage run the identical numpy expression on identical arrays (PCM is
    lossless), so the e3-rounded integers hash-match."""
    n = int(samples.shape[0])
    if n < 2:
        return {"centroid_e3": 0, "rolloff_e3": 0}
    ch0 = samples[:, 0]
    mag = np.abs(np.fft.rfft(ch0))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = float(np.sum(mag))
    if total <= 0.0:
        return {"centroid_e3": 0, "rolloff_e3": 0}
    centroid = float(np.sum(freqs * mag) / total)
    energy = mag * mag
    cum = np.cumsum(energy)
    k = int(np.searchsorted(cum, 0.85 * cum[-1]))
    rolloff = float(freqs[min(k, len(freqs) - 1)])
    return {
        "centroid_e3": int(round(centroid * 1000)),
        "rolloff_e3": int(round(rolloff * 1000)),
    }


MEL_N_BANDS = 8
MEL_N_FFT = 512
MEL_HOP = 256


def _hz_to_mel(f):
    import numpy as np

    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    import numpy as np

    return 700.0 * (np.power(10.0, np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_bands(
    sample_rate: int,
    samples: np.ndarray,
    n_mels: int = MEL_N_BANDS,
    n_fft: int = MEL_N_FFT,
    hop: int = MEL_HOP,
) -> list[int]:
    """Log-mel filterbank energies of channel 0, e3-scaled ints — the
    canonical audio-ML front end (HTK mel scale, triangular filters,
    rectangular analysis window for determinism-by-simplicity).

    Shared-definition contract like the other feature functions: the
    fixture builder and the decode stage run this exact numpy code on
    identical lossless-PCM arrays, so the e3-rounded integers hash-match.
    Frames of ``n_fft`` samples every ``hop`` (zero-padded to one frame if
    shorter); per-bin power averaged over frames; per-band energy is an
    explicit elementwise-multiply + sum (no BLAS dispatch).
    """
    ch0 = np.asarray(samples[:, 0], dtype=np.float64)
    if ch0.shape[0] < n_fft:
        ch0 = np.pad(ch0, (0, n_fft - ch0.shape[0]))
    starts = range(0, ch0.shape[0] - n_fft + 1, hop)
    P = np.zeros(n_fft // 2 + 1)
    for s in starts:
        mag = np.abs(np.fft.rfft(ch0[s : s + n_fft]))
        P = P + mag * mag
    P = P / float(len(starts))
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sample_rate)
    edges_mel = np.linspace(
        _hz_to_mel(0.0), _hz_to_mel(sample_rate / 2.0), n_mels + 2
    )
    edges = _mel_to_hz(edges_mel)
    out = []
    for b in range(n_mels):
        lo, ctr, hi = edges[b], edges[b + 1], edges[b + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        w = np.maximum(0.0, np.minimum(up, down))
        e = float(np.sum(w * P))
        out.append(int(round(np.log10(e + 1e-10) * 1000)))
    return out


AFP_WIN, AFP_HOP = 256, 128


def peak_hash(sample_rate: int, samples: np.ndarray) -> dict:
    """Deterministic audio fingerprint (the constellation idea reduced to
    its verifiable core): mono mix → 256-sample frames at hop 128 → rfft
    magnitude → dominant non-DC bin per frame → md5 of the bin sequence
    (first 16 hex).  Shared between the fixture builder (source arrays)
    and the decode stage (post-decode arrays) — the same factoring-as-
    parity-check as audio_features/mel_bands.  Near-identical audio
    (requantization, light noise) keeps the dominant-bin sequence, so
    fingerprint equality is the audio dedup key.

    Ties in the magnitude argmax resolve to the LOWEST bin (numpy argmax
    convention) — part of the definition, identical on both sides."""
    import hashlib

    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = (mono.shape[0] - AFP_WIN) // AFP_HOP + 1 if mono.shape[0] >= AFP_WIN else 0
    bins = []
    for i in range(n):
        frame = mono[i * AFP_HOP : i * AFP_HOP + AFP_WIN]
        mag = np.abs(np.fft.rfft(frame))
        bins.append(int(np.argmax(mag[1:])) + 1)
    digest = hashlib.md5(",".join(map(str, bins)).encode()).hexdigest()[:16]
    return {"afp_frames": n, "afp": digest}
