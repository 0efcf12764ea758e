"""Generate literal VALUES oracles for the synthetic-asset multimodal
queries (r11 verdict #7): q_multimodal_decode / q_multimodal_frames /
q_multimodal_features_ann were rows-only because their pipelines run
through mapInPandas stages DuckDB cannot execute — but the synthetic
asset table is DETERMINISTIC by construction (md5-chain payloads), so
the expected outputs can be pinned as literal tables, the same
VALUES-oracle trick the changegen reference goldens use
(queries/refparity.py).

This script recomputes the expected results DRIVER-SIDE and SEQUENTIALLY
with its own arithmetic (explicit chunk boundaries instead of
np.array_split, its own cosine/top-k/rounding), so the oracle verifies
the distributed machinery — mapInPandas plumbing, Arrow transfer, the
broadcast top-k join and its window — against an independent sequential
recompute, and pins the operator semantics against regressions.

Output (committed): changegen_spark/queries/extensions_gold.py
Rerun only if the asset generator or an operator's semantics change:
    python tools/make_media_gold.py
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from changegen_spark.multimodal.assets import encode_image, encode_video

OUT = os.path.abspath(
    os.path.join(
        os.path.dirname(__file__), "..", "changegen_spark", "queries",
        "extensions_gold.py",
    )
)

N_ASSETS = 100
FEAT_DIM = 16
TOPK = 5
FRAME_EVERY = 2


def _assets():
    """Mirror of multimodal.assets.synth_assets(n=100)."""
    for i in range(N_ASSETS):
        if i % 5 < 3:
            w, h = 16 + (i % 7) * 4, 16 + (i % 5) * 4
            yield i, "image", encode_image(i, w, h)
        else:
            w, h, nf = 16, 16, 4 + i % 5
            yield i, "video", encode_video(i, w, h, nf)


def _decode_rows():
    import struct

    rows = []
    for i, kind, payload in _assets():
        if kind != "image":
            continue
        w, h = struct.unpack("<HH", payload[4:8])
        px = payload[8:]
        n = len(px)
        mean = ((sum(px) * 1_000_000 + n // 2) // n) / 1e6
        rows.append((i, w, h, n, mean, 1))
    return rows


def _frame_rows():
    import struct

    rows = []
    for i, kind, payload in _assets():
        if kind != "video":
            continue
        w, h, nf = struct.unpack("<HHH", payload[4:10])
        fsize = w * h
        for k in range(0, nf, FRAME_EVERY):
            frame = payload[10 + k * fsize : 10 + (k + 1) * fsize]
            rows.append((i, k, round(sum(frame) / len(frame), 6)))
    return rows


def _embed(payload: bytes) -> np.ndarray:
    """extract_features semantics with EXPLICIT chunk boundaries (the
    np.array_split contract: len % dim leading chunks get one extra
    element), float32 exactly as the operator emits."""
    body = payload[8:]
    n = len(body)
    base, extra = divmod(n, FEAT_DIM)
    means, pos = [], 0
    for j in range(FEAT_DIM):
        size = base + (1 if j < extra else 0)
        chunk = body[pos : pos + size]
        pos += size
        means.append(sum(chunk) / size if size else 0.0)
    return np.array(means, dtype=np.float32) / np.float32(255.0)


def _ann_rows():
    vecs = {i: _embed(p).astype(np.float64) for i, _k, p in _assets()}
    qids = [i for i in vecs if i % 25 == 0]
    rows = []
    for q in sorted(qids):
        qv = vecs[q]
        qn = float(np.sqrt(np.dot(qv, qv)))
        scored = []
        for vid, vv in vecs.items():
            if vid == q:
                continue
            vn = float(np.sqrt(np.dot(vv, vv)))
            cos = float(np.dot(qv, vv)) / (qn * vn) if qn and vn else 0.0
            cos6 = float(
                Decimal(repr(cos)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            scored.append((vid, cos6))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, cos6) in enumerate(scored[:TOPK], start=1):
            rows.append((q, vid, cos6, rank))
    return rows


def _values_sql(rows, cols_sql: str, casts, order_by: str) -> str:
    body = ",\n        ".join(
        "(" + ", ".join(c(v) for c, v in zip(casts, r)) + ")" for r in rows
    )
    return (
        "SELECT * FROM (\n    VALUES\n        "
        + body
        + f"\n) AS t({cols_sql})\nORDER BY {order_by}"
    )


def _big(v) -> str:
    return f"CAST({v} AS BIGINT)"


def _int(v) -> str:
    return f"CAST({v} AS INTEGER)"


def _dbl(v) -> str:
    return f"CAST({v!r} AS DOUBLE)"


def main() -> None:
    decode = _values_sql(
        _decode_rows(),
        "asset_id, width, height, n_pixels, mean_px, ok",
        [_big, _int, _int, _big, _dbl, _big],
        "asset_id",
    )
    frames = _values_sql(
        _frame_rows(),
        "asset_id, frame_idx, mean_px",
        [_big, _int, _dbl],
        "asset_id, frame_idx",
    )
    ann = _values_sql(
        _ann_rows(),
        "query_id, vec_id, cos_sim, rank",
        [_big, _big, _dbl, _big],
        "query_id, rank",
    )
    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED by tools/make_media_gold.py — do not edit.\n\n'
            "Literal VALUES oracles for the synthetic-asset multimodal\n"
            "queries: expected outputs recomputed driver-side and\n"
            "sequentially from the deterministic asset generator, pinned\n"
            "as plain SQL so DuckDB can replay them against the Spark\n"
            'mapInPandas pipelines.\n"""\n\n'
            f'Q_MULTIMODAL_DECODE_SQL = """\n{decode}\n"""\n\n'
            f'Q_MULTIMODAL_FRAMES_SQL = """\n{frames}\n"""\n\n'
            f'Q_MULTIMODAL_FEATURES_ANN_SQL = """\n{ann}\n"""\n'
        )
    print(
        f"wrote {OUT}: decode={len(_decode_rows())} rows, "
        f"frames={len(_frame_rows())} rows, ann={len(_ann_rows())} rows"
    )


if __name__ == "__main__":
    main()
