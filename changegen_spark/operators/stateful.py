"""Per-group ordered stateful scans via ``applyInPandas`` — the custom
operator tier for logic no Catalyst window can express.

The exemplar is the CAPPED RUNNING SUM (inventory / account balance with
floor and ceiling): each step's output depends on the CLAMPED previous
value, so the recurrence ``bal_i = clamp(bal_{i-1} + d_i)`` is not a
window aggregate (running sum + clamp-at-the-end gives a different
answer whenever a bound was hit mid-stream).

Scale: ``applyInPandas`` shuffles once by the group key and runs each
group's scan in one Arrow batch stream — state is O(1) per group, group
sizes bound memory (a mega-group needs time-sliced chunking with carried
state, the applyInPandasWithState shape in streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def capped_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delta_col: str,
    init: int,
    lo: int,
    hi: int,
) -> DataFrame:
    """Per-key clamped balance scan.  Returns one row per key:
    (keys..., n_events, final_balance, n_cap_hits, n_floor_hits).
    Integer deltas → the scan is exact and deterministic."""
    schema = (
        ", ".join(f"{c} long" for c in key_cols)
        + ", n_events long, final_balance long, n_cap_hits long, n_floor_hits long"
    )

    def scan(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols)
        bal, caps, floors = init, 0, 0
        for d in pdf[delta_col]:
            bal += int(d)
            if bal > hi:
                bal, caps = hi, caps + 1
            elif bal < lo:
                bal, floors = lo, floors + 1
        row = {c: pdf.iloc[0][c] for c in key_cols}
        row.update(
            n_events=len(pdf), final_balance=bal,
            n_cap_hits=caps, n_floor_hits=floors,
        )
        return pd.DataFrame([row])

    return df.groupBy(*key_cols).applyInPandas(scan, schema)
