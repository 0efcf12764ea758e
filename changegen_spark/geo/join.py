"""Distributed spatial distance join (SURVEY §2.3 J1-J4).

Parity target: the reference pushes ``ST_DWithin(n.geom, o.geom, 5)`` +
``ST_ClosestPoint`` down to PostGIS with a GiST index
(``changegen/db.py:126-156``).  Spark-first replacement: a grid-partitioned
equi-join — the same filter-and-refine plan Sedona's DistanceJoin builds,
expressed with built-ins only:

  1. bin: every left point is exploded to the grid cells its
     radius-expanded bbox covers (≤4 cells at cell_size = 2·radius);
     every right point maps to exactly one cell;
  2. partition: equi-join on cell id — a plain hash-shuffle join, so AQE
     skew-handling and broadcast promotion apply as usual;
  3. refine: exact Euclidean distance predicate.

This scales the way a 100 TB spatial join must: no cross join, no driver
index, shuffle keyed by spatial locality, and a dense-city skew cell is
split by AQE.  For segment inputs, explode polylines to segments first
(pos-carrying) and use the segment bbox for binning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells_for_bbox(xmin, ymin, xmax, ymax, cell: float) -> Column:
    """All (cx, cy) grid cells intersecting the bbox — flattened struct array."""
    cx0 = F.floor(xmin / F.lit(cell)).cast("long")
    cx1 = F.floor(xmax / F.lit(cell)).cast("long")
    cy0 = F.floor(ymin / F.lit(cell)).cast("long")
    cy1 = F.floor(ymax / F.lit(cell)).cast("long")
    return F.flatten(
        F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(
                F.sequence(cy0, cy1),
                lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
            ),
        )
    )


def grid_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_cols: tuple[str, str] = ("x", "y"),
    right_cols: tuple[str, str] = ("x", "y"),
    exclude_equal: bool = False,
) -> DataFrame:
    """All (left, right) pairs with Euclidean distance ≤ radius (J1 core).

    Output: left columns prefixed ``l_``, right columns prefixed ``r_``, plus
    ``dist``.  ``exclude_equal`` drops coincident points — the reference's
    ``NOT ST_Equals`` guard (``changegen/db.py:134``), required for self-joins
    (J3).  Equality here is exact coordinate equality, as ST_Equals on points.
    """
    lx, ly = left_cols
    rx, ry = right_cols
    cell = 2.0 * radius

    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])

    lcells = l.withColumn(
        "__cell",
        F.explode(
            _cells_for_bbox(
                F.col(f"l_{lx}") - radius,
                F.col(f"l_{ly}") - radius,
                F.col(f"l_{lx}") + radius,
                F.col(f"l_{ly}") + radius,
                cell,
            )
        ),
    )
    rcells = r.withColumn(
        "__cell",
        F.struct(
            F.floor(F.col(f"r_{rx}") / F.lit(cell)).cast("long").alias("cx"),
            F.floor(F.col(f"r_{ry}") / F.lit(cell)).cast("long").alias("cy"),
        ),
    )

    dist = F.sqrt(
        F.pow(F.col(f"l_{lx}") - F.col(f"r_{rx}"), 2)
        + F.pow(F.col(f"l_{ly}") - F.col(f"r_{ry}"), 2)
    )
    joined = (
        lcells.join(rcells, "__cell")
        .drop("__cell")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(radius))
    )
    if exclude_equal:
        joined = joined.filter(
            (F.col(f"l_{lx}") != F.col(f"r_{rx}")) | (F.col(f"l_{ly}") != F.col(f"r_{ry}"))
        )
    # A left point's expanded bbox can cover a right point's cell only once
    # (cells partition the plane), so no pair-dedup pass is needed.
    return joined
