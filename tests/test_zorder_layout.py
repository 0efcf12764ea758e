"""Z-order layout → parquet min/max pruning, demonstrated on real files.

`test_zorder_key_locality` pins that z-prefixes are spatially tight;
this test pins the thing that matters at 100 TB: after writing the table
range-partitioned and sorted by ``zkey``, a 2-D bbox predicate can rule
out most FILES from their x/y column statistics alone (what the parquet
reader's row-group pruning and a table format's file skipping both do),
while the same predicate against an id-ordered layout must open nearly
every file.
"""

import glob
import os

from pyspark.sql import functions as F


def _file_stats(path_glob):
    """Per-file (min_x, max_x, min_y, max_y) from parquet footer metadata."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {"x": None, "y": None}
        maxs = {"x": None, "y": None}
        for rg in range(md.num_row_groups):
            for c in ("x", "y"):
                st = md.row_group(rg).column(cols[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append((mins["x"], maxs["x"], mins["y"], maxs["y"]))
    return out


def _n_overlapping(stats, bbox):
    x0, x1, y0, y1 = bbox
    return sum(
        1
        for (mnx, mxx, mny, mxy) in stats
        if not (mxx < x0 or mnx > x1 or mxy < y0 or mny > y1)
    )


def test_zorder_files_prune_bbox(spark, sf_dir, tmp_path):
    from changegen_spark.queries.geo import _points
    from changegen_spark.queries.scale import zorder_key

    pts = _points(spark, sf_dir).withColumn(
        "zkey",
        zorder_key(
            F.round(F.col("x") * 10).cast("int"), F.round(F.col("y") * 10).cast("int")
        ),
    )
    zdir, iddir = str(tmp_path / "bz"), str(tmp_path / "bid")
    (
        pts.repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    pts.repartitionByRange(16, "pid").write.mode("overwrite").parquet(iddir)

    zstats = _file_stats(os.path.join(zdir, "*.parquet"))
    idstats = _file_stats(os.path.join(iddir, "*.parquet"))
    assert len(zstats) == 16 and len(idstats) == 16

    # a 10x10-unit bbox in the 100x100 field (1% of the area)
    bbox = (20.0, 30.0, 40.0, 50.0)
    z_hit = _n_overlapping(zstats, bbox)
    id_hit = _n_overlapping(idstats, bbox)
    # id-ordered files each span ~the whole plane -> no pruning; z-ordered
    # files are spatially tight -> the bbox touches only a few
    assert id_hit >= 15
    assert z_hit <= 6

    # pruning is sound: reading only overlapping z-files returns the same
    # rows the full scan does
    full = {
        r.pid
        for r in spark.read.parquet(zdir)
        .filter(
            (F.col("x") >= bbox[0])
            & (F.col("x") <= bbox[1])
            & (F.col("y") >= bbox[2])
            & (F.col("y") <= bbox[3])
        )
        .collect()
    }
    kept = [
        f
        for f, st in zip(sorted(glob.glob(os.path.join(zdir, "*.parquet"))), zstats)
        if _n_overlapping([st], bbox)
    ]
    pruned = {
        r.pid
        for r in spark.read.parquet(*kept)
        .filter(
            (F.col("x") >= bbox[0])
            & (F.col("x") <= bbox[1])
            & (F.col("y") >= bbox[2])
            & (F.col("y") <= bbox[3])
        )
        .collect()
    }
    assert pruned == full and len(full) > 0
