"""Z-order clustering: key correctness vs a Morton reference, and the
actual pruning benefit — per-file min/max spans shrink on BOTH
dimensions, where a linear sort only helps its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.functions.zorder import zorder_key
from website_traffic_etl_gcp_spark.sources.writers import write_zordered

from .conftest import SF_DIR


def _morton(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_key_matches_reference(spark):
    samples = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (7, 200)]
    df = spark.createDataFrame(samples, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key("x", "y", bits=8)).collect()
    }
    for x, y in samples:
        assert got[(x, y)] == _morton(x, y, 8), (x, y)


def _spans(path: str, col: str) -> float:
    """Mean (max-min) of ``col`` across the table's parquet files."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append(hi - lo)
    assert spans
    return sum(spans) / len(spans)


def test_zorder_write_narrows_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        (F.col("user_id") % 256).cast("bigint").alias("x"),
        (F.col("value").cast("bigint") % 256).alias("y"),
        "event_id",
    )
    z_path = str(tmp_path / "zordered")
    lin_path = str(tmp_path / "linear")

    write_zordered(ev, z_path, ("x", "y"), n_files=8, bits=8)
    (
        ev.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.parquet(lin_path)
    )

    # linear sort: x is tight but y is unconstrained (full range per file)
    assert _spans(lin_path, "x") < 64
    assert _spans(lin_path, "y") > 200
    # z-order: BOTH dimensions materially narrower than the unsorted dim
    assert _spans(z_path, "y") < 160
    assert _spans(z_path, "x") < 160
