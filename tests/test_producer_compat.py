"""Producer tolerance: the driver's testdata has shipped events.ts both
as parquet TIMESTAMP(NANOS) (read as int64 under nanosAsLong) and as
TIMESTAMP(MICROS). Batch (catalog.load_table) and streaming
(rollups.read_events_stream) must produce IDENTICAL results from
either file — this is what broke streaming in round 3 when the
producer switched types."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from website_traffic_etl_gcp_spark.catalog import TABLES, load_table, table_path
from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def producer_dirs(tmp_path_factory):
    """Two copies of the sf0.001 dataset differing ONLY in events.ts
    physical type: int64 nanoseconds vs timestamp[us]."""
    base = tmp_path_factory.mktemp("producers")
    ev = pq.read_table(table_path(SF_DIR, "events"))
    ts = ev.column("ts").cast(pa.timestamp("us"))
    variants = {
        "nanos": ev.set_column(
            ev.schema.get_field_index("ts"),
            "ts",
            pc.multiply(ts.cast(pa.int64()), pa.scalar(1000, pa.int64())),  # µs → ns
        ),
        "micros": ev.set_column(ev.schema.get_field_index("ts"), "ts", ts),
    }
    dirs = {}
    for name, table in variants.items():
        d = base / name
        d.mkdir()
        pq.write_table(table, str(d / "events.parquet"))
        for t in TABLES:
            if t != "events":
                os.symlink(table_path(SF_DIR, t), str(d / f"{t}.parquet"))
        dirs[name] = str(d)
    return dirs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname",
    ["etl_traffic_transform", "sessionize_events", "daily_active_users"],
)
def test_batch_queries_identical_across_producers(spark, producer_dirs, qname):
    a = _rows(REGISTRY[qname].builder(spark, producer_dirs["nanos"]))
    b = _rows(REGISTRY[qname].builder(spark, producer_dirs["micros"]))
    assert a == b and len(a) > 0


def test_streaming_rollup_identical_across_producers(spark, producer_dirs):
    got = {}
    for name, d in producer_dirs.items():
        df = REGISTRY["streaming_hourly_counts"].builder(spark, d)
        got[name] = _rows(df)
    assert got["nanos"] == got["micros"] and len(got["nanos"]) > 0
