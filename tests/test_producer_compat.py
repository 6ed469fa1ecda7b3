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
    """Copies of the sf0.001 dataset differing ONLY in events.ts
    physical type: annotated TIMESTAMP(NANOS) — the actual round-1/2
    producer shape, which pyarrow reports as timestamp[ns], NOT int64 —
    raw unannotated int64 nanoseconds, and TIMESTAMP(MICROS)."""
    base = tmp_path_factory.mktemp("producers")
    ev = pq.read_table(table_path(SF_DIR, "events"))
    i = ev.schema.get_field_index("ts")
    ts = ev.column("ts").cast(pa.timestamp("us"))
    ns_int = pc.multiply(ts.cast(pa.int64()), pa.scalar(1000, pa.int64()))
    variants = {
        "nanos_ts": ev.set_column(i, "ts", ts.cast(pa.timestamp("ns"))),
        "nanos_int64": ev.set_column(i, "ts", ns_int),
        "micros": ev.set_column(i, "ts", ts),
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
    results = {
        name: _rows(REGISTRY[qname].builder(spark, d))
        for name, d in producer_dirs.items()
    }
    baseline = results["micros"]
    assert len(baseline) > 0
    for name, rows in results.items():
        assert rows == baseline, f"{qname} differs for producer {name}"


def test_streaming_rollup_identical_across_producers(spark, producer_dirs):
    got = {
        name: _rows(REGISTRY["streaming_hourly_counts"].builder(spark, d))
        for name, d in producer_dirs.items()
    }
    assert len(got["micros"]) > 0
    for name, rows in got.items():
        assert rows == got["micros"], f"streaming differs for producer {name}"


def test_custom_source_dir_sniffs_its_own_footer(spark, producer_dirs, tmp_path):
    """read_events_stream(sf_dir, source_dir=...) must sniff the ts
    physical type from the ACTUAL source dir, not the canonical
    events table: here the canonical table is TIMESTAMP(MICROS) but
    the landing dir holds TIMESTAMP(NANOS) files — a canonical-footer
    sniff would declare a micros schema against nanos longs and
    corrupt every timestamp by 1000×."""
    from website_traffic_etl_gcp_spark.streaming import rollups

    land = tmp_path / "landing"
    land.mkdir()
    os.symlink(
        os.path.join(producer_dirs["nanos_ts"], "events.parquet"),
        str(land / "events.parquet"),
    )
    stream = rollups.read_events_stream(spark, SF_DIR, str(land))
    got = _rows(
        rollups.run_to_completion(rollups.hourly_counts(stream))
    )
    want = _rows(REGISTRY["streaming_hourly_counts"].builder(spark, SF_DIR))
    assert len(got) > 0
    assert got == want


def test_empty_source_dir_falls_back_to_canonical_schema(spark, tmp_path):
    """A stream started before the first file lands has nothing to
    sniff — the declared schema must fall back to the canonical
    table's footer instead of crashing."""
    from website_traffic_etl_gcp_spark.streaming import rollups

    land = tmp_path / "empty_landing"
    land.mkdir()
    stream = rollups.read_events_stream(spark, SF_DIR, str(land))
    assert stream.isStreaming
    assert "ts" in stream.columns
