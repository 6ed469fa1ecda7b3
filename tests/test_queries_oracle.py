"""The t2 gate, locally: every registered query with an oracle must
match DuckDB exactly (columns, row count, values) at sf0.001 and the
driver's sf0.01. Rows-only queries must at least run and keep a stable
schema."""

from __future__ import annotations

import pytest

from website_traffic_etl_gcp_spark import plans

from .conftest import SF_DIR, SF_DIR_ORACLE, assert_frames_match, register_views

SPECS = list(plans.REGISTRY.values())


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_sf0001(spark, duck, spec):
    df = spec.builder(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # runs, schema resolvable
        return
    register_views(duck, SF_DIR)
    assert_frames_match(df, duck.sql(spec.oracle), spec.name)


@pytest.mark.slow
@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_sf001(spark, duck, spec):
    if spec.oracle is None:
        pytest.skip("rows-only query")
    df = spec.builder(spark, SF_DIR_ORACLE)
    register_views(duck, SF_DIR_ORACLE)
    assert_frames_match(df, duck.sql(spec.oracle), spec.name)
