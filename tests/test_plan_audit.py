"""Physical-plan audit across the ENTIRE registry: no query may plan a
non-broadcast cartesian product — the one join shape that cannot
survive a scale-up (its output is |A|×|B| with no pruning lever).
Broadcast nested-loop joins against provably tiny sides (centroids,
scalar aggregates, bounded probe sets) are legitimate and allowed."""

from __future__ import annotations

import pytest

from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

from .conftest import SF_DIR

# streaming queries execute the stream inside the builder — their plan
# is the materialized result's, so a plan audit is meaningless (and
# slow); they're covered by batch-equivalence/oracle checks instead
_SKIP = {name for name, spec in REGISTRY.items() if "streaming" in spec.tags}


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in _SKIP)
)
def test_no_cartesian_product(spark, name):
    df = REGISTRY[name].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name} plans a non-broadcast cartesian product"
    )
