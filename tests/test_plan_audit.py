"""Physical-plan audit across the ENTIRE registry: no query may plan a
non-broadcast cartesian product — the one join shape that cannot
survive a scale-up (its output is |A|×|B| with no pruning lever) —
nor a SHUFFLED nested-loop join (every non-equi combine must ride a
broadcast of its provably tiny side). Broadcast nested-loop joins
against tiny sides (centroids, scalar aggregates, bounded probe sets)
are legitimate and allowed."""

from __future__ import annotations

import re

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
    # any NestedLoopJoin must be the Broadcast kind (a shuffled NLJ is
    # a cartesian product wearing a different name)
    bad_nlj = [
        m
        for m in re.finditer(r"\w*NestedLoopJoin", plan)
        if not m.group().startswith("Broadcast")
    ]
    assert not bad_nlj, f"{name} plans a non-broadcast nested-loop join"
    # Python in a plan must be Arrow-batched (ArrowEvalPython,
    # MapInPandas, FlatMapGroupsInPandas...) — BatchEvalPython is the
    # pickled row-at-a-time path, 10-100x slower in a hot loop
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF"
    )
