"""Data-quality expectations: declarative rule checks in ONE pass.

The deequ/dbt-test shape: each expectation is (name, violation
predicate); the checker turns the rule list into one aggregation with
a conditional count per rule — a single scan regardless of rule count,
map-side combinable — and emits a long-form report
(rule, n_violations, n_rows, pass). Uniqueness-style rules that need a
groupBy run as their own aggregation and union into the same report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """``rules`` maps rule name → VIOLATION predicate (true = bad row).
    Returns (rule, n_violations, n_rows, passed) — one row per rule,
    computed in one scan."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for name, pred in rules.items():
        aggs.append(F.count(F.when(pred, 1)).alias(name))
    row = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(name).alias("n_violations"),
            )
            for name in rules
        ]
    )
    return (
        row.select(F.col("__n").alias("n_rows"), F.explode(per_rule).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_violations").alias("n_violations"),
            "n_rows",
            (F.col("r.n_violations") == 0).alias("passed"),
        )
    )


def event_row_rules() -> dict[str, Column]:
    """The events table's ROW-LOCAL violation predicates — shared by
    the batch gate (plans/events.py:dq_events_expectations) and the
    streaming quarantine router (streaming/wap_ingest.py) so the two
    paths can never drift. Key-uniqueness is deliberately absent: it
    is not row-local, so an arrival-time router cannot decide it."""
    return {
        "event_id_not_null": F.col("event_id").isNull(),
        "value_non_negative": F.col("value").isNotNull()
        & (F.col("value") < 0),
        "event_type_in_domain": ~F.col("event_type").isin(
            "view", "click", "purchase", "signup", "error"
        ),
        "ts_in_range": (
            F.col("ts") < F.lit("2020-01-01").cast("timestamp")
        )
        | (F.col("ts") >= F.lit("2030-01-01").cast("timestamp")),
    }


def expect_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Uniqueness expectation: counts rows participating in a duplicate
    key group. Same report schema as :func:`expect`."""
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("n_violations"))
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    # 1-row side: broadcast so the combine never plans as a shuffled NLJ
    return dup_rows.crossJoin(F.broadcast(total)).select(
        F.lit(name).alias("rule"),
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )
