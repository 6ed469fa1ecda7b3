"""Dump `.explain("formatted")` for a list of registry queries.

Used to produce the r14 before/after plan evidence: run once from the
r13 worktree (before) and once from HEAD (after), writing
plans/r14/<query>_{before,after}.txt.

Usage: python scripts/dump_plans_r14.py <out_dir> <suffix> <q1,q2,...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark


def main() -> None:
    out_dir, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    names = [n.strip() for n in names_csv.split(",") if n.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = plans.REGISTRY[name]
        df = spec.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
