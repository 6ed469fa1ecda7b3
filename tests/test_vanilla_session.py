"""Session-robustness gate: the whole query surface must work under a
SparkSession the repo did NOT build (grading drivers, notebooks,
spark-submit with foreign conf). A subprocess is the only honest way
to get one — in-process builders inherit the tuned JVM/conf state.

Guards against any session.py conf silently becoming load-bearing
(round-1 failure: nanosAsLong was only set in get_spark(), so every
events read died under the driver's vanilla session)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# One query per input surface: events (nanos parquet), lineitem/orders
# (relational), documents (text), embeddings (arrays), multimodal
# (binary + mapInPandas), plus one through the real streaming engine.
PROBE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("vanilla").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
# prove we really are vanilla: the nanos conf is unset at this point
assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None

import __spark_entry__ as E
qs = E.queries()
sf = "/root/testdata/sf0.001"
for name in [
    "sessionize_events",          # events: TIMESTAMP(NANOS) read
    "etl_traffic_transform",      # reference-parity transform
    "q1_pricing_summary",         # lineitem
    "dedup_exact",                # documents
    "knn_bruteforce_cosine",      # embeddings
    "multimodal_metadata",        # binary payloads
    "streaming_hourly_counts",    # streaming source (explicit schema)
]:
    n = qs[name](spark, sf).count()
    print(f"{{name}}: {{n}}")
    assert n >= 0
df = E.entry(spark)
assert df.count() >= 0
print("VANILLA-OK")
spark.stop()
"""


def test_vanilla_session_runs_query_surface():
    proc = subprocess.run(
        [sys.executable, "-c", PROBE.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA-OK" in proc.stdout
