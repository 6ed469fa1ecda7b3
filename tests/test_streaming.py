"""Batch-equivalence for the streaming jobs: the streaming engine must
produce exactly what the batch operators produce on the same bounded
input."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.operators.sessionize import sessionize
from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())


def test_streaming_hourly_matches_batch(spark):
    stream_out = REGISTRY["streaming_hourly_counts"].builder(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    batch = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )
    cols = ["hour", "n_events", "value_sum"]
    assert _rows(stream_out, cols) == _rows(batch, cols)


def test_streaming_sessionize_matches_batch(spark):
    stream_out = REGISTRY["streaming_sessionize"].builder(spark, SF_DIR)
    batch = sessionize(load_table(spark, SF_DIR, "events"))
    cols = ["user_id", "session_start", "session_end", "n_events", "value_sum"]
    assert _rows(stream_out, cols) == _rows(batch, cols)
    # every user's latest session is flagged open, all others closed
    n_users = stream_out.select("user_id").distinct().count()
    assert stream_out.filter(F.col("is_open")).count() == n_users


def test_streaming_sessionize_incremental_batches(spark, tmp_path):
    """State must carry across micro-batches: split the events into two
    files, force one file per trigger, and require the merged final
    output (dedup provisional emissions by keeping the fullest session
    per (user, start)) to equal the batch operator."""
    from pyspark.sql.window import Window

    from website_traffic_etl_gcp_spark.streaming import rollups, sessions

    ev = load_table(spark, SF_DIR, "events")
    src = tmp_path / "ev_stream"
    # time-ordered split: first half of the month, then the rest —
    # sessions spanning the boundary must merge via state
    cut = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    ev.filter(F.col("event_id") <= cut).coalesce(1).write.parquet(
        str(src / "f1")
    )
    ev.filter(F.col("event_id") > cut).coalesce(1).write.parquet(
        str(src / "f2")
    )
    raw = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*/")
    )
    out = rollups.run_to_completion(
        sessions.sessionize_stream(
            raw.withColumn("ts", F.unix_micros("ts") * 1000)  # ns contract
        ),
        output_mode="append",
    )
    w = Window.partitionBy("user_id", "session_start").orderBy(
        F.col("n_events").desc(), F.col("session_end").desc()
    )
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "is_open")
    )
    batch = sessionize(ev)
    cols = ["user_id", "session_start", "session_end", "n_events", "value_sum"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_sessionize_chunks_arrive_out_of_order():
    """A group's rows reach ``session_func`` as MULTIPLE Arrow chunks
    in arbitrary order once the user's batch slice exceeds one record
    batch (~10k rows — routine at sf1). A later chunk holding EARLIER
    timestamps must not merge sessions the gap rule splits: the
    operator sorts the whole batch, not each chunk (regression: sf1
    sweep lost 12 sessions to per-chunk sorting)."""
    import pandas as pd

    from website_traffic_etl_gcp_spark.streaming.sessions import session_func

    class _State:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    def chunk(rows):  # rows: [(ts_sec, event_id, value)]
        return pd.DataFrame(
            {
                "user_id": [1] * len(rows),
                "event_id": [r[1] for r in rows],
                "ts": pd.Series(
                    [r[0] * 1_000_000_000 for r in rows], dtype="int64"
                ),
                "value": [r[2] for r in rows],
            }
        )

    # chunk 1 carries the LATER event; 10000 s gap >> the 1800 s rule
    chunks = [chunk([(10_000, 2, 1.0)]), chunk([(0, 1, 2.0)])]
    out = pd.concat(list(session_func((1,), iter(chunks), _State())))
    assert len(out) == 2, "gap-separated sessions merged across chunks"
    assert sorted(out["n_events"]) == [1, 1]
    closed = out[~out["is_open"]].iloc[0]
    assert closed["session_start"].startswith("1970-01-01 00:00:00")


def test_rate_source_demo_deterministic(spark):
    from website_traffic_etl_gcp_spark.streaming.rollups import run_rate_demo

    out = run_rate_demo(spark, rows_per_batch=1000, n_batches=3).collect()
    assert len(out) > 0
    total = sum(r["n_events"] for r in out)
    # rate-micro-batch emits exactly rows_per_batch rows per batch
    assert total == 3000
    types = {r["event_type"] for r in out}
    assert types == {"type_0", "type_1", "type_2", "type_3"}
    # deterministic timestamps (startTimestamp=0, 1 min per batch):
    # re-running must give the identical rollup
    out2 = run_rate_demo(spark, rows_per_batch=1000, n_batches=3).collect()
    key = lambda rows: sorted((r["minute"], r["event_type"], r["n_events"], r["value_sum"]) for r in rows)
    assert key(out) == key(out2)


def test_foreachbatch_upsert_idempotent(spark, tmp_path):
    from website_traffic_etl_gcp_spark.catalog import load_table
    from website_traffic_etl_gcp_spark.streaming.upsert import run_upsert_ingest

    tbl = str(tmp_path / "warehouse")
    n_original = load_table(spark, SF_DIR, "events").count()

    # first drain: input arrives twice (duplicated landing dir), upsert
    # must land each event exactly once
    out1 = run_upsert_ingest(spark, SF_DIR, tbl, checkpoint_dir=str(tmp_path / "c1"))
    assert out1.count() == n_original
    assert out1.select("event_id").distinct().count() == n_original

    # full redelivery (fresh checkpoint, same table): a no-op
    out2 = run_upsert_ingest(spark, SF_DIR, tbl, checkpoint_dir=str(tmp_path / "c2"))
    assert out2.count() == n_original


def test_streaming_minhash_ingest_matches_batch(spark):
    """The streaming admission-time probe must emit EXACTLY the batch
    incremental-minhash verdicts — same persisted index, same docs,
    different engine path."""
    from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

    stream_rows = {
        tuple(r)
        for r in REGISTRY["streaming_minhash_ingest"]
        .builder(spark, SF_DIR)
        .collect()
    }
    batch_rows = {
        tuple(r)
        for r in REGISTRY["dedup_incremental_minhash"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert stream_rows == batch_rows


def test_foreachbatch_write_is_idempotent_on_retry(spark, tmp_path):
    """A retried micro-batch (at-least-once foreachBatch) re-invokes
    _write_batch with the SAME batch_id — the keyed-overwrite write
    must replace its own prior output, never append duplicates."""
    from website_traffic_etl_gcp_spark.streaming.doc_ingest import _write_batch

    out = str(tmp_path / "verdicts")
    res = spark.range(5).withColumnRenamed("id", "doc_id")
    _write_batch(res, out, 3)
    _write_batch(res, out, 3)  # the retry
    got = (
        spark.read.option("recursiveFileLookup", "true").parquet(out).count()
    )
    assert got == 5
    _write_batch(res, out, 4)  # a different batch appends its own dir
    got = (
        spark.read.option("recursiveFileLookup", "true").parquet(out).count()
    )
    assert got == 10


def test_streaming_semdedup_ingest_deterministic_and_shaped(spark):
    """Two full drains must produce identical verdicts (deterministic
    quantized centroids + md5-free pure-math pipeline), every verdict
    row must be an odd (incoming) vec_id, and every dup_of an even
    (admitted) corpus id or the -1 sentinel."""
    rows1 = sorted(
        tuple(r)
        for r in REGISTRY["streaming_semdedup_ingest"]
        .builder(spark, SF_DIR)
        .collect()
    )
    rows2 = sorted(
        tuple(r)
        for r in REGISTRY["streaming_semdedup_ingest"]
        .builder(spark, SF_DIR)
        .collect()
    )
    assert rows1 == rows2
    assert len(rows1) > 0
    for vec_id, cell_id, dup_of, is_dup in rows1:
        assert vec_id % 2 == 1
        assert (dup_of == -1) == (not is_dup)
        if is_dup:
            assert dup_of % 2 == 0


def test_dq_router_quarantines_planted_violations(spark, tmp_path):
    """The oracle SFs are clean data, so the router's quarantine path
    passes vacuously there — this plants one violation per rule in a
    synthetic landing table and proves the streaming split actually
    routes: clean rows pass every rule, each planted row is counted
    under ITS rule, and totals conserve."""
    import datetime as dt

    from website_traffic_etl_gcp_spark.streaming.wap_ingest import (
        run_streaming_dq_router,
    )

    ok_ts = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, ok_ts, 10, "view", 1.0, None),  # clean
        (2, ok_ts, 11, "click", 0.0, None),  # clean
        (None, ok_ts, 12, "view", 1.0, None),  # null event_id
        (4, ok_ts, 13, "view", -5.0, None),  # negative value
        (5, ok_ts, 14, "teleport", 1.0, None),  # bad type
        (6, dt.datetime(2031, 1, 1), 15, "view", 1.0, None),  # bad ts
    ]
    sf_dir = str(tmp_path / "sfdq")
    (tmp_path / "sfdq").mkdir()
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events_stage")
    )
    # single-file table path, matching the canonical layout
    import glob
    import shutil

    part = glob.glob(str(tmp_path / "events_stage" / "part-*.parquet"))[0]
    shutil.copy(part, str(tmp_path / "sfdq" / "events.parquet"))

    report = {
        r["rule"]: r
        for r in run_streaming_dq_router(spark, sf_dir).collect()
    }
    assert report["event_id_not_null"]["n_violations"] == 1
    assert report["value_non_negative"]["n_violations"] == 1
    assert report["event_type_in_domain"]["n_violations"] == 1
    assert report["ts_in_range"]["n_violations"] == 1
    assert report["any_violation"]["n_violations"] == 4
    assert all(r["n_rows"] == 6 for r in report.values())
    assert not report["any_violation"]["passed"]


def test_streaming_admit_extends_state_across_batches(spark):
    """run_streaming_exact_admit (streaming/doc_ingest.py): the
    admitted-state sidecar must catch a duplicate whose twin arrived
    in an EARLIER micro-batch (neither in the base corpus) — the gap
    a static-index probe leaves open. The planted landing set (every
    25th odd doc cloned into a later id range) guarantees such pairs
    exist; 'corpus' rejections come from the persisted index."""
    from website_traffic_etl_gcp_spark.streaming.doc_ingest import (
        run_streaming_exact_admit,
    )
    from tests.conftest import SF_DIR

    out = run_streaming_exact_admit(spark, SF_DIR).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["dup_source"], []).append(r)
    assert len(by_src.get("corpus", [])) >= 5
    assert len(by_src.get("stream", [])) >= 5
    # every stream rejection's id sits in the clone range — its twin
    # (the original odd doc) landed in an earlier batch by id order
    originals = {r["doc_id"] for r in out if r["admitted"]}
    stream_ids = {r["doc_id"] for r in by_src["stream"]}
    assert stream_ids.isdisjoint(originals)
    assert all(not r["admitted"] for r in by_src["corpus"] + by_src["stream"])


def test_bus_is_at_least_once_and_offsets_dense(spark):
    """The produced bus delivers every message exactly twice, with
    dense per-partition offsets and partition = key % N_PARTITIONS."""
    from pyspark.sql import functions as F

    from website_traffic_etl_gcp_spark.catalog import load_table
    from website_traffic_etl_gcp_spark.streaming import bus

    path = bus.produce_events_bus(spark, SF_DIR)
    n_events = load_table(spark, SF_DIR, "events").count()
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(path)
        .select(F.from_json("value", bus.MSG_SCHEMA).alias("m"))
        .select("m.*")
    )
    assert raw.count() == 2 * n_events
    uniq = raw.dropDuplicates(["partition", "offset"])
    assert uniq.count() == n_events
    bad_part = uniq.filter(
        F.col("partition") != F.col("key") % bus.N_PARTITIONS
    ).count()
    assert bad_part == 0
    # dense offsets: per partition, max(offset) == count - 1 and
    # distinct(offset) == count
    per = uniq.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("offset").alias("mx"),
        F.countDistinct("offset").alias("nd"),
    )
    assert per.filter((F.col("mx") != F.col("n") - 1) | (F.col("nd") != F.col("n"))).count() == 0


def test_bus_foreachbatch_sink_exactly_once(spark, tmp_path):
    """End-to-end: at-least-once bus -> watermarked offset dedup ->
    batch_id-keyed foreachBatch sink. Landed rows equal the original
    events exactly once, and a simulated batch retry is idempotent."""
    from website_traffic_etl_gcp_spark.catalog import load_table
    from website_traffic_etl_gcp_spark.streaming import bus

    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    bus.consume_bus_exactly_once(spark, SF_DIR, out, ckpt)
    landed = spark.read.option("recursiveFileLookup", "true").parquet(out)
    n_events = load_table(spark, SF_DIR, "events").count()
    assert landed.count() == n_events
    assert landed.dropDuplicates(["partition", "offset"]).count() == n_events
    # the retry: rewrite one batch dir with the same keyed-overwrite
    # contract — totals must not change
    import glob as _glob
    import os as _os

    first = sorted(_glob.glob(_os.path.join(out, "batch-*")))[0]
    src = spark.read.parquet(first)
    # materialize before overwriting the dir the plan would lazily scan
    replay = spark.createDataFrame(src.collect(), src.schema)
    batch_id = int(_os.path.basename(first).split("-")[1])
    replay.write.mode("overwrite").parquet(
        _os.path.join(out, f"batch-{batch_id:08d}")
    )
    again = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert again.count() == n_events


def test_bus_seal_invalidates_on_source_change(spark, tmp_path):
    """A regenerated corpus under the same path must rebuild the
    sealed bus — and two corpora sharing a basename must not collide."""
    import os

    from pyspark.sql import functions as F

    from website_traffic_etl_gcp_spark.streaming import bus

    def make_corpus(root, n):
        os.makedirs(root, exist_ok=True)
        spark.range(n).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(F.col("id") * 1000000 + 1600000000000000).alias("ts"),
            (F.col("id") % 5).alias("user_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, "events.parquet")
        )

    sf_a = str(tmp_path / "corpus_a" / "sfX")
    sf_b = str(tmp_path / "corpus_b" / "sfX")  # SAME basename
    make_corpus(sf_a, 10)
    make_corpus(sf_b, 20)
    path_a = bus.produce_events_bus(spark, sf_a)
    path_b = bus.produce_events_bus(spark, sf_b)
    assert path_a != path_b  # basename collision keyed apart
    n_a = spark.read.option("recursiveFileLookup", "true").text(path_a).count()
    n_b = spark.read.option("recursiveFileLookup", "true").text(path_b).count()
    assert (n_a, n_b) == (20, 40)  # 2x delivery of 10 vs 20 messages

    # regenerate corpus A with more rows: the stale seal must rebuild
    make_corpus(sf_a, 15)
    path_a2 = bus.produce_events_bus(spark, sf_a)
    assert path_a2 == path_a
    n_a2 = spark.read.option("recursiveFileLookup", "true").text(path_a).count()
    assert n_a2 == 30


def test_bus_unbounded_drain_lifecycle(spark, tmp_path):
    """The production drain shape: a processing-time-triggered consumer
    left running while NEW segments (including a redelivery of an old
    message) arrive mid-stream. The ledger must show multiple batches
    with monotone per-partition offsets, and the cross-batch redelivery
    must be dropped by the watermarked dedup state."""
    import json
    import os
    import time

    from website_traffic_etl_gcp_spark.streaming import bus

    topic = str(tmp_path / "topic")
    os.makedirs(os.path.join(topic, "partition=0"))

    def msg(offset, ts_us):
        return json.dumps(
            {
                "partition": 0,
                "offset": offset,
                "key": 1,
                "ts_us": ts_us,
                "event_type": "view",
                "value": 1.0,
            }
        )

    base = 1_700_000_000_000_000
    with open(os.path.join(topic, "partition=0", "seg-0.txt"), "w") as fh:
        fh.write("\n".join(msg(i, base + i * 1_000_000) for i in range(5)) + "\n")

    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    ledger = str(tmp_path / "progress.jsonl")
    q = bus.consume_bus_unbounded(
        spark, topic, out, ckpt, ledger, delay="1 hour"
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.exists(ledger) and len(open(ledger).readlines()) >= 1:
                break
            time.sleep(0.3)
        # second segment lands MID-STREAM: three new offsets plus a
        # redelivery of offset 2 (event time well within the watermark)
        with open(os.path.join(topic, "partition=0", "seg-1.txt"), "w") as fh:
            fh.write(
                "\n".join(
                    [msg(i, base + i * 1_000_000) for i in (5, 6, 7)]
                    + [msg(2, base + 2_000_000)]
                )
                + "\n"
            )
        while time.time() < deadline:
            if sum(
                e["n_rows"] for e in bus.read_progress_ledger(ledger)
            ) >= 8:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(30)

    # the ledger is append-only (a foreachBatch retry appends a second
    # line for its batch_id): read through the canonical collapse —
    # last line per batch_id — before summing anything
    entries = bus.read_progress_ledger(ledger)
    assert len(entries) >= 2, entries  # genuinely multi-batch
    assert sum(e["n_rows"] for e in entries) == 8  # redelivery dropped
    # the collapse itself: a planted duplicate batch_id line must be
    # superseded by the later (authoritative) line, not double-counted
    with open(ledger) as fh:
        raw_head = fh.readline()
    with open(ledger, "a") as fh:
        fh.write(raw_head)  # replay batch 0's original line, "retry"
    collapsed = bus.read_progress_ledger(ledger)
    assert [e["batch_id"] for e in collapsed] == [
        e["batch_id"] for e in entries
    ]
    assert sum(e["n_rows"] for e in collapsed) == 8
    # offset progress is monotone nondecreasing across the ledger
    seen = -1
    for e in entries:
        mx = e["max_offset"].get("0", seen)
        assert mx >= seen
        seen = mx
    assert seen == 7
    landed = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert landed.count() == 8
    assert landed.dropDuplicates(["partition", "offset"]).count() == 8


def test_bus_tmp_gc_and_span_delay(spark, tmp_path):
    """Crashed-builder tmp dirs older than the grace window are swept
    on the next produce; fresh ones survive. The seal's second line
    carries the event-time span and bus_span_delay derives a delay
    covering it."""
    import os
    import time

    from pyspark.sql import functions as F

    from website_traffic_etl_gcp_spark.streaming import bus

    sf = str(tmp_path / "sfY")
    os.makedirs(sf)
    spark.range(10).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.col("id") * 600_000_000 + 1_600_000_000_000_000
        ).alias("ts"),  # 0..90 min span
        (F.col("id") % 3).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    final = bus.bus_dir(sf)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    stale = f"{final}.tmp.deadbeef"
    fresh = f"{final}.tmp.cafecafe"
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - bus.TMP_GRACE_SECONDS - 60
    os.utime(stale, (old, old))

    path = bus.produce_events_bus(spark, sf)
    assert not os.path.exists(stale), "stale tmp dir not swept"
    assert os.path.exists(fresh), "fresh tmp dir must survive the sweep"

    # span = 9 * 600s = 5400s; delay = span + margin
    assert bus.bus_span_delay(path, margin_s=3600) == "9000 seconds"
    assert bus.bus_span_delay(str(tmp_path / "nope")) == "2 hours"


def test_streaming_web_prefilter_equals_batch(spark):
    """The streaming pre-filter chain is a stateless map, so a bounded
    drain must equal the batch chain row-for-row."""
    from website_traffic_etl_gcp_spark.plans.streaming_plans import (
        streaming_web_prefilter,
    )
    from website_traffic_etl_gcp_spark.plans.web import web_prefilter_chain

    from .conftest import SF_DIR

    got = {
        r["doc_id"]: r
        for r in streaming_web_prefilter(spark, SF_DIR).collect()
    }
    want = {
        r["doc_id"]: r for r in web_prefilter_chain(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (got[k], want[k])
    assert any(r["reason"] == "blocked_domain" for r in want.values())


def test_progress_ledger_tolerates_torn_final_line(tmp_path):
    """A crash mid-append leaves a torn (non-JSON) trailing line —
    exactly the recovery scenario the ledger exists for. The reader
    must skip it and return the intact prefix, not abort (ADVICE r13:
    only OSError was caught; a torn line raised JSONDecodeError)."""
    from website_traffic_etl_gcp_spark.streaming import bus

    ledger = str(tmp_path / "progress.jsonl")
    with open(ledger, "w") as fh:
        fh.write('{"batch_id": 0, "n_rows": 3}\n')
        fh.write('{"batch_id": 1, "n_rows": 5}\n')
        fh.write('{"batch_id": 2, "n_ro')  # torn mid-append, no newline
    entries = bus.read_progress_ledger(ledger)
    assert [e["batch_id"] for e in entries] == [0, 1]
    assert sum(e["n_rows"] for e in entries) == 8
    # a line that parses but lacks batch_id is equally skipped
    with open(ledger, "a") as fh:
        fh.write('ws\n{"no_batch": true}\n{"batch_id": 2, "n_rows": 1}\n')
    entries = bus.read_progress_ledger(ledger)
    assert [e["batch_id"] for e in entries] == [0, 1, 2]
