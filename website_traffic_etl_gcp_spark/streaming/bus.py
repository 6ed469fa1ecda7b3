"""A vendored message-bus-shaped streaming source: partitioned,
offset-addressed, sealed-segment NDJSON logs — the Kafka storage model
reduced to what a file-based transport can carry.

Layout (one topic):

    <bus_dir>/partition=K/part-*.txt     # sealed segments, 1 JSON msg/line
    <bus_dir>/partition=K/redelivered-*  # at-least-once twins (links)

Each message is ``{"partition": k, "offset": o, "key": user_id,
"ts_us": epoch_micros, "event_type": s, "value": v}`` with offsets
DENSE per partition — consumers dedup on (partition, offset), exactly
the Kafka consumer contract. The producer materializes the canonical
events table into the bus with Spark itself (partition = user_id %
N_PARTITIONS, offsets via a per-partition row_number — one shuffle,
executor-side writes; no driver loop), then plants a full set of
redelivered segment twins so every message arrives at least twice.

The consumer is an ordinary Structured Streaming file source over the
segment lines: readStream.text → from_json → event-time watermark →
``dropDuplicatesWithinWatermark`` on (partition, offset). State is
bounded by the watermark delay, not by topic history — the standard
watermark contract, which carries the standard watermark assumption:
dedup is guaranteed for redeliveries that arrive within the delay of
the first delivery's event time, and data later than the watermark is
dropped like in any watermarked pipeline. (The bounded availableNow
drain used by the registry queries sees everything in one batch, so
the assumption is trivially met there; a production deployment sizes
the delay to the bus's actual retry/lag bound.) Batches land through
the same exactly-once batch_id-keyed foreachBatch sink contract as
the other ingests (streaming/doc_ingest.py:58).
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from .rollups import run_to_completion

N_PARTITIONS = 8

MSG_SCHEMA = StructType(
    [
        StructField("partition", LongType()),
        StructField("offset", LongType()),
        StructField("key", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _scratch_root() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
    )


def bus_dir(sf_dir: str, topic: str = "events") -> str:
    # key by basename + a hash of the ABSOLUTE path: two corpora that
    # share a basename (pytest tmp dirs, testdata/sf1 vs .bigdata/sf1)
    # must not reuse each other's sealed bus
    src = os.path.abspath(sf_dir).rstrip("/")
    key = (
        f"{os.path.basename(src)}-"
        f"{hashlib.md5(src.encode()).hexdigest()[:8]}"
    )
    return os.path.join(_scratch_root(), "bus", key, topic)


def _source_stamp(sf_dir: str) -> str:
    """A freshness stamp of the events table (file count, total bytes,
    max mtime-ns) — a regenerated corpus under the same path must
    invalidate the sealed bus."""
    from ..catalog import table_path

    p = table_path(sf_dir, "events")
    files = (
        [p]
        if os.path.isfile(p)
        # recursive ** already matches the top level — one glob only,
        # or flat layouts would double-count every file in the stamp
        else sorted(
            glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
        )
    )
    n = total = newest = 0
    for f in files:
        try:
            st = os.stat(f)
        except FileNotFoundError:
            continue
        n += 1
        total += st.st_size
        newest = max(newest, st.st_mtime_ns)
    return f"{n}:{total}:{newest}"


def produce_events_bus(
    spark: SparkSession,
    sf_dir: str,
    at_least_once: bool = True,
    topic: str = "events",
) -> str:
    """Materialize the events table as a sealed bus topic (idempotent:
    keyed by sf_dir basename; rebuilt atomically via temp-dir rename).

    With ``at_least_once`` every sealed segment gets a redelivered
    twin (hard link), so the topic delivers each message exactly
    twice — the delivery model a correct consumer must collapse.
    """
    final = bus_dir(sf_dir, topic)
    stamp = _source_stamp(sf_dir)
    seal = os.path.join(final, "_SEALED")
    if os.path.exists(seal):
        try:
            with open(seal) as fh:
                if fh.read().strip() == stamp:
                    return final
        except OSError:
            pass
        shutil.rmtree(final, ignore_errors=True)  # stale: source changed
    tmp = f"{final}.tmp.{uuid.uuid4().hex[:8]}"
    ev = load_table(spark, sf_dir, "events")
    part = (F.col("user_id") % N_PARTITIONS).cast("long")
    w = Window.partitionBy("partition").orderBy("ts", "event_id")
    msgs = (
        ev.select(
            part.alias("partition"),
            F.col("user_id").alias("key"),
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
            "ts",
            "event_id",
        )
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .select(
            "partition",
            F.to_json(
                F.struct("partition", "offset", "key", "ts_us", "event_type", "value")
            ).alias("value"),
        )
    )
    msgs.write.mode("overwrite").partitionBy("partition").text(tmp)
    if at_least_once:
        for seg in glob.glob(os.path.join(tmp, "partition=*", "part-*")):
            if seg.endswith(".crc"):
                continue
            twin = os.path.join(
                os.path.dirname(seg), f"redelivered-{os.path.basename(seg)}"
            )
            os.link(seg, twin)
    # the _SUCCESS/. _* markers are hidden from the file source anyway
    with open(os.path.join(tmp, "_SEALED"), "w") as fh:
        fh.write(stamp + "\n")
    try:
        os.replace(tmp, final)  # atomic publish (rename over empty/absent)
    except OSError:
        # lost the publish race or a previous final dir exists: keep
        # the winner, drop our build
        if os.path.exists(os.path.join(final, "_SEALED")):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)
    return final


def read_bus_stream(spark: SparkSession, bus_path: str) -> DataFrame:
    """The consumer: a streaming scan of the sealed segments, parsed
    and event-timed. Pure map — partition/offset/ts all come from the
    message, so the plan is source-agnostic (a socket or queue source
    slots in by swapping this reader)."""
    raw = (
        spark.readStream.option("recursiveFileLookup", "true")
        .text(bus_path)
    )
    return (
        raw.select(F.from_json("value", MSG_SCHEMA).alias("m"))
        .select("m.*")
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )


def dedup_bus_messages(msgs: DataFrame, delay: str = "2 hours") -> DataFrame:
    """Exactly-once consumption of an at-least-once bus: drop
    (partition, offset) twins within the event-time watermark. State
    is O(messages per watermark window) per the engine's eviction —
    offset tracking that stays bounded on an unbounded topic, under
    the watermark assumption that a redelivery lands within ``delay``
    of its first delivery (size ``delay`` to the bus's retry bound;
    an availableNow drain satisfies it trivially)."""
    return msgs.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["partition", "offset"]
    )


def bus_ingest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the bus exactly-once and roll up per (partition, hour) —
    the rollup checks partition assignment AND dedup at once, since
    any surviving redelivery doubles a count."""
    path = produce_events_bus(spark, sf_dir)
    deduped = dedup_bus_messages(read_bus_stream(spark, path))
    landed = run_to_completion(
        deduped.select("partition", "ts", "value"), output_mode="append"
    )
    return landed.groupBy(
        "partition",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


def consume_bus_exactly_once(
    spark: SparkSession, sf_dir: str, out_path: str, ckpt: str
) -> None:
    """Land the deduped bus through the exactly-once foreachBatch
    contract: each micro-batch writes to its own batch_id-keyed subdir
    with overwrite, so an at-least-once foreachBatch retry REPLACES
    its prior output instead of appending (same contract as
    doc_ingest._write_batch)."""
    from .doc_ingest import _write_batch

    path = produce_events_bus(spark, sf_dir)
    deduped = dedup_bus_messages(read_bus_stream(spark, path))

    def land(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch(batch_df, out_path, batch_id)

    q = (
        deduped.writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


def read_bus_stream_with_meta(spark: SparkSession, bus_path: str) -> DataFrame:
    """The consumer with transport metadata: source partition comes
    from the segment path (the out-of-band metadata a real bus hands
    every record), so a message whose PAYLOAD is unparseable can still
    be attributed and dead-lettered instead of poisoning the stream.
    Adds ``src_partition`` (from the path) and ``is_poison`` (payload
    failed to parse or lacks the addressing fields)."""
    raw = (
        spark.readStream.option("recursiveFileLookup", "true")
        .text(bus_path)
        .withColumn(
            "src_partition",
            F.regexp_extract(F.input_file_name(), r"partition=(\d+)", 1)
            .cast("long"),
        )
    )
    m = F.from_json("value", MSG_SCHEMA)
    return raw.select(
        F.col("value").alias("raw"),
        "src_partition",
        m.alias("m"),
    ).select(
        "raw",
        "src_partition",
        "m.*",
        (
            F.col("m.partition").isNull()
            | F.col("m.offset").isNull()
            | F.col("m.ts_us").isNull()
        ).alias("is_poison"),
    )


def plant_poison_lines(bus_path: str) -> None:
    """Plant one deterministic non-JSON line per partition (plus its
    at-least-once twin) — the malformed-producer scenario a DLQ has to
    absorb. Idempotent."""
    for k in range(N_PARTITIONS):
        pdir = os.path.join(bus_path, f"partition={k}")
        if not os.path.isdir(pdir):
            continue
        p = os.path.join(pdir, "poison-0.txt")
        if not os.path.exists(p):
            with open(p, "w") as fh:
                fh.write(f"corrupt producer frame @partition {k} ###\n")
        twin = os.path.join(pdir, "poison-0-redelivered.txt")
        if not os.path.exists(twin):
            os.link(p, twin)


def bus_dlq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain a bus containing planted poison lines: good messages
    dedup on (partition, offset) exactly as the clean ingest; poison
    lines route to the dead-letter side keyed by the TRANSPORT
    partition and dedup by content (no offsets inside a frame that
    would not parse). Returns per-partition (n_events, n_poison_raw,
    n_poison_distinct) — proving the DLQ absorbed exactly the corrupt
    lines and lost no good rows. Uses its own topic dir so the clean
    streaming_bus_ingest contract stays byte-identical."""
    path = produce_events_bus(spark, sf_dir, topic="events_dlq")
    plant_poison_lines(path)
    msgs = read_bus_stream_with_meta(spark, path)
    good = dedup_bus_messages(
        msgs.filter(~F.col("is_poison")).withColumn(
            "ts", F.timestamp_micros("ts_us")
        )
    )
    landed_good = run_to_completion(
        good.select("partition", "value"), output_mode="append"
    )
    landed_poison = run_to_completion(
        msgs.filter(F.col("is_poison")).select("src_partition", "raw"),
        output_mode="append",
    )
    g = landed_good.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    p = landed_poison.groupBy(F.col("src_partition").alias("partition")).agg(
        F.count(F.lit(1)).alias("n_poison_raw"),
        F.countDistinct("raw").alias("n_poison_distinct"),
    )
    return g.join(p, "partition", "full").select(
        "partition",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_poison_raw", F.lit(0)).alias("n_poison_raw"),
        F.coalesce("n_poison_distinct", F.lit(0)).alias("n_poison_distinct"),
    )
