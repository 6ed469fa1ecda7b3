"""foreachBatch upsert sink: exactly-once warehouse loads from an
at-least-once stream.

Structured Streaming's file sink is append-only; redelivered input or
a restarted query duplicates rows. The standard fix is ``foreachBatch``
with a MERGE-style upsert: dedupe the batch on the key, anti-join
against the existing table, append only genuinely new keys. Every
batch write is then idempotent — replaying the whole stream against a
populated table is a no-op — which is the property checkpoint recovery
relies on. On a lakehouse table format this body becomes a real MERGE
INTO; on plain parquet the anti-join plays that role.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .rollups import (
    duplicated_stream_source_dir,
    read_events_stream,
)

__all__ = ["run_upsert_ingest"]


def run_upsert_ingest(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    key: str = "event_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain the (deliberately duplicated) events landing dir into
    ``table_path`` via foreachBatch upsert; returns the final table.
    Pass a FRESH ``checkpoint_dir`` to simulate full redelivery (with
    the same checkpoint, the source itself skips processed files and
    the upsert path isn't exercised)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([key])
        if Path(table_path).is_dir():
            existing = batch_df.sparkSession.read.parquet(table_path).select(key)
            batch = batch.join(existing, key, "left_anti")
        batch.write.mode("append").parquet(table_path)

    ev = read_events_stream(
        spark, sf_dir, duplicated_stream_source_dir(sf_dir, "events")
    )
    q = (
        ev.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or str(Path(table_path).with_name(Path(table_path).name + "_ckpt")),
        )
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(table_path)
