"""Streaming document ingest probing the PERSISTED dedup index.

The production arrival path for a training corpus: documents land as
files, and each micro-batch is near-dup-checked against the existing
corpus's persisted MinHash band index (operators/dedup_index.py — the
same bucketed tables the batch incremental query probes) BEFORE
admission. Per batch the work is O(batch × bands): the batch's
signatures probe the band table, candidates score against the stored
signature table, and the corpus side never shuffles or recomputes —
this is what makes admission-time dedup affordable when the corpus is
100 TB and the batch is megabytes.

``foreachBatch`` materializes each batch's verdicts to a
batch_id-keyed parquet subdir with overwrite (the file sink can't run
a multi-join batch plan; foreachBatch is the standard escape hatch).
Checkpointing makes redelivered FILES no-ops at the source level, and
the keyed-overwrite write makes retried BATCHES replace their own
output — together, exactly-once verdicts under at-least-once
execution.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_path
from ..operators import dedup as dd
from ..operators import dedup_index as di
from .rollups import stream_source_dir

__all__ = ["run_streaming_minhash_ingest"]


def _scratch(sf_dir: str) -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "stream_minhash",
        os.path.basename(sf_dir.rstrip("/")),
        uuid.uuid4().hex[:12],
    )


def _reap_at_exit(path: str) -> None:
    """Delete a scratch dir at interpreter exit: the returned verdict
    frame reads it lazily for the rest of the session, so an eager
    delete would leave the frame scanning a missing source."""
    import atexit

    atexit.register(shutil.rmtree, path, ignore_errors=True)


def _write_batch(res: DataFrame, out_path: str, batch_id: int) -> None:
    """foreachBatch is at-least-once per batch: a retry after the
    write but before the checkpoint commit re-runs this batch_id.
    Writing each batch to its own batch_id-keyed subdir with overwrite
    makes the retry REPLACE its own output instead of appending
    duplicate verdict rows (the oracle emits DISTINCT pairs, so blind
    append would break parity)."""
    res.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch-{batch_id:08d}")
    )


def run_streaming_minhash_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain the documents landing dir through the streaming engine,
    probing each micro-batch (the odd-doc_id "new" docs, mirroring the
    batch incremental split) against the even-id corpus's persisted
    band index. Returns (doc_id, matched_id, n_hash_agree,
    est_jaccard) — identical to the batch incremental minhash
    semantics, so the same SQL oracle checks it."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = dd.minhash_signatures(docs)
    existing = sigs.filter(F.col("doc_id") % 2 == 0)
    bands_t = di.index_table_name("mhbands", sf_dir)
    sigs_t = di.index_table_name("mhsigs", sf_dir)
    di.ensure_minhash_index(existing, bands_t, sigs_t)

    root = _scratch(sf_dir)
    out_path = os.path.join(root, "verdicts")
    ckpt = os.path.join(root, "ckpt")

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.filter(F.col("doc_id") % 2 == 1)
        batch_sigs = dd.minhash_signatures(incoming)
        res = di.probe_minhash_index(
            batch_df.sparkSession, batch_sigs, bands_t, sigs_t
        )
        _write_batch(res, out_path, batch_id)

    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    # recursiveFileLookup: the landing entry may be a directory of
    # part files (derived tables) rather than one parquet file
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(stream_source_dir(sf_dir, "documents"))
    )
    q = (
        stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    # return the written verdicts AS a distributed frame — no driver
    # collect/rebuild round-trip. The checkpoint is deleted now (the
    # run is complete); the verdict parquet must outlive this call
    # since the returned frame scans it lazily, so it is reaped at
    # process exit instead.
    shutil.rmtree(ckpt, ignore_errors=True)
    _reap_at_exit(root)
    return spark.read.option("recursiveFileLookup", "true").parquet(out_path)
