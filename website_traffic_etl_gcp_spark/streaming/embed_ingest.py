"""Streaming EMBEDDING ingest probing the persisted IVF index —
admission-time SEMANTIC dedup, the vector-space twin of
``doc_ingest`` (which probes the MinHash band index).

The production arrival path for an embedded corpus: vectors land as
files, and each micro-batch is checked for cosine-near duplicates
against the existing corpus BEFORE admission. Per batch the work is
O(batch × k) centroid assignment (the packed map-side argmin — no
shuffle) plus a keyed join against ONE cell's stored members per
incoming vector: the corpus side reads the bucketed IVF cell table in
place with its precomputed norms, never recomputing or reshuffling —
which is what makes admission-time semantic dedup affordable when the
corpus is 100 TB and the batch is megabytes.

Batches write to batch_id-keyed subdirs with overwrite (exactly-once
verdicts under at-least-once foreachBatch execution, same contract as
doc_ingest), and the centroids are the EXACT integer-quantized
label means, so a SQL oracle recomputes the entire pipeline —
assignment, cell membership, and verdicts — bit-identically.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_path
from ..functions.vectors import dot
from ..operators import ann_index as ai
from ..operators import similarity as sim
from .doc_ingest import _write_batch
from .rollups import stream_source_dir

__all__ = ["run_streaming_semdedup_ingest"]


def _scratch(sf_dir: str) -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "stream_semdedup",
        os.path.basename(sf_dir.rstrip("/")),
        uuid.uuid4().hex[:12],
    )


def run_streaming_semdedup_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain the embeddings landing dir through the streaming engine,
    checking each micro-batch (the odd-vec_id "new" vectors, mirroring
    the batch incremental split) against the even-id corpus's
    persisted IVF index. Returns (vec_id, cell_id, dup_of,
    is_semantic_dup) — the dedup_semantic_cells verdict shape
    restricted to incoming vectors, dup candidates restricted to the
    ADMITTED corpus (a production admission check compares against
    what's already in, not against other arrivals in flight)."""
    from ..plans.embeddings import SEMDEDUP_TAU, _quantized_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    cells_t = ai.index_table_name("semcells", sf_dir)
    cents_t = ai.index_table_name("semcents", sf_dir)
    ai.ensure_ivf_index(
        corpus, _quantized_centroids(corpus), cells_t, cents_t
    )

    root = _scratch(sf_dir)
    out_path = os.path.join(root, "verdicts")
    ckpt = os.path.join(root, "ckpt")

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.filter(F.col("vec_id") % 2 == 1)
        # packed map-side argmin against the stored centroid table —
        # renamed qcell so the stored-attribute equality below can't
        # fold trivially-true (see ann_index.probe_ivf_index)
        asg = sim.assign_cells(
            incoming,
            spark.table(cents_t).select("cell_id", "centroid"),
            1,
        ).withColumnRenamed("cell_id", "qcell")
        members = spark.table(cells_t)  # (cell_id, cand_id, cv, nc)
        pair_cos = F.round(
            dot(F.col("embedding"), F.col("cv"))
            / (F.col("__vn") * F.col("nc")),
            6,
        )
        dup = (
            asg.join(members, F.col("qcell") == F.col("cell_id"))
            .filter(pair_cos >= SEMDEDUP_TAU)
            .groupBy("vec_id")
            .agg(F.min("cand_id").alias("dup_of"))
        )
        verdict = (
            asg.select("vec_id", F.col("qcell").alias("cell_id"))
            .join(dup, "vec_id", "left")
            .select(
                "vec_id",
                "cell_id",
                F.coalesce(F.col("dup_of"), F.lit(-1))
                .cast("bigint")
                .alias("dup_of"),
                F.col("dup_of").isNotNull().alias("is_semantic_dup"),
            )
        )
        _write_batch(verdict, out_path, batch_id)

    schema = spark.read.parquet(table_path(sf_dir, "embeddings")).schema
    stream = spark.readStream.schema(schema).parquet(
        stream_source_dir(sf_dir, "embeddings")
    )
    q = (
        stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.awaitTermination()
        out = spark.read.option("recursiveFileLookup", "true").parquet(
            out_path
        )
        # small verdict set: collect and rebuild so the returned frame
        # has no lineage into the scratch deleted below
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
