"""Persisted incremental-dedup indexes.

The production shape of incremental ingest dedup: the corpus-side
fingerprint / minhash-band index is built ONCE, written as a bucketed
table on the probe key, and every subsequent ingest batch joins
against it with NO exchange on the (100 TB) index side — only the
small batch shuffles into the index's bucket layout. The in-query
variants in plans/documents.py re-derived the index per run; this
module is the "build once, probe many" path on top of
sources/bucketing.py.

Index tables are EXTERNAL under a scratch root (default
``$TMPDIR/wtes_dedup_index``) so they work regardless of the
session's warehouse-dir writability, and are registered
rebuild-if-missing: the catalog check is session-scoped, so a fresh
session rebuilds from the current corpus (no cross-run staleness),
while repeated probes within a session hit the existing table.

Band keys are folded to a SINGLE column (``band_id`` =
``band_idx:band_key``) so the bucketed join needs exactly one join
key: Spark's exchange elimination requires the bucket column to cover
the join keys, and a composite (band_idx, band_key) join over a table
bucketed by band_key alone re-shuffles both sides.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texthash import normalize_text
from ..sources.bucketing import write_bucketed
from . import dedup as dd

INDEX_BUCKETS = 8


def _scratch_root() -> str:
    """Explicit ``WTES_INDEX_DIR`` = deliberately shared (a real
    deployment points it at durable storage). The DEFAULT is keyed by
    pid: index builds rmtree-and-rewrite their table path, so two
    unrelated processes defaulting to one shared tmp root would race
    each other's builds (observed as a transient oracle mismatch when
    two test runs overlapped). Per-process default keeps the
    build-once-probe-many reuse within a session without cross-process
    hazard."""
    return os.environ.get(
        "WTES_INDEX_DIR",
        os.path.join(tempfile.gettempdir(), f"wtes_dedup_index_{os.getpid()}"),
    )


def index_table_name(kind: str, corpus_key: str) -> str:
    """Stable per-(kind, corpus) table name — the corpus key (e.g. the
    sf_dir path) is hashed so distinct corpora never share a table."""
    h = hashlib.md5(corpus_key.encode()).hexdigest()[:10]
    return f"wtes_{kind}_idx_{h}"


def _table_path(table_name: str) -> str:
    return os.path.join(_scratch_root(), table_name)


# ---- exact fingerprint index -------------------------------------------


def exact_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text(text_col)).alias("fingerprint"),
    )


def build_exact_index(
    corpus_fp: DataFrame, table_name: str, n_buckets: int = INDEX_BUCKETS
) -> None:
    """(fingerprint, canonical_id) bucketed by fingerprint. One
    hash-groupBy over the corpus, paid once."""
    index = corpus_fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id")
    )
    write_bucketed(
        index,
        table_name,
        "fingerprint",
        n_buckets=n_buckets,
        sort_col="fingerprint",
        path=_table_path(table_name),
    )


def ensure_exact_index(
    corpus_fp: DataFrame, table_name: str, n_buckets: int = INDEX_BUCKETS
) -> None:
    if not corpus_fp.sparkSession.catalog.tableExists(table_name):
        build_exact_index(corpus_fp, table_name, n_buckets)


def probe_exact_index(
    spark: SparkSession, batch_fp: DataFrame, table_name: str
) -> DataFrame:
    """Ingest-batch probe: left join on the index's bucket key. The
    index side scans in place (Bucketed: true, no Exchange); only the
    batch shuffles into the bucket layout."""
    index = spark.table(table_name)
    return batch_fp.join(index, "fingerprint", "left").select(
        "doc_id",
        "fingerprint",
        "canonical_id",
        F.col("canonical_id").isNotNull().alias("is_dup_of_existing"),
    )


# ---- minhash band index ------------------------------------------------


def _banded(sigs: DataFrame) -> DataFrame:
    """minhash_bands with the composite key folded to one column."""
    return dd.minhash_bands(sigs).select(
        "doc_id",
        F.concat_ws(":", F.col("band_idx").cast("string"), "band_key").alias(
            "band_id"
        ),
    )


def build_minhash_index(
    corpus_sigs: DataFrame, bands_table: str, sigs_table: str,
    n_buckets: int = INDEX_BUCKETS,
) -> None:
    """Two bucketed tables: (band_id, matched_id) on band_id for
    candidate generation, and the raw signatures on doc_id for the
    agreement scoring join — both exchange-free on the corpus side at
    probe time."""
    bands = _banded(corpus_sigs).select(
        "band_id", F.col("doc_id").alias("matched_id")
    )
    write_bucketed(
        bands,
        bands_table,
        "band_id",
        n_buckets=n_buckets,
        sort_col="band_id",
        path=_table_path(bands_table),
    )
    write_bucketed(
        corpus_sigs,
        sigs_table,
        "doc_id",
        n_buckets=n_buckets,
        sort_col="doc_id",
        path=_table_path(sigs_table),
    )


def ensure_minhash_index(
    corpus_sigs: DataFrame, bands_table: str, sigs_table: str,
    n_buckets: int = INDEX_BUCKETS,
) -> None:
    cat = corpus_sigs.sparkSession.catalog
    if not (cat.tableExists(bands_table) and cat.tableExists(sigs_table)):
        build_minhash_index(corpus_sigs, bands_table, sigs_table, n_buckets)


def probe_minhash_index(
    spark: SparkSession,
    batch_sigs: DataFrame,
    bands_table: str,
    sigs_table: str,
) -> DataFrame:
    """(doc_id, matched_id, n_hash_agree, est_jaccard) for batch docs
    sharing any minhash band with an indexed corpus doc. Shuffle cost
    is O(batch × bands): the band probe and the corpus-signature
    lookup both read bucketed tables in place."""
    cand = (
        _banded(batch_sigs)
        .join(spark.table(bands_table), "band_id")
        .select("doc_id", "matched_id")
        .distinct()
    )
    corpus_sigs = spark.table(sigs_table)
    agree = None
    for i in range(dd.MINHASH_K):
        term = F.when(
            F.col(f"n.h{i}") == F.col(f"e.h{i}"), F.lit(1)
        ).otherwise(F.lit(0))
        agree = term if agree is None else agree + term
    return (
        cand.join(batch_sigs.alias("n"), cand.doc_id == F.col("n.doc_id"))
        .join(corpus_sigs.alias("e"), cand.matched_id == F.col("e.doc_id"))
        .select(
            cand.doc_id,
            cand.matched_id,
            agree.cast("bigint").alias("n_hash_agree"),
            (agree.cast("double") / F.lit(float(dd.MINHASH_K))).alias(
                "est_jaccard"
            ),
        )
    )
