"""§2F — Multimodal plumbing query: binary payload + Arrow-batched
metadata extraction (the decode itself is a deterministic fake here —
codec libs absent; see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import multimodal as mm
from .registry import register


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(16 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 512
                AS INT) AS width,
           CAST(16 + (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) // 512)
                % 512 AS INT) AS height
    FROM documents
    """,
    tags=("multimodal",),
    doc="Binary payload column + typed metadata via mapInPandas (Arrow "
    "batches, hashlib checksum, deterministic fake decode). The oracle "
    "reproduces the md5-derived metadata in SQL, proving the Python "
    "batch path computes exactly what the declarative spec says.",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.extract_metadata(mm.with_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, 1 + octet_length(encode(text)) % 4))
                AS BIGINT) AS frame_idx,
           md5(text || ':' ||
               CAST(unnest(range(0, 1 + octet_length(encode(text)) % 4))
                    AS VARCHAR)) AS frame_checksum,
           CAST(224 AS INT) AS width,
           CAST(224 AS INT) AS height
    FROM documents
    """,
    tags=("multimodal",),
    doc="Frame sampling: one payload row fans out to 1..4 frame rows "
    "through a generator mapInPandas (the one-to-many batch shape of "
    "video decode), each frame carrying a deterministic checksum and "
    "the resize-target dims. operators/multimodal.py:sample_frames.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.sample_frames(mm.with_payload(docs))


@register(
    "multimodal_resize_dims",
    oracle=f"""
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(GREATEST(1, (w * {mm.RESIZE_BOX}) // GREATEST(w, h)) AS INT)
               AS out_w,
           CAST(GREATEST(1, (h * {mm.RESIZE_BOX}) // GREATEST(w, h)) AS INT)
               AS out_h
    FROM (
        SELECT doc_id,
               16 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 512 AS w,
               16 + (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) // 512)
                   % 512 AS h
        FROM documents
    )
    """,
    tags=("multimodal",),
    doc=f"Image-resize plumbing: fake-decode dims from the payload, "
    f"aspect-preserving integer fit into a {mm.RESIZE_BOX}px box (long "
    "side pinned, short side floor-scaled — no float scale factor, so "
    "the SQL twin is bit-exact). One-row-in/one-row-out mapInPandas; "
    "the pixel resample itself is the stubbed codec step. "
    "operators/multimodal.py:resize_dims/aspect_fit.",
)
def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.resize_dims(mm.with_payload(docs))


@register(
    "multimodal_audio_chunks",
    oracle=f"""
    SELECT doc_id,
           chunk_idx,
           CAST(length(substr(text,
                CAST(chunk_idx * {mm.CHUNK_CHARS} + 1 AS INT),
                {mm.CHUNK_CHARS})) AS BIGINT) AS chunk_len,
           md5(substr(text,
                CAST(chunk_idx * {mm.CHUNK_CHARS} + 1 AS INT),
                {mm.CHUNK_CHARS})) AS chunk_md5
    FROM (
        SELECT doc_id, text,
               CAST(unnest(range(0, GREATEST(1,
                    CAST(ceil(length(text) / {mm.CHUNK_CHARS}.0) AS BIGINT))))
                    AS BIGINT) AS chunk_idx
        FROM documents
    )
    """,
    tags=("multimodal",),
    doc=f"Audio-segmentation plumbing: each payload fans out to "
    f"ceil(len/{mm.CHUNK_CHARS}) fixed-window chunk rows with per-chunk "
    "checksums through a generator mapInPandas (unbounded fan-out, "
    "never driver-side). Chunk boundaries are in the decoded character "
    "domain so the SQL twin reproduces them; a real audio pipeline "
    "slices the sample domain with identical plumbing. "
    "operators/multimodal.py:chunk_payload.",
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.chunk_payload(mm.with_payload(docs))


@register(
    "multimodal_dedup_phash",
    oracle=f"""
    WITH items AS (
        SELECT doc_id AS item_id, text FROM documents
        UNION ALL
        SELECT doc_id + {mm.REENCODE_OFFSET}, text FROM documents
        WHERE doc_id % {mm.REENCODE_MOD} = 0
    )
    SELECT MIN(item_id) AS canonical_id,
           MAX(item_id) AS dup_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM items
    GROUP BY md5(text) HAVING COUNT(*) >= 2
    ORDER BY 1
    """,
    tags=("multimodal", "dedup"),
    doc="Container-invariant media dedup — the binary-column twin of "
    "dedup_exact: a mixed-format landing corpus (every doc as "
    "container A, every 20th AGAIN as a byte-different container-B "
    "re-encode) dedupes on the CONTENT hash computed after the "
    "Arrow-batched decode step (operators/multimodal.py:"
    "content_phash), so re-encodes of the same media collide while "
    "byte-level hashing would miss every one of them. One "
    "hash-groupBy after a pure map — the dedup_exact scale shape; a "
    "real perceptual hash (pHash/aHash over decoded pixels) slots "
    "into the same batch point, and near-dup banding over hash bits "
    "reuses the SimHash machinery. The oracle recomputes dup groups "
    "from CONTENT (not the planted list): on corpora with natural "
    "exact duplicates — the derived sf1 tables have 80 such groups — "
    "both engines must find them identically.",
)
def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    hashed = mm.content_phash(mm.with_containers(docs))
    return (
        hashed.groupBy("phash")
        .agg(
            F.min("item_id").alias("canonical_id"),
            F.max("item_id").alias("dup_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
        .select("canonical_id", "dup_id", "n_copies")
        .orderBy("canonical_id")
    )
