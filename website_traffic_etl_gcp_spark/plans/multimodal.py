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
