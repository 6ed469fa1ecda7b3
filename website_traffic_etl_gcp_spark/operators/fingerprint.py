"""Sampled document fingerprints: winnowing and content-defined chunks.

Two classic fingerprint schemes that complement the dedup tiers in
``operators/dedup.py`` (which hash EVERY shingle or the whole doc):

- **Winnowing** (Schleimer, Wilkerson, Aiken — SIGMOD 2003, the MOSS
  algorithm): slide a window of ``WINNOW_WINDOW`` consecutive shingle
  hashes and keep each window's minimum (rightmost on ties).  The
  selected ~``2/(w+1)`` fraction of shingles is a deterministic,
  position-robust sample that GUARANTEES any shared substring of at
  least ``w + K - 1`` tokens contributes one common fingerprint — so
  overlap detection runs on ~1/3 of the shingle volume with no recall
  loss for long matches.

- **Content-defined chunking** (the gear/rolling-hash scheme behind
  LBFS/rsync-style dedup): cut a document after token ``j`` whenever
  the hash of the ``K``-token window ending at ``j`` is ``0 (mod
  CDC_DIVISOR)``.  Boundaries depend only on local content, so
  inserting or deleting a token reshapes at most the surrounding
  chunk and the chunk stream re-synchronizes — unlike the fixed-stride
  windows of ``plans/documents.py:chunk_stream``, where one insertion
  shifts every later chunk hash.  Chunk hashes are the insertion-robust
  join key for cross-doc duplicate-span detection.

Both schemes hash via md5 prefixes (``functions/texthash.py``) so the
DuckDB oracles in ``plans/documents.py`` compute bit-identical values.

Scale shape (the 100 TB contract): everything is one narrow explode
plus windows PARTITIONED BY doc_id — shuffle volume O(tokens), no
pairwise work, no driver collects.  The winnowing min-window and the
CDC running cut-count reuse the same per-doc sort, and the encoded
(hash, position) min trick keeps tie-breaking inside whole-stage
codegen instead of a struct comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import md5_long, normalize_text
from .textstats import SHINGLE_K

# Winnowing: guarantee window (in shingles) and hash width.  The
# 36-bit hash (9 md5 hex chars) packs with a 24-bit position
# complement into one int64: supports docs up to 2^24 tokens
# (~16.7M — far beyond any pre-chunked training doc) with zero
# collision between (hash, pos) pairs inside a doc.
WINNOW_WINDOW = 4
WINNOW_HASH_HEX = 9  # 36-bit shingle hash
_POS_MOD = 1 << 24

# Content-defined chunking: expected chunk length = CDC_DIVISOR tokens
# (geometric), window = SHINGLE_K tokens.
CDC_DIVISOR = 16


def positional_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, shingle, m) — ALL word-``SHINGLE_K``-gram
    shingles with their 1-based position and the doc's shingle count
    ``m``; whole normalized text as the single shingle for docs
    shorter than ``SHINGLE_K`` tokens.  Unlike
    ``textstats.exploded_shingles`` this keeps positions and
    multiplicity — winnowing needs the full positional stream."""
    from ..functions.partitioning import widen_narrow_input

    # fan a narrow scan out before the normalize/split/explode map
    # stage (no-op on wide inputs; see functions/partitioning.py)
    base = widen_narrow_input(df).select(
        F.col(id_col).alias("doc_id"),
        normalize_text(text_col).alias("norm"),
    ).withColumn("n_tok", F.size(F.split("norm", " ")))
    long_docs = base.filter(F.col("n_tok") >= SHINGLE_K)
    tok = long_docs.select(
        "doc_id",
        F.col("n_tok"),
        F.posexplode(F.split("norm", " ")).alias("pos0", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos0")
    # K-generic gram build: lead columns derived from SHINGLE_K so a
    # change to the shared spec constant can't desync the gram width
    # from the length filter / multiplicity arithmetic below
    leads = [F.col("token")] + [
        F.lead("token", i).over(w) for i in range(1, SHINGLE_K)
    ]
    grams = (
        tok.select(
            "doc_id", "n_tok", "pos0", F.concat_ws(" ", *leads).alias("shingle"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("bigint").alias("pos"),
            "shingle",
            (F.col("n_tok") - SHINGLE_K + 1).cast("bigint").alias("m"),
        )
    )
    short = base.filter(F.col("n_tok") < SHINGLE_K).select(
        "doc_id",
        F.lit(1).cast("bigint").alias("pos"),
        F.col("norm").alias("shingle"),
        F.lit(1).cast("bigint").alias("m"),
    )
    return grams.unionByName(short)


def winnow_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sel_pos, sel_hash) — the winnowing fingerprint set.

    For every window of ``WINNOW_WINDOW`` consecutive shingle
    positions, select the minimum 36-bit shingle hash, breaking ties
    toward the RIGHTMOST position (the Schleimer et al. rule, which
    minimizes the selected-set size).  Ties are resolved inside one
    int64 ``min``: ``hash * 2^24 + (2^24 - 1 - pos)`` orders first by
    hash, then by DESCENDING position.  Docs with fewer than ``w``
    shingles contribute their single whole-window minimum.

    One explode + two windows partitioned by doc_id (shared sort) +
    one distinct keyed by doc — shuffle O(shingles), fully
    whole-stage-codegen arithmetic."""
    sh = positional_shingles(df, id_col, text_col)
    h = F.conv(F.substring(F.md5("shingle"), 1, WINNOW_HASH_HEX), 16, 10).cast(
        "bigint"
    )
    enc = sh.select(
        "doc_id",
        "pos",
        "m",
        (h * _POS_MOD + (F.lit(_POS_MOD - 1) - F.col("pos"))).alias("combined"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_WINDOW - 1), 0)
    )
    picked = (
        enc.withColumn("winmin", F.min("combined").over(w))
        # full windows only; a doc with m < w has exactly one window,
        # ending at its last shingle
        .filter(F.col("pos") >= F.least(F.lit(WINNOW_WINDOW), F.col("m")))
        .select(
            "doc_id",
            (F.lit(_POS_MOD - 1) - (F.col("winmin") % _POS_MOD)).alias(
                "sel_pos"
            ),
            # integer div — float `/` would lose bits on 60-bit values
            F.expr(f"winmin div {_POS_MOD}").cast("bigint").alias("sel_hash"),
        )
        .distinct()
    )
    return picked


def cdc_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_idx, start_pos, end_pos, n_tokens, chunk_hash) —
    content-defined chunks over the normalized token stream.

    A cut falls AFTER token ``j`` (j >= SHINGLE_K) when the 60-bit md5
    hash of the ``SHINGLE_K``-token window ending at ``j`` is
    divisible by ``CDC_DIVISOR``; expected chunk length is
    ``CDC_DIVISOR`` tokens.  ``chunk_hash`` is the md5 of the chunk's
    space-joined tokens — the insertion-robust dedup key.

    Plan: explode + lag windows and a running cut-count share one
    doc_id sort (single window exchange), then one groupBy
    (doc_id, chunk_idx) rebuilds chunk text via a sorted struct
    collect.  Shuffle O(tokens); chunks are ~CDC_DIVISOR tokens so
    per-group state is tiny."""
    from ..functions.partitioning import widen_narrow_input

    base = widen_narrow_input(df).select(
        F.col(id_col).alias("doc_id"),
        normalize_text(text_col).alias("norm"),
    )
    tok = base.select(
        "doc_id", F.posexplode(F.split("norm", " ")).alias("pos0", "token")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "token"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    wtext = F.concat_ws(
        " ", *[F.lag("token", SHINGLE_K - 1 - i).over(w) for i in range(SHINGLE_K)]
    )
    cut = (
        (F.col("pos") >= SHINGLE_K)
        & (md5_long(wtext) % CDC_DIVISOR == 0)
    ).cast("int")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    chunked = (
        tok.withColumn("cut", cut)
        .withColumn(
            "chunk_idx",
            F.coalesce(F.sum("cut").over(wprev), F.lit(0)).cast("bigint"),
        )
    )
    return (
        chunked.groupBy("doc_id", "chunk_idx")
        .agg(
            F.min("pos").alias("start_pos"),
            F.max("pos").alias("end_pos"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "token"))
                        ),
                        lambda s: s["token"],
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )
