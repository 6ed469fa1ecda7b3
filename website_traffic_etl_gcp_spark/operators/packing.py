"""Sequence packing: concat-and-chunk document → context-window binning.

The standard LLM pretraining layout concatenates documents in a fixed
order and cuts the token stream at context-length boundaries. The
distributed form is a prefix-sum: each doc's stream offset is the
cumulative token count of its predecessors within its pack group, and
its bin is ``offset div cap``. A doc whose span crosses a boundary
belongs to the bin its FIRST token falls in (exactly how the
concat-then-chunk tokenizer writer behaves — the tail spills into the
next chunk at materialization time).

Scale: the window partitions by pack group (source here). Groups are
the unit of sequential packing, so at 100 TB you bound group size
upstream (shard hot sources into source#k subgroups) — the window then
never sees an unbounded partition. Integer arithmetic throughout:
bit-identical across engines and shuffle orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CAP = 512


def pack_offsets(
    df: DataFrame,
    n_tokens: Column,
    cap: int = DEFAULT_CAP,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-doc packing assignment: (id, group, n_tokens, stream_offset,
    bin_id). Deterministic order: docs pack by ascending id within
    their group."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # materialize n_tokens BEFORE the window so the token-count source
    # column (the full text) is projected away ahead of the shuffle —
    # otherwise Catalyst keeps it alive to recompute the count after
    # the exchange and ships every document body through the wire
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        n_tokens.cast("bigint").alias("n_tokens"),
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        F.col(id_col),
        F.col(group_col),
        F.col("n_tokens"),
        offset.alias("stream_offset"),
    ).withColumn(
        # integer div, never float: offsets can exceed double's exact
        # integer range on a real token stream
        "bin_id",
        F.expr(f"stream_offset div {int(cap)}"),
    )


def pack_bins(packed: DataFrame) -> DataFrame:
    """Roll the per-doc assignment up to bins: docs per bin and the
    token fill (SUM of member tokens — boundary-crossing tails make
    fill exceed cap by at most one doc's overflow, the concat-chunk
    contract)."""
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )
