"""Distributed BPE vocabulary learning.

Byte-pair-encoding merge training re-expressed for Spark's execution
model. The textbook algorithm is inherently iterative (count adjacent
symbol pairs → merge the most frequent → re-segment → repeat), which
naively means N passes over the corpus. The scale insight — the same
one real BPE trainers (sentencepiece, HF tokenizers) use — is that
segmentation is a function of the WORD, not the word instance: one
corpus-linear aggregation to (distinct word, count) up front, and
every merge round after that runs on the bounded distinct-word table
(vocabulary-sized, corpus-size-INDEPENDENT — the 100 TB corpus and
the 100 GB corpus train on the same few-million-row word table).

Round structure (the PageRank shape from dup_graph_pagerank):
pair-count groupBy over the word table → deterministic argmax
(count DESC, then lexicographic (l, r) — an integer/string compare,
no floats) collected as ONE driver row → merge applied as a literal
``replace`` → ``localCheckpoint`` to truncate the growing expression
lineage (the repo's measured ~1.5 s/round re-analysis cost on
iterative plans).

Determinism / oracle exactness: re-segmentation is DEFINED as
leftmost non-overlapping replacement of the space-delimited pair —
``replace(' ' || seg || ' ', ' l r ', ' lr ')`` — which Spark and
DuckDB implement identically, so the learned merge table has an EXACT
cross-engine oracle (plans/selection.py unrolls the same rounds as
CTEs). For runs of ≥3 identical symbols this deviates from HF
tokenizers' strict left-to-right re-scan: the replace scanner resumes
AFTER each replaced span and the shared boundary space blocks the
adjacent match, so one round merges only the leading pair of a run
('aaaa' → 'aa a a'; later rounds may pick the rest up). A fixed,
documented, engine-exact convention — pinned in tests/test_bpe.py —
while the merge-SELECTION rule itself is textbook BPE.

Reference: JosephGillData/website_traffic-etl-gcp has no tokenizer
surface; this extends the engine's LLM-data family (SURVEY.md §2D)
alongside ``tokenizer_fertility_by_lang``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import word_tokens

N_MERGES = 12


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n): distinct normalized words with instance counts —
    the ONLY corpus-scale aggregation in BPE training."""
    return (
        docs.select(F.explode(word_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def initial_segmentation(words: DataFrame) -> DataFrame:
    """(word, n, seg): each word exploded to space-joined characters
    — the round-0 symbol sequence."""
    return words.select(
        "word",
        "n",
        F.array_join(
            F.filter(F.split("word", ""), lambda x: x != ""), " "
        ).alias("seg"),
    )


def pair_counts(segs: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent-symbol pair counts weighted by word
    frequency. Shuffle is O(distinct pairs) — bounded by the symbol
    vocabulary, not the corpus."""
    toks = F.split("seg", " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("l"),
                F.element_at(toks, i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))
    return (
        segs.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def top_pair(pc: DataFrame):
    """The deterministic merge choice: highest count, ties broken by
    lexicographic (l, r). One driver row — bounded state."""
    rows = (
        pc.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
    )
    return rows[0] if rows else None


def apply_merge(segs: DataFrame, left: str, right: str) -> DataFrame:
    """Leftmost non-overlapping replacement of the pair — the defined
    (engine-exact) re-segmentation convention."""
    padded = F.concat(F.lit(" "), F.col("seg"), F.lit(" "))
    merged = F.replace(
        padded,
        F.lit(f" {left} {right} "),
        F.lit(f" {left}{right} "),
    )
    return segs.select("word", "n", F.trim(merged).alias("seg"))


# Checkpoint cadence for the merge loop: each localCheckpoint is an
# EXTRA materialization job per round, while a stacked `replace` chain
# on the (materialized, vocabulary-bounded) word table re-evaluates in
# microseconds per job. Checkpointing every CHECKPOINT_EVERY rounds
# keeps the lineage bounded (the r11-measured plan-reanalysis blowup
# only bites on unbounded chains) and cuts the per-round fixed job
# overhead that dominates this corpus-size-independent loop (r14 A/B).
# Round arithmetic is UNCHANGED: pair_counts at round k sees the exact
# same segmentation values whether materialized or recomputed.
CHECKPOINT_EVERY = 4


def train_merges(
    docs: DataFrame, n_merges: int = N_MERGES
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """(merge table rows, final segmentation). Each round is one
    groupBy + one 1-row collect on the word table; a localCheckpoint
    every CHECKPOINT_EVERY rounds keeps the iterative plan flat."""
    segs = initial_segmentation(word_counts(docs)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        best = top_pair(pair_counts(segs))
        if best is None:
            break
        merges.append((k, best["l"], best["r"], best["cnt"]))
        segs = apply_merge(segs, best["l"], best["r"])
        if k % CHECKPOINT_EVERY == 0:
            segs = segs.localCheckpoint()
    return merges, segs
