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


# how many top pairs one batch-selection collect scans; bounds the
# driver row count (BATCH_SCAN rows per barrier instead of 1)
BATCH_SCAN = 32


def top_batch(pc: DataFrame, max_len: int, scan: int = BATCH_SCAN):
    """A PREFIX of the sequential merge choices derivable from ONE
    pair-count snapshot — the argmax plus every immediately-following
    top pair provably unaffected by the merges before it (r15: one
    driver barrier per batch instead of per merge round).

    Soundness, from the snapshot ordered (cnt DESC, l, r):

    - Merging (l, r) only DECREASES counts of other existing pairs
      (occurrences at merge sites are consumed) and CREATES pairs
      containing the new symbol lr. A created pair's count is bounded
      by a snapshot neighbor: cnt(x, lr) ≤ cnt(x, l) (a snapshot pair
      whose RIGHT symbol is l) and cnt(lr, y) ≤ cnt(r, y) (LEFT
      symbol r).
    - A candidate p taken CONSECUTIVELY after the current batch is
      therefore still the sequential argmax at its round iff (a) its
      symbols are disjoint from every batch pair's (disjointness
      means no batch merge touches any of p's occurrences, so
      cnt(p) — including the recorded merge-table count — is
      EXACTLY its snapshot value), and (b) cnt(p) STRICTLY exceeds
      every possible created-pair count: the max snapshot cnt over
      pairs q (∉ batch) with q.r ∈ {batch lefts} or q.l ∈ {batch
      rights}, and the snapshot truncation floor when ``scan`` rows
      were collected (an uncollected pair's cnt is ≤ the last
      collected cnt). Strictness guards the lexicographic tie-break.
    - A self-pair (l == l) creates pairs bounded by its OWN count
      ('a a a' → 'aa a' creates (aa, a) ≤ cnt(a, a)), which no later
      candidate can strictly beat — the batch closes after it.
    - The first candidate that fails any check STOPS the batch
      (skipping it would reorder the tie-break); the sequential
      per-round argmax resumes from a fresh snapshot next batch.

    Every sequence of batches is bit-identical to the per-round
    top_pair loop (pinned in tests/test_bpe.py on adversarial planted
    corpora and by the unchanged round-unrolled oracle)."""
    rows = (
        pc.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(scan)
        .collect()
    )
    if not rows:
        return []
    floor = rows[-1]["cnt"] if len(rows) == scan else 0
    batch = [rows[0]]
    syms = {rows[0]["l"], rows[0]["r"]}
    lefts = {rows[0]["l"]}
    rights = {rows[0]["r"]}
    if rows[0]["l"] == rows[0]["r"]:
        return batch[:max_len]
    for p in rows[1:]:
        if len(batch) >= max_len:
            break
        if p["l"] in syms or p["r"] in syms:
            break
        # batch members can never satisfy the sharing predicate (they
        # are pairwise symbol-disjoint) and neither can p (it just
        # passed the disjointness check), so no exclusions are needed
        created_bound = max(
            [floor]
            + [
                q["cnt"]
                for q in rows
                if q["r"] in lefts or q["l"] in rights
            ]
        )
        if p["cnt"] <= created_bound:
            break
        batch.append(p)
        syms |= {p["l"], p["r"]}
        lefts.add(p["l"])
        rights.add(p["r"])
        if p["l"] == p["r"]:
            break
    return batch


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
    """(merge table rows, final segmentation). One groupBy + one
    bounded collect per BATCH of provably-independent merges (see
    ``top_batch`` — the r14 loop paid the barrier per merge; the
    measured corpus batches 12 rounds into ~6 collects), merges
    applied as stacked replace projections, a localCheckpoint every
    CHECKPOINT_EVERY merges keeping the iterative plan flat. The
    merge table is bit-identical to the per-round argmax loop."""
    segs = initial_segmentation(word_counts(docs)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    k = 0
    while k < n_merges:
        batch = top_batch(pair_counts(segs), max_len=n_merges - k)
        if not batch:
            break
        for best in batch:
            k += 1
            merges.append((k, best["l"], best["r"], best["cnt"]))
            segs = apply_merge(segs, best["l"], best["r"])
            if k % CHECKPOINT_EVERY == 0:
                segs = segs.localCheckpoint()
    return merges, segs
