"""Unigram-LM tokenizer (SentencePiece-style), re-expressed Spark-first.

Kudo 2018 ("Subword Regularization") trains a tokenizer by EM over a
substring vocabulary: the E-step segments the corpus under current
piece scores, the M-step re-estimates scores from the segmentation.
This module implements the deterministic hard-EM (Viterbi) round with
EXACT cross-engine semantics — the same design contract as the BPE
trainer (operators/bpe.py) and the ridge classifier
(operators/quality_model.py): every intermediate value is an integer,
so the DuckDB oracle reproduces segmentations and counts bit-for-bit.

Pipeline shape (everything after step 1 is VOCABULARY-sized, never
corpus-sized — the BPE precedent):

1. **Distinct words** — one corpus-linear aggregation to
   ``(word, c)``; all later work is over the distinct-word table.
   Words longer than ``MAX_WORD_LEN`` are excluded from training
   (SentencePiece's max-sentencepiece-length analogue, documented and
   mirrored by the oracle).
2. **Seed vocabulary** — all substrings of length 1..MAX_PIECE_LEN,
   frequency = Σ word-count × (overlapping occurrences in the word).
   The vocab keeps every single character (coverage guarantee: any
   word is segmentable) plus the top ``VOCAB_MULTI`` multi-char
   pieces by ``(f DESC, piece ASC)``.
3. **Scores** — piece cost in integer micro-nats:
   ``cost(p) = mn(F_tot) − mn(f_p)`` with ``mn(x) = round(ln(x)·1e6)``
   and ``F_tot = Σ f`` over the chosen vocab (unigram-LM negative
   log-prob, integer-exact).
4. **Viterbi DP** — per word over positions 0..len:
   ``best[i] = min over j∈[i−MAX_PIECE_LEN, i) of
   (best[j].cost + cost(word[j+1..i]), best[j].np + 1, j)`` ordered
   lexicographically by ``(cost, np, j)`` — the j-ascending tie-break
   prefers the LONGER last piece, deterministically on both engines.
   Positions unroll as MAX_WORD_LEN fixed steps (the classifier's
   unrolled-solver precedent); single-char coverage makes every
   position reachable.
5. **Backtrace** — reconstruct the argmin path into a space-joined
   piece string per word (MAX_WORD_LEN more fixed steps).
6. **M-step** — piece Viterbi counts ``n = Σ c(word) × uses`` and the
   re-estimated probability ``n / N_tot`` (single int→double
   division): one hard-EM round.

Scale: step 1 is the only corpus pass; the DP tables hold ≤ one row
per (distinct word, position) — thousands of rows — and the M-step is
a groupBy over vocabulary-sized data. At 100 TB nothing beyond the
first aggregation grows with the corpus.

Reference: JosephGillData/website_traffic-etl-gcp has no tokenizer
training; this extends the engine's LLM-data surface (SURVEY.md §2D)
alongside bpe_train_merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_PIECE_LEN = 4  # P: longest candidate piece
MAX_WORD_LEN = 16  # W: words longer than this sit training out
VOCAB_MULTI = 48  # multi-char pieces kept (plus ALL single chars)
PIECE_MISS = 10**12  # sentinel cost for out-of-vocab pieces (micro-nats)


def distinct_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c) over the normalized corpus — the one corpus pass."""
    from ..functions.partitioning import (
        CPU_HEAVY_MIN_PARTITION_BYTES,
        widen_narrow_input,
    )
    from ..functions.texthash import word_tokens

    return (
        widen_narrow_input(
            docs, min_partition_bytes=CPU_HEAVY_MIN_PARTITION_BYTES
        )
        .select(F.explode(word_tokens(text_col)).alias("word"))
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= MAX_WORD_LEN)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def _mn(col: F.Column) -> F.Column:
    """round(ln(x)·1e6) as int64 — the engine-portable log unit."""
    return F.round(F.log(col) * F.lit(1e6), 0).cast("bigint")


def seed_vocab(words: DataFrame) -> DataFrame:
    """(piece, f, cost_micro): all single chars + top VOCAB_MULTI
    multi-char substrings by (f DESC, piece ASC); integer micro-nat
    costs under the seed unigram LM."""
    # every (start, length) substring occurrence, weighted by word count
    occs = words.select(
        "c",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(MAX_PIECE_LEN),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda l: F.substring(F.col("word"), i, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    freqs = occs.groupBy("piece").agg(F.sum("c").alias("f"))
    singles = freqs.filter(F.length("piece") == 1)
    w = Window.orderBy(F.col("f").desc(), F.col("piece"))
    multis = (
        freqs.filter(F.length("piece") >= 2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= VOCAB_MULTI)
        .drop("rk")
    )
    vocab = singles.unionByName(multis)
    tot = vocab.agg(F.sum("f").alias("f_tot"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        "f",
        (_mn(F.col("f_tot")) - _mn(F.col("f"))).alias("cost_micro"),
    )


def viterbi_segment(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, c, n_pieces, cost_micro, pieces) — the exact Viterbi
    segmentation of every distinct word under the vocab costs, pieces
    space-joined in order (a token can never contain the space
    delimiter — tokens come from whitespace splitting).

    The ENTIRE DP runs IN-ROW as one ``F.aggregate`` expression over
    the word's positions, with the vocabulary shipped as a literal
    map (bounded driver state — the kmeans centroid-literal
    precedent): ``dp[i] = array_min`` over the last MAX_PIECE_LEN
    parents, struct ordering (cost, np, bp) giving the deterministic
    lexicographic tie-break. One map stage over the distinct-word
    table — no per-position joins, no iterative lineage, no shuffle.
    A second in-row aggregate walks the backpointers into the ordered
    piece string. Out-of-vocab pieces cost the PIECE_MISS sentinel
    (see step), so dp entries are never null even at positions no
    vocab path reaches."""
    rows = vocab.select("piece", "cost_micro").collect()  # vocab-sized
    pairs: list = []
    for r in sorted(rows, key=lambda r: r["piece"]):
        pairs.append(F.lit(r["piece"]))
        pairs.append(F.lit(int(r["cost_micro"])))
    cmap = F.create_map(*pairs)

    word = F.col("word")
    n = F.length("word")
    init = F.array(
        F.struct(
            F.lit(0).cast("bigint").alias("cost"),
            F.lit(0).cast("int").alias("np"),
            F.lit(0).cast("int").alias("bp"),
        )
    )

    def step(acc, i):
        # candidate parents: piece = word[k .. i], parent dp = acc[k]
        # (1-based: acc[k] holds position k-1), bp = k-1. A piece
        # missing from the vocab coalesces to the PIECE_MISS sentinel
        # instead of NULL (null structs NPE inside codegen array_min),
        # so every dp entry is non-null and any real path — cost
        # ≤ MAX_WORD_LEN·ln(F_tot)·1e6 ≪ sentinel — always wins. A
        # truly unsegmentable word (never the case for the registry
        # vocabs: round 1 keeps all single chars, round 2 keeps the
        # word's own round-1 pieces) surfaces as cost ≥ PIECE_MISS.
        cands = F.transform(
            F.sequence(
                F.greatest(F.lit(1), i - F.lit(MAX_PIECE_LEN) + 1), i
            ),
            lambda k: F.struct(
                (
                    F.element_at(acc, k)["cost"]
                    + F.coalesce(
                        F.element_at(
                            cmap, F.substring(word, k, i - k + 1)
                        ),
                        F.lit(PIECE_MISS),
                    )
                ).alias("cost"),
                (F.element_at(acc, k)["np"] + 1).cast("int").alias("np"),
                (k - 1).cast("int").alias("bp"),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    scored = words.select(
        "word",
        "c",
        n.alias("n"),
        F.aggregate(F.sequence(F.lit(1), n), init, step).alias("dp"),
    )

    def walk(acc, _):
        cur = F.element_at(F.col("dp"), acc["pos"] + 1)
        return F.when(
            acc["pos"] > 0,
            F.struct(
                cur["bp"].alias("pos"),
                F.concat(
                    F.substring(word, cur["bp"] + 1, acc["pos"] - cur["bp"]),
                    F.when(acc["s"] == "", F.lit("")).otherwise(
                        F.concat(F.lit(" "), acc["s"])
                    ),
                ).alias("s"),
            ),
        ).otherwise(acc)

    fin = F.element_at(F.col("dp"), F.col("n") + 1)
    out = scored.select(
        "word",
        "c",
        fin["np"].cast("bigint").alias("n_pieces"),
        fin["cost"].alias("cost_micro"),
        F.aggregate(
            F.sequence(F.lit(1), F.col("n")),
            F.struct(
                F.col("n").cast("int").alias("pos"), F.lit("").alias("s")
            ),
            walk,
            lambda acc: acc["s"],
        ).alias("pieces"),
    )
    return out


def mstep_piece_stats(seg: DataFrame, vocab: DataFrame) -> DataFrame:
    """(piece, f_seed, n_viterbi, p): the hard-EM M-step — Viterbi
    usage counts weighted by word frequency and the re-estimated
    unigram probability (single int→double division). Pieces the
    Viterbi never uses keep n_viterbi = 0."""
    used = (
        seg.select(
            "c", F.explode(F.split("pieces", " ")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("n_viterbi"))
    )
    joined = vocab.join(used, "piece", "left").select(
        "piece",
        F.col("f").alias("f_seed"),
        F.coalesce("n_viterbi", F.lit(0)).cast("bigint").alias(
            "n_viterbi"
        ),
    )
    tot = joined.agg(
        F.sum("n_viterbi").cast("bigint").alias("n_tot")
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "piece",
        "f_seed",
        "n_viterbi",
        (
            F.col("n_viterbi").cast("double")
            / F.col("n_tot").cast("double")
        ).alias("p"),
    )


def refine_vocab(stats: DataFrame) -> DataFrame:
    """Round-2 piece costs from the M-step usage counts: pieces the
    Viterbi never used are PRUNED (the Kudo pruning move), the rest
    re-scored as -ln(n/N) in integer micro-nats. Every word stays
    segmentable because its own round-1 segmentation only used
    surviving pieces."""
    used = stats.filter(F.col("n_viterbi") > 0)
    tot = used.agg(F.sum("n_viterbi").alias("n_tot"))
    return used.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.col("n_viterbi").alias("f"),
        (_mn(F.col("n_tot")) - _mn(F.col("n_viterbi"))).alias(
            "cost_micro"
        ),
    )
