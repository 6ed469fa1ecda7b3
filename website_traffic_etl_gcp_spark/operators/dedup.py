"""Deduplication operator family for LLM training-data pipelines.

Four tiers, all bucketed so candidate generation is never a global
cross join (the only thing that matters at 100 TB):

- exact: md5 of normalized text, plain hash-groupBy. One shuffle.
- n-gram Jaccard: explode distinct shingles → inverted-index self-join
  on (bucket, shingle) → per-pair intersection counts → exact Jaccard.
  Candidates bounded by content buckets (lang × length band).
- MinHash + LSH: k md5-derived min-hashes per doc (single groupBy after
  the shingle explode), banded into b keys; docs sharing a band key are
  candidates. Shuffle volume is O(docs × b), independent of pair count.
- SimHash: 48-bit fingerprint from token-hash bit votes; near-dups =
  pairs sharing a 12-bit band (4 bands) with hamming distance ≤ r.

All hashing goes through md5 (identical in DuckDB) so every tier is
oracle-checkable; see plans/documents.py for the SQL twins."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import md5_long, normalize_text
from .textstats import exploded_shingles

MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band
# 48 bits: random doc pairs sit at expected hamming ~24, so the ≤3
# filter admits only genuine near-dups (32 bits was permissive enough
# on short docs to pass thousands of chance collisions). The banding
# uses the MINIMUM sound band count: hamming ≤ 3 flips touch ≤ 3
# bands, so 4 bands guarantee ≥ 1 agreeing band — and fewer, wider
# bands (4 × 12 bits → 4096 values each) shrink random band
# collisions 16× vs byte bands, which dominated candidate volume
# (measured 13.9M candidates → ~1M real pairs at sf0.1 with 6 × 8-bit
# bands). The fingerprint stays well inside a signed int64.
SIMHASH_BITS = 48
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = SIMHASH_MAX_HAMMING + 1  # minimum sound band count
SIMHASH_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS  # 12 bits
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_WIDTH) - 1


def exact_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: fingerprint, group size,
    canonical (min) id. ``n_dups > 1`` marks duplicate groups."""
    return (
        df.select(
            F.col(id_col),
            F.md5(normalize_text(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    bucket: Column,
    threshold: float,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salts: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct shingles for candidate pairs sharing
    a content bucket. Inverted-index join: |A∩B| from the shingle
    self-join, |A|,|B| from per-doc sizes — no per-pair array ops, no
    cross join.

    ``max_df`` is the 100 TB safety valve: without it posting lists are
    unbounded and a stopword-like shingle with document frequency d
    produces d² join rows within its bucket. With the cap, shingles
    appearing in more than ``max_df`` docs of a bucket are dropped
    BEFORE the self-join (and per-doc sizes count only kept shingles,
    so the score is exact Jaccard over the rare-shingle sets), bounding
    worst-case join output at O(shingles × max_df²). ``None`` keeps the
    exact-all-shingles semantics — small/curated corpora only; default
    to a cap at scale.

    ``n_salts`` spreads residual hot (bucket, shingle) keys over that
    many reducers (see ``_jaccard_from_index``); output is identical.

    The exploded index is persisted: it feeds both
    sides of the self-join plus the size aggregate, and without the
    materialization Spark recomputes the explode + window sort for each
    consumer (~40% of query time). This is the 'build the index once'
    step — on a cluster with reliable storage, write it out instead."""
    ex = exploded_shingles(df, id_col, text_col, extra={"bucket": bucket})
    if max_df is not None:
        # document frequency as a window count over (bucket, shingle):
        # one shuffle of the index, vs the groupBy+semi-join form which
        # shuffles it twice (measured ~25% of query time at sf0.1)
        w = Window.partitionBy("bucket", "shingle")
        ex = (
            ex.withColumn("df", F.count(F.lit(1)).over(w))
            .filter(F.col("df") <= max_df)
            .drop("df")
        )
    ex = ex.persist()
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return _jaccard_from_index(ex, sizes, threshold, n_salts=n_salts)


def ngram_jaccard_pairs_dfcap(
    df: DataFrame,
    bucket: Column,
    threshold: float,
    max_df: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The df-capped tier — see ``ngram_jaccard_pairs(max_df=...)``."""
    return ngram_jaccard_pairs(
        df, bucket, threshold, max_df=max_df, id_col=id_col, text_col=text_col
    )


def containment_pairs(
    df: DataFrame,
    bucket: Column,
    threshold: float,
    max_df: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT: a pair whose
    smaller shingle set is ≥ ``threshold`` contained in the other is
    emitted even when its symmetric Jaccard is low — the quote/excerpt
    case (a short doc embedded in a long one) that Jaccard structurally
    misses because the union is dominated by the longer doc.

    Same inverted-index shape as the Jaccard tier (shared-shingle
    self-join within content buckets, never a cross join), with the
    mandatory df cap bounding posting lists at scale; sizes and the
    intersection count only the kept (rare) shingles, so the score is
    exact containment over the capped sets. Bucketing is by lang ONLY
    (no length band): containment pairs are precisely the ones with
    very different lengths, which a length-band bucket would split.

    Output: (doc_a, doc_b, n_inter, n_a, n_b, containment) with
    doc_a < doc_b and containment = n_inter / min(n_a, n_b)."""
    ex = exploded_shingles(df, id_col, text_col, extra={"bucket": bucket})
    w = Window.partitionBy("bucket", "shingle")
    ex = (
        ex.withColumn("df", F.count(F.lit(1)).over(w))
        .filter(F.col("df") <= max_df)
        .drop("df")
        .persist()
    )
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("n_inter").cast("double") / F.least(
        "n_a", "n_b"
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b",
                cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def _salted_self_join(keyed: DataFrame, join_keys: list[str], n_salts: int):
    """Self-join ``keyed`` on ``join_keys`` with doc_id-derived salting:
    the a-side gets salt = md5(doc_id) % n_salts, the b-side is
    replicated across all salt values, and the join adds salt equality.
    Every (a, b) pair still meets on exactly one reducer — output is
    identical to the plain self-join — but a hot key's d² pair
    workload is spread over ``n_salts`` reducers instead of one.
    (AQE's skew split covers sort-merge joins after the fact; explicit
    salting is for hot keys you know up front, same doctrine as
    operators/skew.py.)"""
    a = keyed.withColumn(
        "__salt", (md5_long(F.col("doc_id").cast("string")) % n_salts).cast("int")
    ).alias("a")
    b = keyed.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).alias("b")
    cond = (F.col("a.__salt") == F.col("b.__salt")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for k in join_keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return a.join(b, cond)


def _jaccard_from_index(
    ex: DataFrame,
    sizes: DataFrame,
    threshold: float,
    n_salts: int | None = None,
) -> DataFrame:
    if n_salts:
        inter = _salted_self_join(ex, ["bucket", "shingle"], n_salts)
    else:
        a, b = ex.alias("a"), ex.alias("b")
        inter = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    inter = inter.groupBy(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).agg(F.count(F.lit(1)).alias("n_inter"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        F.col("n_inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# Affine permutation family over a Mersenne prime: h_i(x) = (a_i·x + b_i)
# mod P with x the 31-bit fold of ONE md5 per shingle. 16× fewer md5
# calls than hashing per-permutation, and every step is plain int64
# arithmetic that DuckDB reproduces bit-for-bit (products stay < 2^62,
# no overflow under Spark's ANSI mode).
MINHASH_PRIME = 2147483647  # 2^31 - 1
_MINHASH_A = [2 * i + 3 for i in range(MINHASH_K)]
_MINHASH_B = [5 * i + 7 for i in range(MINHASH_K)]


def _minhash_cols() -> list[Column]:
    base = (md5_long(F.col("shingle")) % MINHASH_PRIME).alias("x")
    return [
        F.min((F.lit(_MINHASH_A[i]) * base + F.lit(_MINHASH_B[i])) % MINHASH_PRIME)
        .alias(f"h{i}")
        for i in range(MINHASH_K)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """k min-hashes per doc in ONE aggregation over the shingle explode
    (k agg expressions, not k passes)."""
    ex = exploded_shingles(df, id_col, text_col)
    return ex.groupBy("doc_id").agg(*_minhash_cols())


def minhash_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) — b band keys per doc, each the md5
    of its band's row hashes."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "-",
                        *[
                            F.col(f"h{j * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for j in range(MINHASH_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_key"
    )


def minhash_band_pairs(sigs: DataFrame, n_salts: int | None = None) -> DataFrame:
    """LSH banding: docs sharing any band key become candidate pairs.

    ``n_salts``: a corpus with thousands of IDENTICAL docs concentrates
    one band key — d² candidate pairs on one reducer. Salting spreads
    that key's pair generation over ``n_salts`` reducers with identical
    output (see ``_salted_self_join``)."""
    # the self-join consumes this twice; without the materialization
    # the whole signature pipeline — shingle explode, window sort, k-way
    # min aggregate — executes once per side (~3× the query time)
    keyed = minhash_bands(sigs).persist()
    if n_salts:
        joined = _salted_self_join(keyed, ["band_idx", "band_key"], n_salts)
    else:
        a, b = keyed.alias("a"), keyed.alias("b")
        joined = a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    return joined.select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).distinct()


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash: per-token md5-derived hash, per-bit ±1 votes,
    fingerprint from vote signs. One explode + one groupBy with
    SIMHASH_BITS sum expressions — a single shuffle regardless of
    corpus size."""
    # NOT widened (functions/partitioning.py): the distinct-token
    # explode feeds a map-side-combining groupBy whose partial
    # aggregation collapses the stream before the shuffle — the
    # fan-out's own shuffle costs more than the narrow map stage
    # (A/B at sf1: 3.7 s plain vs 4.4 s widened)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.split(normalize_text(text_col), " "))
        ).alias("token"),
    )
    # materialize the hash ONCE per token — referencing md5_long inside
    # each vote would re-evaluate the md5 48× per row (aggregate codegen
    # does not reliably eliminate the common subexpression)
    hashed = toks.select("doc_id", md5_long(F.col("token")).alias("h"))
    votes = [
        F.sum(
            F.when((F.col("h").bitwiseAND(F.lit(1 << i))) != 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    sigs = hashed.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sigs.select("doc_id", fp.cast("bigint").alias("simhash"))


def banded_hamming_pairs(
    fps: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    n_bands: int = SIMHASH_BANDS,
    band_width: int = SIMHASH_BAND_WIDTH,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    n_salts: int | None = None,
) -> DataFrame:
    """The generic band-LSH hamming join behind SimHash AND the
    perceptual media hash (operators/multimodal.py): candidates share
    at least one ``band_width``-bit band (any pair within hamming ≤
    ``max_hamming`` flips bits in ≤ max_hamming of the bands, so with
    ``n_bands ≥ max_hamming + 1`` it agrees on at least one); exact
    hamming filter via xor+bit_count afterwards. Returns
    (doc_a, doc_b, hamming) with doc_a < doc_b, one row per pair.

    ``n_salts`` spreads a hot band value's pair generation over that
    many reducers (identical-item floods); output unchanged."""
    if n_bands < max_hamming + 1:  # the soundness precondition
        raise ValueError(
            f"{n_bands} bands cannot guarantee recall at hamming "
            f"{max_hamming}; need ≥ {max_hamming + 1}"
        )
    band_mask = (1 << band_width) - 1
    fps = fps.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("simhash")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.shiftright(F.col("simhash"), band_width * j)
                .bitwiseAND(F.lit(band_mask))
                .alias("band_val"),
            )
            for j in range(n_bands)
        ]
    )
    # self-joined twice below — persist so the fingerprint computation
    # runs once, not per join side
    keyed = (
        fps.select("doc_id", "simhash", F.explode(bands).alias("b"))
        .select("doc_id", "simhash", "b.band_idx", "b.band_val")
        .persist()
    )
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ham = F.bit_count(xor)
    if n_salts:
        joined = _salted_self_join(keyed, ["band_idx", "band_val"], n_salts)
    else:
        a, b = keyed.alias("a"), keyed.alias("b")
        joined = a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    # a qualifying pair meets in EVERY band its fingerprints agree on
    # (up to all n_bands) — instead of a distinct over that multiplied
    # output (an O(candidates) shuffle), keep the pair only in its FIRST
    # agreeing band, computable row-locally from the xor's zero bands.
    # Map-side exact dedup: the join output needs no exchange at all.
    first_agreeing_band = F.coalesce(
        *[
            F.when(
                F.shiftright(xor, band_width * j).bitwiseAND(
                    F.lit(band_mask)
                )
                == 0,
                F.lit(j),
            )
            for j in range(n_bands)
        ]
    )
    return joined.filter(
        (ham <= max_hamming)
        & (F.col("a.band_idx") == first_agreeing_band)
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        ham.alias("hamming"),
    )


def simhash_near_pairs(fps: DataFrame, n_salts: int | None = None) -> DataFrame:
    """Candidates share at least one of the fingerprint's 12-bit bands
    (any pair within hamming ≤ 3 flips bits in ≤3 of the 4 bands, so
    agrees on at least one); exact hamming filter via xor+bit_count
    afterwards. Thin wrapper over :func:`banded_hamming_pairs` with
    the SimHash constants."""
    return banded_hamming_pairs(fps, n_salts=n_salts)


def _canon_edges(edges: DataFrame) -> DataFrame:
    """Distinct (hi, lo) orientation, self-loops dropped."""
    return (
        edges.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-larger neighbors to
    its minimum neighborhood label (min of self and all neighbors)."""
    sym = edges.select(
        F.col("hi").alias("u"), F.col("lo").alias("v")
    ).unionByName(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    mins = sym.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("doc_a"), F.col("m").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
        .select(F.col("doc_a").alias("hi"), F.col("doc_b").alias("lo"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every node re-points its smaller-or-equal neighbors
    (and itself) at the minimum of that closed neighborhood."""
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    nbrs = edges.join(mins, "hi")
    e1 = nbrs.filter(F.col("lo") != F.col("m")).select(
        F.col("lo").alias("doc_a"), F.col("m").alias("doc_b")
    )
    e2 = mins.select(F.col("hi").alias("doc_a"), F.col("m").alias("doc_b"))
    return _canon_edges(e1.unionByName(e2))


def boilerplate_span_manifest(
    chunks: DataFrame, min_docs: int = 2
) -> DataFrame:
    """Substring-level dedup manifest (Lee et al., "Deduplicating
    Training Data" shape): WHICH token spans of WHICH doc to cut, not
    just which docs to drop.

    Input: a chunk stream (doc_id, chunk_start, chunk_tokens,
    chunk_hash). A chunk is boilerplate when its hash occurs in
    ≥ ``min_docs`` distinct docs; the doc with the smallest id keeps
    its copy (the canonical occurrence — removing every copy would
    delete the text from the corpus entirely), every other doc gets
    the chunk's token range flagged. Overlapping/adjacent flagged
    ranges merge into MAXIMAL spans per doc via gaps-and-islands: a
    window over (doc_id ORDER BY start) marks a new island when a
    range starts past the running max end + 1, islands group into
    (span_start, span_end).

    Scale: one hash-groupBy for the boilerplate set, one join back
    (hash-partitioned on chunk_hash), then per-doc windows — each
    partition is one doc's flagged chunks, bounded by doc length, so
    the merge never concentrates load. Returns (doc_id, span_start,
    span_end, span_tokens, n_chunks, reason)."""
    chunks = chunks.persist()  # feeds agg AND join
    boiler = (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("chunk_hash", "first_doc_id")
    )
    flagged = (
        chunks.join(boiler, "chunk_hash")
        .filter(F.col("doc_id") != F.col("first_doc_id"))
        .select(
            "doc_id",
            F.col("chunk_start").alias("s"),
            (F.col("chunk_start") + F.col("chunk_tokens") - 1).alias("e"),
        )
    )
    # (doc_id, s) is unique — one chunk per start — so the ordering is
    # total and the island numbering deterministic
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_e.isNull() | (F.col("s") > prev_max_e + 1), 1
    ).otherwise(0)
    islands = flagged.withColumn("isl", new_island).withColumn(
        "island",
        F.sum("isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("s").cast("bigint").alias("span_start"),
            F.max("e").cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("bigint")
            .alias("span_tokens"),
            "n_chunks",
            F.lit(f"chunk_in_ge_{min_docs}_docs").alias("reason"),
        )
    )


PAGERANK_ITERS = 3
PAGERANK_BASE_MICRO = 150_000  # (1 - d) in micro-units, d = 0.85
PAGERANK_INIT_MICRO = 1_000_000


def pagerank_micro(pairs: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph, in
    EXACT integer micro-units: ranks start at 1e6, each round computes
    ``150_000 + (85 · Σ_u floor(r(u) / deg(u))) div 100`` — every step
    is int64 floor arithmetic, so the result is bit-identical on any
    engine or cluster size (the family's micro-nat determinism
    contract; no float sum ordering anywhere).

    Each round is one (edges ⋈ ranks) hash join on src plus one
    groupBy(dst) sum — the textbook distributed PageRank shape; edge
    list persisted once (it feeds every round), ranks
    checkpoint'd per round so the plan stays shallow at high iteration
    counts. Nodes are the docs that appear in ≥ 1 pair, so deg ≥ 1 and
    there are no dangling-node corrections to smear.

    Output: (doc_id, degree, rank_micro, rank)."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    ranks = deg.select(
        "src", "degree", F.lit(PAGERANK_INIT_MICRO).cast("bigint").alias("rank_micro")
    )
    for _ in range(iters):
        shares = ranks.select(
            "src", F.expr("rank_micro div degree").alias("share")
        )
        sums = (
            edges.join(shares, "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(F.sum("share").alias("s"))
        )
        ranks = (
            deg.join(sums, "src", "left")
            .select(
                "src",
                "degree",
                (
                    F.lit(PAGERANK_BASE_MICRO)
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).cast("bigint").alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("src").alias("doc_id"),
        F.col("degree").cast("bigint").alias("degree"),
        "rank_micro",
        (F.col("rank_micro").cast("double") / F.lit(1e6)).alias("rank"),
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Duplicate-CLUSTER formation: collapse the near-dup pair graph
    into components — the step that turns pairwise dedup output into
    actual removal groups (keep cluster_id, drop the rest).

    Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each round rewrites the edge
    set so strictly-larger neighbors attach to the local minimum
    (large-star) and then each node folds its smaller neighbors onto
    that minimum (small-star). The fixed point is one star per
    component rooted at the component's minimum id, reached in
    O(log n) rounds REGARDLESS of component diameter — min-label
    propagation needs O(diameter) rounds and a 50-hop duplicate chain
    (common when near-dup similarity is transitive-ish) would blow any
    sane round budget at 100 TB. Per round: two self-aggregating
    shuffles on node id over the CURRENT edge set, which only shrinks.
    ``localCheckpoint`` truncates lineage each round (reliable-storage
    clusters: ``checkpoint``).

    Raises if the loop exhausts ``max_iter`` without reaching the
    fixed point (never silently SPLITS a component — worse than
    failing, because the downstream keep/drop step would keep extra
    near-duplicates).

    Returns (doc_id, cluster_id = min doc id of the component) for
    every doc that appears in at least one pair."""
    edges = _canon_edges(pairs.select("doc_a", "doc_b")).localCheckpoint(
        eager=True
    )

    def _is_star_set(e: DataFrame) -> bool:
        # stars (canonical orientation forces root = star minimum) are
        # exactly the fixed points: every hi carries ONE edge and no
        # edge target is itself a source. Both witnesses ride ONE
        # aggregation: a node n violates iff it appears as hi on >1
        # edge (multi-parent) or as both a hi and a lo (a chain
        # x.lo == y.hi is exactly a node with cnt_hi ≥ 1 AND
        # cnt_lo ≥ 1). One partial-aggregating shuffle on node id
        # replaces the old groupBy-count PLUS edge⋈edge self-join —
        # on real corpora the graph is star-shaped from round 0, so
        # this probe IS the loop's entire cost after pair generation.
        nodes = e.select(
            F.col("hi").alias("n"),
            F.lit(1).alias("as_hi"),
            F.lit(0).alias("as_lo"),
        ).unionAll(
            e.select(
                F.col("lo").alias("n"),
                F.lit(0).alias("as_hi"),
                F.lit(1).alias("as_lo"),
            )
        )
        witness = (
            nodes.groupBy("n")
            .agg(F.sum("as_hi").alias("nh"), F.max("as_lo").alias("nl"))
            .filter(
                (F.col("nh") > 1)
                | ((F.col("nh") >= 1) & (F.col("nl") == 1))
            )
            .limit(1)
        )
        return witness.count() == 0

    converged = _is_star_set(edges)
    for _ in range(max_iter):
        if converged:
            break
        # lazy checkpoint: materializes inside the convergence probe's
        # job (still truncating lineage for the NEXT round) instead of
        # paying a dedicated eager-materialization job per round
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        converged = _is_star_set(edges)
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach its fixed point in "
            f"{max_iter} large-star/small-star rounds; raise max_iter"
        )
    # the fixed point is a star per component: non-roots appear as hi
    # pointing at the root, roots only as lo
    non_roots = edges.select(
        F.col("hi").alias("doc_id"), F.col("lo").alias("cluster_id")
    )
    roots = edges.select(F.col("lo").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return non_roots.unionByName(roots)


def apply_span_manifest(docs: DataFrame, manifest: DataFrame) -> DataFrame:
    """Execute a span-removal manifest: cut the flagged token ranges
    out of each doc and emit the cleaned-corpus accounting row —
    (doc_id, n_tokens, n_spans, n_removed, n_kept, cleaned_hash) with
    cleaned_hash = md5 of the kept tokens re-joined on single spaces.
    The write-side half of Lee et al. substring dedup:
    ``boilerplate_span_manifest`` decides WHAT to cut, this applies it.

    ``manifest`` rows are (doc_id, span_start, span_end) 1-based
    inclusive token ranges, already merged to maximal disjoint spans
    per doc (the manifest contract). Docs with no manifest rows pass
    through unchanged (n_removed = 0).

    Scale: spans aggregate to one small array per flagged doc (one
    shuffle on doc_id), hash-join back to the corpus, then the cut is
    a higher-order ``filter`` over the token array with an ``exists``
    probe into the per-doc span list — map-only JVM expressions, no
    explode of the corpus, no Python."""
    from ..functions.texthash import word_tokens

    spans = manifest.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("spans"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    toks = docs.select("doc_id", word_tokens("text").alias("t"))
    joined = toks.join(spans, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce("spans", F.array()).alias("spans"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
    )
    # kept token <=> its 1-based position is outside every span
    kept = F.filter(
        F.col("t"),
        lambda tok, i: ~F.exists(
            F.col("spans"),
            lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        "n_spans",
        (F.size("t") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.md5(F.concat_ws(" ", kept)).alias("cleaned_hash"),
    )
