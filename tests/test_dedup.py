"""Planted-duplicate fixtures: each dedup tier must find the planted
near/exact duplicates and not fabricate unrelated pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind the tall green hills of summer"
)
NEAR = BASE.replace("slowly", "quickly")  # one-token edit
FAR = (
    "completely different content about spark query engines and "
    "distributed columnar execution with vectorized operators at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", 1),
        (1, BASE.upper(), "en", 1),  # exact dup after normalization
        (2, NEAR, "en", 1),  # near dup
        (3, FAR, "en", 1),
        (4, "tiny", "en", 1),  # shorter than a shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "bucket"])


def test_exact_groups(docs):
    groups = dd.exact_groups(docs).collect()
    by_canon = {r["canonical_id"]: r["n_docs"] for r in groups}
    assert by_canon[0] == 2  # 0 and 1 collapse
    assert by_canon[2] == 1 and by_canon[3] == 1 and by_canon[4] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dd.ngram_jaccard_pairs(docs, F.lit("b"), threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 1)] == 1.0  # exact after normalization
    assert (0, 2) in got and 0.5 <= got[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in got)


def test_minhash_lsh_finds_near_dup(docs):
    sigs = dd.minhash_signatures(docs)
    pairs = {(r["doc_a"], r["doc_b"]) for r in dd.minhash_band_pairs(sigs).collect()}
    assert (0, 1) in pairs  # identical signatures always collide
    assert not any(3 in p or 4 in p for p in pairs)


def test_simhash_finds_near_dup(docs):
    fps = dd.simhash_fingerprints(docs)
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert vals[0] == vals[1]
    assert 0 <= vals[0] < 2**dd.SIMHASH_BITS
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_near_pairs(fps).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_jaccard_dfcap_bounds_posting_lists(docs):
    # With a cap of 2, shingles shared by docs 0/1/2 (df=3) are dropped,
    # so the exact-dup pair (0,1) must still score 1.0 on the shingles
    # unique to them... which is none — the pair disappears. With cap 3
    # the hot shingles stay and the planted pairs survive.
    pairs3 = dd.ngram_jaccard_pairs_dfcap(docs, F.lit("b"), 0.5, max_df=3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs3.collect()}
    assert got[(0, 1)] == 1.0
    assert not any(3 in p or 4 in p for p in got)

    # the cap is enforced: no kept shingle's posting list exceeds max_df
    from website_traffic_etl_gcp_spark.operators.textstats import exploded_shingles

    ex = exploded_shingles(docs, extra={"bucket": F.lit("b")})
    rare = (
        ex.groupBy("bucket", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 3)
    )
    assert rare.agg(F.max("df")).collect()[0][0] <= 3


def test_jaccard_dfcap_matches_uncapped_when_cap_is_loose(docs):
    # A cap above the max df is a no-op: identical pairs and scores.
    capped = dd.ngram_jaccard_pairs_dfcap(docs, F.lit("b"), 0.5, max_df=99)
    plain = dd.ngram_jaccard_pairs(docs, F.lit("b"), 0.5)
    c = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    p = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in plain.collect()}
    assert c == p


def _pairset(df):
    return {tuple(sorted((r["doc_a"], r["doc_b"]))) for r in df.collect()}


def test_salted_self_joins_equal_unsalted(docs):
    """Skew salting is a physical-layout change only: for every tier,
    the salted candidate/pair output must equal the plain self-join's
    on the planted-duplicates fixture (verdict item: a hot band key or
    shingle concentrates d² pair-work on one reducer at 100×; salting
    spreads it with identical results)."""
    plain_j = dd.ngram_jaccard_pairs(docs, F.lit("b"), 0.5)
    salted_j = dd.ngram_jaccard_pairs(docs, F.lit("b"), 0.5, n_salts=4)
    assert _pairset(plain_j) == _pairset(salted_j)
    # scores identical too
    pj = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in plain_j.collect()}
    sj = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in salted_j.collect()}
    assert pj == sj

    sigs = dd.minhash_signatures(docs)
    assert _pairset(dd.minhash_band_pairs(sigs)) == _pairset(
        dd.minhash_band_pairs(sigs, n_salts=4)
    )

    fps = dd.simhash_fingerprints(docs)
    assert _pairset(dd.simhash_near_pairs(fps)) == _pairset(
        dd.simhash_near_pairs(fps, n_salts=4)
    )


def test_connected_components_raises_on_non_convergence(spark):
    # a 100-long path cannot reach the star fixed point in one
    # large-star/small-star round; the operator must fail loudly
    # instead of returning split clusters
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not reach its fixed point"):
        dd.connected_components(path, max_iter=1)


def test_connected_components_long_chain_logarithmic_rounds(spark):
    # adversarial 50-hop duplicate chain: min-label propagation needs
    # ~50 rounds; the alternating star algorithm must collapse it to
    # one cluster within a log-scale round budget
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(chain, max_iter=6).collect()
    }
    assert set(got.values()) == {0} and len(got) == 51


def test_connected_components_chains_and_islands(spark):
    # chain 1-2-3 (1 and 3 never directly paired) + island 10-11:
    # transitive closure must still unify the chain
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # a long path stresses the iteration count: 0-1-2-...-9
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["doc_a", "doc_b"]
    )
    got2 = {r["doc_id"]: r["cluster_id"] for r in dd.connected_components(path).collect()}
    assert set(got2.values()) == {0} and len(got2) == 10


def test_connected_components_star_input_is_fixed_point(spark):
    # a graph that is ALREADY one star per component must be detected
    # as converged with a zero round budget — the convergence probe's
    # "no witness" side. Exercises both witness clauses' negatives:
    # root 1 appears only as lo (cnt_hi = 0), leaves appear as hi
    # exactly once and never as lo.
    star = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (11, 10)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(star, max_iter=0).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_each_witness_shape_alone(spark):
    # chained witness WITHOUT multi-parent: (2,1),(3,2) — node 2 is a
    # hi once and a lo once, no node has two parents. Must NOT be
    # treated as converged: the closure must unify {1,2,3}.
    chained = spark.createDataFrame([(2, 1), (3, 2)], ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(chained).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}

    # multi-parent witness WITHOUT a chain: (3,1),(3,2) — hi 3 carries
    # two edges but no lo is ever a hi. Same requirement.
    multi = spark.createDataFrame([(3, 1), (3, 2)], ["doc_a", "doc_b"])
    got2 = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(multi).collect()
    }
    assert got2 == {1: 1, 2: 1, 3: 1}


def test_salted_self_join_splits_hot_key_reducer_load(spark):
    """Skew proof at the task level: one hot (bucket, shingle) key puts
    every candidate pair on a single reducer; salting must spread that
    pair-generation work across ~n_salts reducers with identical
    output. Measured on REAL join-output partition sizes (AQE and
    broadcast disabled so the shuffle partitioning is observable)."""
    n_docs, n_salts = 400, 16
    keyed = spark.createDataFrame(
        [(i, "b0", "s0") for i in range(n_docs)],
        ["doc_id", "bucket", "shingle"],
    )
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the shared test session runs 4 shuffle partitions; give the
        # 16 salt keys room to actually land on distinct reducers
        "spark.sql.shuffle.partitions": "32",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:

        def max_partition_rows(df):
            sizes = (
                df.groupBy(F.spark_partition_id().alias("p"))
                .count()
                .collect()
            )
            return max(r["count"] for r in sizes)

        a, b = keyed.alias("a"), keyed.alias("b")
        plain = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        salted = dd._salted_self_join(keyed, ["bucket", "shingle"], n_salts).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )

        n_pairs = n_docs * (n_docs - 1) // 2
        plain_max = max_partition_rows(plain)
        salted_max = max_partition_rows(salted)
        # unsalted: the hot key lands every pair on ONE reducer
        assert plain_max == n_pairs, (plain_max, n_pairs)
        # salted: the busiest reducer sheds at least 4x of that load
        # (salt keys can still collide in the partition hash, so the
        # bound is conservative vs the ~n_salts-way ideal split)
        assert salted_max * 4 <= plain_max, (salted_max, plain_max)
        # and the pair set is unchanged
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# ---- substring-level span manifest -------------------------------------


def test_span_manifest_merges_overlapping_and_keeps_islands(spark):
    """Handcrafted chunk stream: overlapping flagged ranges merge into
    one maximal span, disjoint ranges stay separate islands, and the
    smallest-id doc keeps its canonical copy."""
    rows = [
        # hash A in docs 1,2 → doc 2 flagged at (1,32)
        (1, 1, 32, "A"),
        (2, 1, 32, "A"),
        # hash B in docs 1,2 → doc 2 flagged at (25,56); overlaps A's
        (1, 25, 32, "B"),
        (2, 25, 32, "B"),
        # hash D in docs 1,2 → doc 2 flagged at (201,232): new island
        (1, 201, 32, "D"),
        (2, 201, 32, "D"),
        # hash C in docs 2,3 → doc 2 is FIRST (keeps it); doc 3 flagged
        (2, 101, 32, "C"),
        (3, 7, 32, "C"),
        # unique chunk — never flagged
        (3, 301, 32, "E"),
    ]
    chunks = spark.createDataFrame(
        rows, ["doc_id", "chunk_start", "chunk_tokens", "chunk_hash"]
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): (
            r["span_tokens"], r["n_chunks"], r["reason"],
        )
        for r in dd.boilerplate_span_manifest(chunks, min_docs=2).collect()
    }
    assert got == {
        (2, 1, 56): (56, 2, "chunk_in_ge_2_docs"),
        (2, 201, 232): (32, 1, "chunk_in_ge_2_docs"),
        (3, 7, 38): (32, 1, "chunk_in_ge_2_docs"),
    }


def test_span_manifest_planted_boilerplate_end_to_end(spark):
    """Two docs share an identical 40-token block; the higher-id doc
    gets ONE merged span covering the whole block (chunks at starts 1
    and 9 overlap), the unique doc gets nothing."""
    from website_traffic_etl_gcp_spark.plans.documents import chunk_stream

    block = " ".join(f"b{i}" for i in range(40))
    unique = " ".join(f"u{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(10, block), (20, block), (30, unique)], ["doc_id", "text"]
    )
    out = dd.boilerplate_span_manifest(chunk_stream(docs)).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r["doc_id"], r["span_start"], r["span_end"],
        r["span_tokens"], r["n_chunks"],
    ) == (20, 1, 40, 40, 2)


def test_apply_span_manifest_cuts_exactly_the_flagged_spans(spark):
    """Planted boilerplate end-to-end through the APPLY step: the
    flagged doc's cleaned hash equals md5 of its text with the block
    removed; the canonical and unique docs pass through unchanged."""
    import hashlib

    from website_traffic_etl_gcp_spark.plans.documents import chunk_stream

    block = " ".join(f"b{i}" for i in range(40))
    tail = " ".join(f"t{i}" for i in range(25))
    unique = " ".join(f"u{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(10, block), (20, block + " " + tail), (30, unique)],
        ["doc_id", "text"],
    )
    manifest = dd.boilerplate_span_manifest(chunk_stream(docs))
    got = {
        r["doc_id"]: r
        for r in dd.apply_span_manifest(docs, manifest).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert set(got) == {10, 20, 30}
    # canonical keeper: untouched
    assert (got[10]["n_spans"], got[10]["n_removed"]) == (0, 0)
    assert got[10]["cleaned_hash"] == md5(block)
    # flagged doc: only its 1-32 chunk hash-matches doc 10 (the later
    # chunks shift into the tail and differ), so exactly tokens 1-32
    # are cut and b32..b39 + the tail survive
    r = got[20]
    assert (r["n_tokens"], r["n_spans"], r["n_removed"], r["n_kept"]) == (
        65, 1, 32, 33,
    )
    kept = " ".join(f"b{i}" for i in range(32, 40)) + " " + tail
    assert r["cleaned_hash"] == md5(kept)
    # unique doc: untouched
    assert got[30]["n_removed"] == 0 and got[30]["cleaned_hash"] == md5(unique)


def test_apply_span_manifest_fully_cut_doc_hashes_empty(spark):
    """A doc whose every token is flagged yields n_kept=0 and the md5
    of the empty string — it stays visible in the accounting instead
    of vanishing."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z")], ["doc_id", "text"]
    )
    manifest = spark.createDataFrame(
        [(1, 1, 6)], ["doc_id", "span_start", "span_end"]
    )
    got = {
        r["doc_id"]: r
        for r in dd.apply_span_manifest(docs, manifest).collect()
    }
    assert (got[1]["n_kept"], got[1]["n_removed"]) == (0, 6)
    assert got[1]["cleaned_hash"] == hashlib.md5(b"").hexdigest()
    assert got[2]["n_removed"] == 0


def test_incremental_cluster_merge_equals_full_recompute(spark):
    """Star state from a prior corpus + only the new batch's pairs must
    re-converge to the same components as a full recompute — including
    a batch doc BRIDGING two previously separate clusters."""
    prior = spark.createDataFrame(
        [(0, 2), (4, 6)], ["doc_a", "doc_b"]
    )  # two even-doc clusters {0,2} and {4,6}
    star = dd.connected_components(prior)
    star_edges = star.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("doc_b")
    )
    batch = spark.createDataFrame(
        [(1, 2), (1, 4), (7, 9)], ["doc_a", "doc_b"]
    )  # odd doc 1 bridges both clusters; {7,9} is a fresh component
    merged = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(
            star_edges.unionByName(batch)
        ).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(prior.unionByName(batch)).collect()
    }
    assert merged == full
    assert merged[6] == 0  # the bridge united everything at root 0
    assert merged[9] == 7


def test_containment_catches_excerpt_jaccard_misses(spark):
    big = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four five"
    )
    excerpt = "kilo lima mike november oscar papa quebec romeo"
    other = "unrelated words entirely disjoint vocabulary nothing shared here ok"
    docs = spark.createDataFrame(
        [(0, big, "en"), (1, excerpt, "en"), (2, other, "en")],
        ["doc_id", "text", "lang"],
    )
    # the excerpt is fully contained → containment 1.0 even though
    # Jaccard is far below any near-dup threshold
    cont = dd.containment_pairs(
        docs, F.lit("b"), threshold=0.9, max_df=10
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in cont}
    assert got == {(0, 1): 1.0}
    jac = dd.ngram_jaccard_pairs(docs, F.lit("b"), threshold=0.5).collect()
    assert not any({r["doc_a"], r["doc_b"]} == {0, 1} for r in jac)


def test_pagerank_hub_outranks_leaves_and_conserves_mass(spark):
    # star graph: 0 at the center of 1..4, plus an isolated pair (5,6)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)], ["doc_a", "doc_b"]
    )
    rows = {r["doc_id"]: r for r in dd.pagerank_micro(pairs, iters=3).collect()}
    assert rows[0]["degree"] == 4
    # hub strictly outranks every leaf; leaves are symmetric → equal
    leaf_ranks = {rows[i]["rank_micro"] for i in (1, 2, 3, 4)}
    assert len(leaf_ranks) == 1
    assert rows[0]["rank_micro"] > leaf_ranks.pop()
    # the isolated pair is a symmetric 2-cycle: rank stays ~1.0
    assert rows[5]["rank_micro"] == rows[6]["rank_micro"]
    assert abs(rows[5]["rank_micro"] - 1_000_000) < 5
    # integer determinism: rerun is bit-identical
    again = {
        r["doc_id"]: r["rank_micro"]
        for r in dd.pagerank_micro(pairs, iters=3).collect()
    }
    assert again == {k: v["rank_micro"] for k, v in rows.items()}
