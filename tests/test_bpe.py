"""BPE trainer: merge order on a hand-computable planted corpus, the
deterministic tie-break, the defined replace convention on symbol
runs, and corpus-size-independence of the merge loop's input."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators import bpe as bp


def _train(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return bp.train_merges(docs, n_merges=n_merges)


def test_planted_merge_order(spark):
    """'low' ×5, 'lower' ×2, 'newest' ×6, 'widest' ×3 — the classic
    BPE textbook example. Pair counts round 1: ('e','s') = 6+3 = 9,
    ('s','t') = 9, ('l','o') = 7 … tie between (e,s) and (s,t) broken
    lexicographically → (e,s) first, then ('es','t') = 9 merges next."""
    texts = ["low " * 5, "lower " * 2, "newest " * 6, "widest " * 3]
    merges, segs = _train(spark, texts, 4)
    ranked = [(m[1], m[2]) for m in merges]
    assert ranked[0] == ("e", "s")
    assert ranked[1] == ("es", "t")
    # counts recorded with the merge are the pre-merge pair counts
    assert merges[0][3] == 9 and merges[1][3] == 9
    # after (e,s)+(es,t): 'newest' segments as n e w est
    seg_map = {r["word"]: r["seg"] for r in segs.collect()}
    assert "est" in seg_map["newest"].split(" ")


def test_merge_loop_runs_on_distinct_words(spark):
    """10× more instances of the same words must not change the merge
    table (beyond counts scaling) — the sentencepiece scale property
    the plan relies on at 100 TB."""
    base = ["low lower newest widest"]
    m1, _ = _train(spark, base * 2, 3)
    m2, _ = _train(spark, base * 20, 3)
    assert [(a, b) for _, a, b, _ in m1] == [(a, b) for _, a, b, _ in m2]
    assert [c * 10 for *_, c in m1] == [c for *_, c in m2]


def test_replace_convention_on_runs(spark):
    """The documented deviation: the replace scanner resumes AFTER
    each replaced span and the shared boundary space blocks the
    immediately-adjacent match, so ONE application to a run of n
    identical symbols merges only the leading pair per round —
    'aaaa' → 'aa a a', 'aaa' → 'aa a' (HF tokenizers would give
    'aa aa' / 'aa a'). Pinned so the convention (and oracle parity)
    can never silently drift."""
    merges, segs = _train(spark, ["aaaa aaa"], 1)
    assert (merges[0][1], merges[0][2]) == ("a", "a")
    seg_map = {r["word"]: r["seg"] for r in segs.collect()}
    assert seg_map["aaaa"] == "aa a a"
    assert seg_map["aaa"] == "aa a"


def test_exhausted_vocabulary_stops_early(spark):
    """Single-char words have no pairs — training must emit fewer
    merges than requested, not crash or loop."""
    merges, _ = _train(spark, ["a b c a b"], 5)
    assert merges == []


def test_fertility_query_consistency(spark):
    """Registry-level sanity on real testdata: fertility ratios are
    exact integer quotients and BPE strictly compresses vs chars."""
    from website_traffic_etl_gcp_spark.plans.selection import (
        bpe_fertility_by_lang,
    )
    from .conftest import SF_DIR

    out = bpe_fertility_by_lang(spark, SF_DIR).collect()
    assert len(out) >= 1
    for r in out:
        assert 0 < r["n_bpe_tokens"] <= r["n_chars"]
        assert r["tokens_per_word"] >= 1.0  # a word is ≥1 token
        assert abs(
            r["tokens_per_char"] - r["n_bpe_tokens"] / r["n_chars"]
        ) < 1e-12


def test_batched_merges_match_sequential_argmax(spark):
    """r15 batched multi-merge: train_merges (one bounded collect per
    batch of provably-independent merges) must be bit-identical to
    the per-round top_pair loop — on adversarial planted corpora
    exercising created-pair traps (a merge creates a pair that beats
    a later snapshot row), lexicographic tie-breaks, self-pair runs,
    dependency chains, and all-equal counts."""
    from website_traffic_etl_gcp_spark.operators import bpe

    def sequential(docs, n_merges):
        segs = bpe.initial_segmentation(
            bpe.word_counts(docs)
        ).localCheckpoint()
        merges = []
        for k in range(1, n_merges + 1):
            best = bpe.top_pair(bpe.pair_counts(segs))
            if best is None:
                break
            merges.append((k, best["l"], best["r"], best["cnt"]))
            segs = bpe.apply_merge(segs, best["l"], best["r"])
            if k % bpe.CHECKPOINT_EVERY == 0:
                segs = segs.localCheckpoint()
        return merges, segs

    cases = [
        ["xab"] * 100 + ["cd"] * 50,  # created pair (x,ab) beats (c,d)
        ["ab"] * 10 + ["cd"] * 10 + ["bc"] * 10,  # ties, shared symbol
        ["aaaa"] * 20 + ["bc"] * 15,  # self-pair closes the batch
        ["abcdefgh"] * 30,  # dependency chain
        ["ab", "cd", "ef", "ad"] * 5,  # everything equal: pure tie-break
        ["xaby"] * 50 + ["pq"] * 50,  # created pair ties a snapshot row
        ["ab"] * 100 + ["cd"] * 90 + ["ef"] * 80 + ["gh"] * 70,  # batch=4
        ["aa"] * 100 + ["bc"] * 90,  # self-pair first
    ]
    for texts in cases:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        m_seq, s_seq = sequential(docs, 8)
        m_bat, s_bat = bpe.train_merges(docs, 8)
        assert m_seq == m_bat, (texts[0], m_seq, m_bat)
        assert {tuple(r) for r in s_seq.collect()} == {
            tuple(r) for r in s_bat.collect()
        }, texts[0]
