"""Property-based equivalence: the scalable operators must agree with
naive reference implementations on arbitrary inputs, not just the
planted fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators.rangejoin import bucketed_range_join
from website_traffic_etl_gcp_spark.operators.sessionize import (
    DEFAULT_GAP_SECONDS,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)

# offsets in seconds; spans chosen to straddle bucket boundaries
_point_offsets = st.lists(
    st.integers(min_value=0, max_value=7200), min_size=0, max_size=12
)
_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),
        st.integers(min_value=0, max_value=3600),
    ),
    min_size=0,
    max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(points=_point_offsets, ivs=_intervals)
def test_range_join_matches_naive(spark, points, ivs):
    p_rows = [(i, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(points)]
    iv_rows = [
        (j, T0 + dt.timedelta(seconds=lo), T0 + dt.timedelta(seconds=lo + span))
        for j, (lo, span) in enumerate(ivs)
    ]
    expected = {
        (pid, ivid)
        for pid, ts in p_rows
        for ivid, lo, hi in iv_rows
        if lo <= ts < hi
    }
    if not p_rows or not iv_rows:
        assert expected == set()
        return
    pts = spark.createDataFrame(p_rows, ["pt_id", "ts"])
    iv = spark.createDataFrame(iv_rows, ["iv_id", "lo", "hi"])
    # deliberately small bucket (303s, prime) so intervals span many
    got = {
        (r["pt_id"], r["iv_id"])
        for r in bucketed_range_join(
            pts, iv, "ts", "lo", "hi", bucket_seconds=303
        ).collect()
    }
    assert got == expected


def _naive_sessions(events):
    """events: sorted (ts_seconds) per user → list of (n_events)."""
    sessions = []
    cur = 0
    prev = None
    for t in events:
        if prev is not None and t - prev > DEFAULT_GAP_SECONDS:
            sessions.append(cur)
            cur = 0
        cur += 1
        prev = t
    if cur:
        sessions.append(cur)
    return sorted(sessions)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=6 * 3600), min_size=1, max_size=20
    )
)
def test_sessionize_matches_naive(spark, offsets):
    uniq = sorted(set(offsets))
    rows = [
        (i, 1, T0 + dt.timedelta(seconds=s), 1.0, "view")
        for i, s in enumerate(uniq)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value", "event_type"]
    )
    got = sorted(
        r["n_events"] for r in sessionize(df).select("n_events").collect()
    )
    assert got == _naive_sessions(uniq)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.data(),
    base_words=st.integers(min_value=20, max_value=40),
)
def test_minhash_estimate_tracks_jaccard(spark, data, base_words):
    """Signature agreement rate is an unbiased estimator of Jaccard:
    for doc pairs built by word substitution, |estimate - exact| must
    stay within the k=16 sampling error."""
    from website_traffic_etl_gcp_spark.operators.dedup import (
        MINHASH_K,
        minhash_signatures,
    )
    from website_traffic_etl_gcp_spark.operators.textstats import (
        exploded_shingles,
    )

    words = [f"w{i}" for i in range(base_words)]
    n_swap = data.draw(st.integers(min_value=0, max_value=base_words // 2))
    mutated = list(words)
    for i in range(n_swap):
        mutated[2 * i + 1] = f"x{i}"   # stride-2: spreads edits across shingles
    docs = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(mutated))], ["doc_id", "text"]
    )
    # exact jaccard over the SAME shingle definition the minhash uses
    sh = exploded_shingles(docs).collect()
    s0 = {r["shingle"] for r in sh if r["doc_id"] == 0}
    s1 = {r["shingle"] for r in sh if r["doc_id"] == 1}
    exact = len(s0 & s1) / len(s0 | s1)

    sigs = {r["doc_id"]: [r[f"h{i}"] for i in range(MINHASH_K)]
            for r in minhash_signatures(docs).collect()}
    est = sum(a == b for a, b in zip(sigs[0], sigs[1])) / MINHASH_K
    # k=16 Bernoulli draws: 3 sigma ~ 3*sqrt(0.25/16) = 0.375
    assert abs(est - exact) <= 0.40, f"exact={exact:.2f} est={est:.2f}"


# ---- round-2 operators -------------------------------------------------

_pii_texts = st.lists(
    st.text(
        alphabet="abc 0123456789.@-_",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=_pii_texts)
def test_redaction_is_idempotent(spark, texts):
    """redact(redact(x)) == redact(x): the replacement tokens contain
    no redactable substring, so a second pass must be a no-op — the
    property that makes a re-run of the scrub job safe."""
    from website_traffic_etl_gcp_spark.operators.redact import redact_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    once = df.select("doc_id", redact_text(F.col("text")).alias("r"))
    twice = once.select("doc_id", redact_text(F.col("r")).alias("r"))
    assert {(r["doc_id"], r["r"]) for r in once.collect()} == {
        (r["doc_id"], r["r"]) for r in twice.collect()
    }


_token_counts = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),
        st.integers(min_value=0, max_value=900),
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_token_counts)
def test_packing_conserves_and_orders(spark, rows):
    """Packing invariants on arbitrary inputs: offsets are the exact
    prefix sums in doc_id order within each group, bin ids are
    monotone, and no token is lost or duplicated."""
    from website_traffic_etl_gcp_spark.operators.packing import pack_offsets

    df = spark.createDataFrame(
        [(g, i, n) for i, (g, n) in enumerate(rows)],
        ["source", "doc_id", "n"],
    )
    packed = pack_offsets(df, F.col("n"), cap=256)
    got = sorted(
        (
            (r["source"], r["doc_id"], r["n_tokens"], r["stream_offset"], r["bin_id"])
            for r in packed.collect()
        )
    )
    # reference: python prefix sums per group in doc_id order
    by_group: dict[str, int] = {}
    expected = []
    for g, i, n in sorted(
        [(g, i, n) for i, (g, n) in enumerate(rows)], key=lambda t: (t[0], t[1])
    ):
        off = by_group.get(g, 0)
        expected.append((g, i, n, off, off // 256))
        by_group[g] = off + n
    assert got == sorted(expected)


def test_snapshot_diff_identity(spark):
    """diff(x, x) = every key unchanged (on real data incl. NULLs)."""
    from website_traffic_etl_gcp_spark.catalog import load_table
    from website_traffic_etl_gcp_spark.operators.reconcile import diff_summary

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    rows = {r["status"]: r["n_rows"] for r in diff_summary(ev, ev, ["event_id"]).collect()}
    assert rows == {"unchanged": ev.count()}


# ---- winnowing guarantee + CDC tiling (operators/fingerprint.py) -------

_VOCAB = [f"v{i:02d}" for i in range(40)]
_rand_doc = st.lists(
    st.sampled_from(_VOCAB), min_size=10, max_size=60
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=_rand_doc, start=st.integers(min_value=0, max_value=40),
       prefix=st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8))
def test_winnow_guarantee_property(spark, doc, start, prefix):
    """Any span of >= WINNOW_WINDOW + SHINGLE_K - 1 tokens shared
    between two docs must contribute >= 1 common selected fingerprint
    — the Schleimer et al. guarantee, on arbitrary token streams."""
    from website_traffic_etl_gcp_spark.operators import fingerprint as fpr

    span_len = fpr.WINNOW_WINDOW + 3 - 1  # w + K - 1 = 6
    start = min(start, max(len(doc) - span_len, 0))
    span = doc[start : start + span_len]
    if len(span) < span_len:
        span = (span * span_len)[:span_len]
        doc = doc[:start] + span + doc[start + span_len :]
    other = prefix + span
    df = spark.createDataFrame(
        [(0, " ".join(doc)), (1, " ".join(other))], ["doc_id", "text"]
    )
    sel = {0: set(), 1: set()}
    for r in fpr.winnow_fingerprints(df).collect():
        sel[r["doc_id"]].add(r["sel_hash"])
    assert sel[0] & sel[1], (
        f"shared {span_len}-token span selected no common fingerprint: "
        f"doc={doc} other={other}"
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=_rand_doc)
def test_cdc_chunks_partition_property(spark, doc):
    """CDC chunks must tile the token stream exactly: contiguous,
    non-overlapping, covering 1..n, for arbitrary token streams."""
    from website_traffic_etl_gcp_spark.operators import fingerprint as fpr

    df = spark.createDataFrame([(0, " ".join(doc))], ["doc_id", "text"])
    rows = sorted(
        fpr.cdc_chunks(df).collect(), key=lambda r: r["chunk_idx"]
    )
    assert rows[0]["start_pos"] == 1
    assert rows[-1]["end_pos"] == len(doc)
    for a, b in zip(rows, rows[1:]):
        assert b["start_pos"] == a["end_pos"] + 1
    assert sum(r["n_tokens"] for r in rows) == len(doc)


_vec = st.lists(
    st.floats(
        min_value=-4.0,
        max_value=4.0,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=4,
    max_size=4,
)


def _sane(vs):
    """Vectors whose squared norm can't underflow to 0.0 — cosine of a
    zero/denormal-norm vector divides by zero under ANSI mode in BOTH
    the packed and the window formulation (corpus vectors are non-zero
    by data contract, so this is outside the operator's domain)."""
    import math

    return [
        v for v in vs if math.sqrt(sum(x * x for x in v)) > 1e-6
    ]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vecs=st.lists(_vec, min_size=1, max_size=8),
    cents=st.lists(_vec, min_size=1, max_size=5),
)
def test_packed_argmin_matches_window_formulation(spark, vecs, cents):
    """The map-side argmin (assign_cells / clustering._assign) must
    agree with the r5 window-rank reference on ARBITRARY vectors and
    centroids — same winners, same tie-breaking. Zero-norm vectors are
    excluded (cosine undefined; corpus vectors are non-zero by data
    contract)."""
    from pyspark.sql import Window

    from website_traffic_etl_gcp_spark.functions.vectors import dot, norm
    from website_traffic_etl_gcp_spark.operators import similarity as sim
    from website_traffic_etl_gcp_spark.operators.clustering import _assign

    vecs = _sane(vecs)
    cents = _sane(cents)
    if not vecs or not cents:
        return
    vdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    ).selectExpr("vec_id", "CAST(embedding AS array<double>) AS embedding")
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], ["cell_id", "centroid"]
    ).selectExpr("cell_id", "CAST(centroid AS array<double>) AS centroid")

    # --- cosine path: assign_cells vs the r5 window-rank reference
    got = {
        (r["vec_id"], r["cell_id"])
        for r in sim.assign_cells(vdf, cdf, 1).collect()
    }
    v = vdf.withColumn("__vn", norm(F.col("embedding")))
    cen = cdf.withColumn("__cn", norm(F.col("centroid")))
    cos = F.round(
        dot(F.col("embedding"), F.col("centroid"))
        / (F.col("__vn") * F.col("__cn")),
        sim.COSINE_SCALE,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cell_cos").desc(), F.col("cell_id")
    )
    want = {
        (r["vec_id"], r["cell_id"])
        for r in v.crossJoin(F.broadcast(cen))
        .select("vec_id", "cell_id", cos.alias("cell_cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want

    # --- euclidean path: clustering._assign vs the window reference
    cent_list = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    got_e = {
        (r["vec_id"], r["cell_id"])
        for r in _assign(vdf, cent_list, "vec_id", "embedding").collect()
    }
    dist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    we = Window.partitionBy("vec_id").orderBy(F.col("dist"), F.col("cell_id"))
    want_e = {
        (r["vec_id"], r["cell_id"])
        for r in vdf.crossJoin(F.broadcast(cdf))
        .select("vec_id", "cell_id", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got_e == want_e


_wf_sources = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=1_000_000),  # avail tokens
        st.integers(min_value=1, max_value=5),  # weight
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(srcs=_wf_sources)
def test_waterfill_conserves_and_caps(spark, srcs):
    """Waterfill invariants on arbitrary inventories: never allocates
    more than the budget, never exceeds a source's epoch cap, never
    goes negative — and a run where nothing saturates is pure
    proportional allocation, leaving < n_sources of floor dust."""
    from pyspark.sql import functions as F

    from website_traffic_etl_gcp_spark.plans.documents import (
        WATERFILL_MAX_EPOCHS,
        waterfill_rounds,
    )

    rows = [
        (f"s{i}", avail, w, avail * WATERFILL_MAX_EPOCHS, 0)
        for i, (avail, w) in enumerate(srcs)
    ]
    base = spark.createDataFrame(
        rows, "source string, avail bigint, w bigint, cap bigint, planned bigint"
    )
    b = sum(a for a, _ in srcs)
    out = waterfill_rounds(base.withColumn("b", F.lit(b))).collect()
    assert sum(r["planned"] for r in out) <= b
    for r in out:
        assert 0 <= r["planned"] <= r["cap"]
    if all(r["planned"] < r["cap"] for r in out):
        # nothing ever hit its cap → every round was a pure floor
        # split; dust after the rounds is bounded by the source count
        dust = b - sum(r["planned"] for r in out)
        assert dust < len(out)
