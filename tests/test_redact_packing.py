"""Unit tests for the pretraining-scrub operators added in round 2:
PII redaction, sequence packing, multimodal resize/chunk plumbing.
(Their registry entries are oracle-checked in test_queries_oracle;
these tests pin the operator semantics on hand-built inputs.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators import multimodal as mm
from website_traffic_etl_gcp_spark.operators.packing import (
    pack_bins,
    pack_offsets,
)
from website_traffic_etl_gcp_spark.operators.redact import redact_pii


def test_redact_pii_counts_and_output(spark):
    rows = [
        (0, "no pii here at all"),
        (1, "mail me at a.b-c_1@mail.example.org thanks"),
        (2, "two mails x@y.io and z@w.co plus id 1234567"),
        (3, "digits 12345 are short but 123456 is an id"),
        (4, "a@b.cd 999999999 a@b.cd"),  # duplicate hits count twice
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[0]["n_emails"], got[0]["n_ids"]) == (0, 0)
    assert (got[1]["n_emails"], got[1]["n_ids"]) == (1, 0)
    assert (got[2]["n_emails"], got[2]["n_ids"]) == (2, 1)
    # 12345 is below the 6-digit floor; 123456 matches
    assert (got[3]["n_emails"], got[3]["n_ids"]) == (0, 1)
    assert (got[4]["n_emails"], got[4]["n_ids"]) == (2, 1)
    # digits inside an email are consumed by the email redaction,
    # never double-counted: 'a.b-c_1@...' has no surviving digit run
    assert got[1]["n_ids"] == 0


def test_pack_offsets_contract(spark):
    # two groups; doc order inside a group is ascending id
    rows = [
        ("g1", 1, 300),
        ("g1", 2, 300),  # starts at 300 → bin 0 (straddles into 1)
        ("g1", 3, 100),  # starts at 600 → bin 1
        ("g2", 4, 600),  # starts at 0 → bin 0 even though > cap
        ("g2", 5, 10),   # starts at 600 → bin 1
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n"])
    packed = pack_offsets(df, F.col("n"), cap=512)
    got = {r["doc_id"]: r for r in packed.collect()}
    assert [got[i]["stream_offset"] for i in (1, 2, 3)] == [0, 300, 600]
    assert [got[i]["bin_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert (got[4]["bin_id"], got[5]["bin_id"]) == (0, 1)

    bins = {
        (r["source"], r["bin_id"]): r for r in pack_bins(packed).collect()
    }
    assert bins[("g1", 0)]["n_docs"] == 2
    assert bins[("g1", 0)]["n_tokens"] == 600
    assert bins[("g1", 1)]["first_doc_id"] == 3
    # token totals conserved: sum of bin fills == sum of doc tokens
    assert sum(r["n_tokens"] for r in bins.values()) == sum(
        n for _, _, n in rows
    )


def test_aspect_fit_integer_contract():
    # long side pinned to the box, short side floor-scaled, floor ≥ 1
    assert mm.aspect_fit(448, 224) == (224, 112)
    assert mm.aspect_fit(224, 448) == (112, 224)
    assert mm.aspect_fit(100, 100) == (224, 224)  # upscale square
    assert mm.aspect_fit(10000, 16) == (224, 1)  # extreme ratio floors to 1
    w, h = mm.aspect_fit(517, 33)
    assert max(w, h) == mm.RESIZE_BOX and min(w, h) >= 1


def test_chunk_payload_conserves_length(spark):
    texts = ["", "x" * 255, "y" * 256, "z" * 257, "w" * 1024]
    df = mm.with_payload(
        spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    )
    got: dict[int, list] = {}
    for r in mm.chunk_payload(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(got[i], key=lambda r: r["chunk_idx"])
        expected_n = max(1, -(-len(t) // mm.CHUNK_CHARS))
        assert len(chunks) == expected_n, (i, len(t))
        assert sum(c["chunk_len"] for c in chunks) == len(t)
        # every chunk except the last is exactly CHUNK_CHARS
        assert all(
            c["chunk_len"] == mm.CHUNK_CHARS for c in chunks[:-1]
        )


def test_scd2_apply_contract(spark):
    from website_traffic_etl_gcp_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            # k=1: current A, will change to B
            (1, "A", "2024-01-01", None, True),
            # k=2: has history; current C unchanged by the batch
            (2, "B", "2024-01-01", "2024-03-01", False),
            (2, "C", "2024-03-01", None, True),
            # k=3: no-op change (same value arrives again)
            (3, "D", "2024-01-01", None, True),
        ],
        "key int, attr string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "B", "2024-06-01"), (3, "D", "2024-06-01"), (9, "Z", "2024-06-01")],
        "key int, new_attr string, change_ts string",
    )
    out = scd2_apply(dim, changes, "key", "attr", "change_ts")
    rows = {
        (r["key"], r["attr"], r["valid_from"]): r for r in out.collect()
    }
    # k=1 versioned: old closed, new current
    assert rows[(1, "A", "2024-01-01")]["valid_to"] == "2024-06-01"
    assert rows[(1, "A", "2024-01-01")]["is_current"] is False
    assert rows[(1, "B", "2024-06-01")]["is_current"] is True
    assert rows[(1, "B", "2024-06-01")]["valid_to"] is None
    # k=2 untouched, history preserved
    assert rows[(2, "B", "2024-01-01")]["valid_to"] == "2024-03-01"
    assert rows[(2, "C", "2024-03-01")]["is_current"] is True
    # k=3 no-op: exactly one row, still the original version
    assert rows[(3, "D", "2024-01-01")]["is_current"] is True
    assert len([k for k in rows if k[0] == 3]) == 1
    # k=9 brand-new key inserted as current
    assert rows[(9, "Z", "2024-06-01")]["is_current"] is True
    assert len(rows) == 6

    # replay idempotency: applying the same batch to the result is a
    # no-op (every change now matches the current value)
    again = scd2_apply(out, changes, "key", "attr", "change_ts")
    assert {
        (r["key"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in again.collect()
    } == {
        (r["key"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }


def test_scd2_null_current_attr_still_versions(spark):
    """A NULL current attribute is a legal state (late-arriving dims):
    a real value arriving must version the row, not silently drop it
    (plain != would NULL out the filter on both branches)."""
    from website_traffic_etl_gcp_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, None, "2024-01-01", None, True)],
        "key int, attr string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "A", "2024-06-01")], "key int, new_attr string, change_ts string"
    )
    out = scd2_apply(dim, changes, "key", "attr", "change_ts")
    rows = {(r["attr"], r["is_current"]) for r in out.collect()}
    assert rows == {(None, False), ("A", True)}
    assert out.count() == 2


def test_bloom_prefilter_contract(spark):
    """No false negatives (every truly-matching row survives) and the
    sketch actually reduces the probe side before the exact join."""
    from website_traffic_etl_gcp_spark.catalog import load_table
    from website_traffic_etl_gcp_spark.operators.bloom import bloom_prefilter

    from .conftest import SF_DIR

    o = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    pre = bloom_prefilter(li, o, "l_orderkey", "o_orderkey")

    n_total = li.count()
    n_pre = pre.count()
    n_exact = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()
    # superset of the exact matches (no false negatives)...
    assert n_exact <= n_pre
    missing = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .exceptAll(pre.join(o, pre.l_orderkey == o.o_orderkey, "left_semi"))
        .count()
    )
    assert missing == 0
    # ...and a genuine reduction of the probe side
    assert n_pre < n_total


def test_chunk_windows_cover_every_token(spark, tmp_path):
    """Tail coverage: windows are stride-aligned PLUS a clamped final
    window, so every token of every doc lands in >=1 chunk — checked
    against a pure-Python reference on crafted lengths (5, 32, 56, 57,
    70, 81 tokens: aligned, sub-window, and misaligned tails)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

    SIZE, STRIDE = 32, 24
    lengths = [5, 32, 56, 57, 70, 81]
    docs = []
    for i, n in enumerate(lengths):
        toks = [f"w{i}t{j}" for j in range(n)]
        docs.append((i, "en", "srcT", len(" ".join(toks)), " ".join(toks)))
    table = pa.table(
        {
            "doc_id": [d[0] for d in docs],
            "lang": [d[1] for d in docs],
            "source": [d[2] for d in docs],
            "n_chars": [d[3] for d in docs],
            "text": [d[4] for d in docs],
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    rows = (
        REGISTRY["doc_chunk_windows"].builder(spark, str(tmp_path)).collect()
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_tokens"], r["chunk_hash"])
        for r in rows
    }
    # no duplicate (doc, idx) rows hiding behind the dict collapse
    assert len(rows) == len(got)

    expected = {}
    for i, n in enumerate(lengths):
        toks = [f"w{i}t{j}" for j in range(n)]
        if n >= SIZE:
            starts = sorted(
                set(range(1, n - SIZE + 2, STRIDE)) | {n - SIZE + 1}
            )
        else:
            starts = [1]
        covered = set()
        for s in starts:
            idx = (s - 1 + STRIDE - 1) // STRIDE
            chunk = toks[s - 1 : s - 1 + SIZE]
            covered.update(range(s, s + len(chunk)))
            expected[(i, idx)] = (
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
        assert covered == set(range(1, n + 1)), f"doc {i} tail dropped"

    assert got == expected
