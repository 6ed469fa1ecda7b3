"""URL canonicalization rules (unit-level, hand-pinned expected
values), the domain rollup's blocklist anti-join, and the full web
pre-filter chain (HTML extract → canonicalize → domain rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators import html_extract as hx
from website_traffic_etl_gcp_spark.operators import urls as ur


def _canon(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "u string")
    return df.select(ur.canonical_url(F.col("u")).alias("c")).collect()[0][
        "c"
    ]


def test_canonicalization_rules_pinned(spark):
    cases = {
        # case-folding + default https port + fragment
        "HTTPS://WWW.Ex.COM:443/a#frag": "https://www.ex.com/a",
        # default http port, dup slashes, trailing slash
        "http://ex.com:80//a//b/": "http://ex.com/a/b",
        # non-default port kept
        "http://ex.com:8080/a": "http://ex.com:8080/a",
        # tracking params dropped, survivors sorted, '?' kept
        "http://ex.com/a?utm_source=x&b=2&a=1&gclid=z": (
            "http://ex.com/a?a=1&b=2"
        ),
        # query emptied entirely -> '?' dropped
        "http://ex.com/a?utm_campaign=x&fbclid=y": "http://ex.com/a",
        # bare host -> root path
        "http://ex.com": "http://ex.com/",
        # root path trailing slash survives
        "http://ex.com/?id=1": "http://ex.com/?id=1",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_domain_is_last_two_labels(spark):
    df = spark.createDataFrame(
        [("http://a.b.site.co/x",), ("https://WWW.One.Com/y",)],
        "u string",
    )
    got = [
        r["d"]
        for r in df.select(ur.domain_col(F.col("u")).alias("d")).collect()
    ]
    assert got == ["site.co", "one.com"]


def test_planted_urls_exercise_every_rule(spark):
    """Across doc_ids 0..59 the plant must produce at least one URL
    hitting each canonicalization rule — otherwise the oracle parity
    proves less than it claims."""
    df = spark.createDataFrame(
        [(i, "src1") for i in range(60)], "doc_id bigint, source string"
    )
    urls = [
        r["u"]
        for r in df.select(ur.planted_url().alias("u")).collect()
    ]
    assert any(":443/" in u for u in urls)  # default https port
    assert any(":80/" in u for u in urls)  # default http port
    assert any(":8080/" in u for u in urls)  # non-default port
    assert any("//" in u.split("://")[1] for u in urls)  # dup slash
    assert any("#sect" in u for u in urls)  # fragment
    assert any("utm_source" in u for u in urls)  # tracking
    assert any("&b=2&a=1" in u for u in urls)  # unsorted params
    assert any(u.startswith("HTTPS://") for u in urls)  # upper scheme
    assert any("WWW." in u for u in urls)  # upper www host


def test_rollup_blocklist_anti_join(spark):
    from website_traffic_etl_gcp_spark.plans.web import (
        domain_quality_rollup,
    )
    from .conftest import SF_DIR

    domains = {
        r["domain"] for r in domain_quality_rollup(spark, SF_DIR).collect()
    }
    assert domains, "rollup produced no domains"
    blocked = {f"{s}.com" for s in ur.BLOCKED_SOURCES}
    assert not (domains & blocked)


def test_web_prefilter_chain(spark):
    """The composed pipeline a crawl pre-filter runs: planted HTML →
    boilerplate extraction → URL canonicalization → per-domain rollup
    keyed by canonical domain, content stats carried through."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "srcA"),
            (2, "short text", "srcA"),
            (3, "another body of plain content for page three", "srcB"),
        ],
        "doc_id bigint, text string, source string",
    )
    planted = docs.select(
        "doc_id",
        "source",
        hx.plant_boilerplate_html("doc_id", "text").alias("html"),
    )
    extracted = hx.extract_main_content(planted, "html").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    url = ur.planted_url()
    chained = (
        extracted.select(
            "doc_id",
            "content_chars",
            ur.domain_col(url).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("content_chars").alias("content_chars"),
        )
        .collect()
    )
    by_dom = {r["domain"]: r for r in chained}
    assert set(by_dom) == {"srca.com", "srcb.com"}
    assert by_dom["srca.com"]["n_pages"] == 2
    assert all(r["content_chars"] > 0 for r in chained)


def test_prefilter_chain_stage_verdicts(spark):
    """The chain's reason column is the FIRST failing stage and the
    keep bit agrees with it; blocked domains really occur in the
    corpus; the passthrough domain is byte-identical to the
    url_canonicalize domain for every doc (row-order integrity of the
    Arrow passthrough)."""
    from website_traffic_etl_gcp_spark.plans.web import (
        url_canonicalize,
        web_prefilter_chain,
    )
    from .conftest import SF_DIR

    rows = web_prefilter_chain(spark, SF_DIR).collect()
    assert rows
    blocked_set = {f"{s}.com" for s in ur.BLOCKED_SOURCES}
    n_blocked = 0
    for r in rows:
        assert r["keep"] == (r["reason"] == "keep")
        assert r["blocked"] == (r["domain"] in blocked_set)
        if r["blocked"]:
            n_blocked += 1
            assert r["reason"] == "blocked_domain"
        elif r["content_chars"] < 1:
            assert r["reason"] == "no_content"
        if r["reason"] == "keep":
            assert not r["blocked"] and r["content_chars"] >= 1
    assert n_blocked > 0, "corpus never exercised the blocklist stage"
    assert any(r["reason"] == "keep" for r in rows)
    chain_dom = {r["doc_id"]: r["domain"] for r in rows}
    canon_dom = {
        r["doc_id"]: r["domain"]
        for r in url_canonicalize(spark, SF_DIR).collect()
    }
    assert chain_dom == canon_dom


def test_extract_passthrough_columns(spark):
    """extract_main_content carries passthrough columns through the
    Arrow batch aligned with their rows."""
    df = spark.createDataFrame(
        [
            (1, "<p>one two three four five six</p>", "x", 10),
            (2, "<p>seven eight nine ten eleven twelve</p>", "y", 20),
        ],
        "doc_id bigint, html string, tag string, m bigint",
    )
    out = hx.extract_main_content(
        df, "html", passthrough=("tag", "m")
    ).collect()
    assert {(r["doc_id"], r["tag"], r["m"]) for r in out} == {
        (1, "x", 10),
        (2, "y", 20),
    }
    assert all(r["content_chars"] > 0 for r in out)


def test_domain_cap_sample_two_stage_exact(spark):
    """The salted two-stage top-K must equal the single-window
    definition exactly, the cap must bind, and the coin must make the
    sample deterministic across runs."""
    from pyspark.sql import Window

    from website_traffic_etl_gcp_spark.functions.texthash import md5_long
    from website_traffic_etl_gcp_spark.plans.web import (
        DOMAIN_CAP,
        domain_cap_sample,
    )
    from .conftest import SF_DIR

    got = domain_cap_sample(spark, SF_DIR)
    rows = got.collect()
    per_dom = {}
    for r in rows:
        per_dom.setdefault(r["domain"], []).append(r["sample_rank"])
    assert per_dom
    for dom, ranks in per_dom.items():
        assert len(ranks) <= DOMAIN_CAP
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), dom
    # the cap binds on this corpus (otherwise the query is a no-op)
    assert any(len(v) == DOMAIN_CAP for v in per_dom.values())
    # reference: single-window definition, no salting
    from website_traffic_etl_gcp_spark.catalog import load_table
    from website_traffic_etl_gcp_spark.operators import urls as u2

    d = load_table(spark, SF_DIR, "documents")
    coin = md5_long(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("domain").orderBy("coin", "doc_id")
    ref = (
        d.select(
            "doc_id",
            u2.domain_col(u2.planted_url()).alias("domain"),
            coin.alias("coin"),
        )
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= DOMAIN_CAP)
        .select("doc_id", "domain", "sample_rank")
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, ref.collect()))
    # deterministic: second run identical
    assert sorted(map(tuple, domain_cap_sample(spark, SF_DIR).collect())) == sorted(
        map(tuple, rows)
    )


def test_prefilter_chain_plan_has_no_keyed_exchange(spark):
    """The chain's 100 TB claim — extraction + domain + blocklist +
    quality verdict as ONE map pipeline — asserted on the physical
    plan: no KEYED (hash/range) Exchange anywhere; the only shuffle
    permitted is the deliberate round-robin narrow-input fan-out,
    which disappears on wide inputs. The unigram segmenter's
    companion claim (exactly the one corpus word-count hash shuffle)
    is pinned alongside."""
    from website_traffic_etl_gcp_spark.plans.selection import (
        unigram_lm_segment,
    )
    from website_traffic_etl_gcp_spark.plans.web import web_prefilter_chain
    from .conftest import SF_DIR

    plan = (
        web_prefilter_chain(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    plan2 = (
        unigram_lm_segment(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan2.count("Exchange hashpartitioning") == 1, plan2
