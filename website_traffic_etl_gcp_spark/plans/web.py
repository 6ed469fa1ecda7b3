"""§2D+ — Web-corpus URL/domain operators (round 12).

The URL-metadata half of a crawl pre-filter, complementing the
content half (text_extract_html): canonicalize URLs so domain-level
statistics aggregate correctly, roll quality up per domain, and
anti-join a blocklist — the CCNet/RefinedWeb "domain filtering" stage.

The corpus has no URL column, so both queries PLANT a deterministic
URL per document from (doc_id, source) — mod-class driven so every
canonicalization rule is exercised (operators/urls.py holds the
Spark/SQL twin definitions). All string work is RE2-safe regex +
array column algebra inside whole-stage codegen; the rollup is one
hash aggregation on the domain key. Corpus-linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import urls as ur
from .documents import (
    QSCORE_MIN,
    _SQL_DOCS_NORM,
    _SQL_EXTRACT_STAT_COLS,
    _SQL_HTML_EXTRACT,
    _SQL_QSCORE,
    extract_quality_score_col,
    extract_quality_stats,
)
from .registry import register
from .selection import _QC_KEEP


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


_SQL_URL = ur.SQL_PLANTED_URL.format(d="doc_id", src="source")


@register(
    "url_canonicalize",
    oracle=f"""
    SELECT doc_id,
           {_SQL_URL} AS url_raw,
           {ur.sql_canonical_url(f'({_SQL_URL})')} AS url_canonical,
           {ur.SQL_URL_PARTS['host'].format(u=f'({_SQL_URL})')} AS host,
           {ur.sql_domain(f'({_SQL_URL})')} AS domain
    FROM documents
    """,
    tags=("documents", "web"),
    bench=True,
    doc="URL canonicalization in pure Catalyst column algebra: "
    "lowercase scheme/host, fragment dropped, default ports stripped "
    "(http:80/https:443, others kept), duplicate path slashes "
    "collapsed, trailing slash stripped (except root), tracking "
    "params removed (utm_*/gclid/fbclid), surviving params "
    "lexicographically sorted, emptied query dropped. Inputs are "
    "per-doc PLANTED URLs (mod-class driven so every rule fires on "
    "every corpus — the unicode_nfc_normalize pattern); all regexes "
    "are RE2-compatible so the DuckDB oracle evaluates the IDENTICAL "
    "expressions. Map-only projection, zero shuffle, zero Python. "
    "operators/urls.py.",
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = ur.planted_url()
    return _docs(spark, sf_dir).select(
        "doc_id",
        url.alias("url_raw"),
        ur.canonical_url(url).alias("url_canonical"),
        ur.host_col(url).alias("host"),
        ur.domain_col(url).alias("domain"),
    )


_SQL_BLOCKED = ", ".join(
    f"'{s}.com'" for s in ur.BLOCKED_SOURCES
)


@register(
    "domain_quality_rollup",
    oracle=f"""
    SELECT domain, n_docs, n_keep,
           CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) AS keep_rate,
           n_langs, n_chars_total,
           CAST(n_chars_total AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS mean_chars
    FROM (
        SELECT {ur.sql_domain(f'({_SQL_URL})')} AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN {_QC_KEEP} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_keep,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(length(norm)) AS BIGINT) AS n_chars_total
        FROM ({_SQL_DOCS_NORM})
        GROUP BY 1
    )
    WHERE domain NOT IN ({_SQL_BLOCKED})
    """,
    tags=("documents", "web"),
    bench=True,
    doc="Per-domain quality rollup + blocklist anti-join — the domain-"
    "filtering stage of a web pipeline: canonical domain key from the "
    "planted URLs, per-domain doc counts, composite-filter keep "
    "counts/rate (the same C4/Gopher verdict quality_filter_verdicts "
    "emits), language spread, char mass; blocked domains removed by a "
    "LEFT ANTI join against the (broadcast) blocklist table. Exact "
    "integer counts, single int→double divisions. One hash "
    "aggregation on the domain key — corpus-linear, and the rollup "
    "output is bounded by the domain count, not the corpus. "
    "operators/urls.py.",
)
def domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import quality_keep_col

    d = _docs(spark, sf_dir)
    url = ur.planted_url()
    blocked = F.broadcast(
        d.sparkSession.createDataFrame(
            [(f"{s}.com",) for s in ur.BLOCKED_SOURCES],
            "domain string",
        )
    )
    from ..functions.partitioning import (
        CPU_HEAVY_MIN_PARTITION_BYTES,
        widen_narrow_input,
    )
    from ..functions.texthash import normalize_text

    # keep bit computed INLINE (quality_keep_col) — one map-only
    # projection, no corpus-sized join back on doc_id; the scan is
    # fanned out first (CPU-heavy threshold) because the interpreted
    # shingle HOF is the expensive part and a small parquet arrives
    # as 1-2 splits
    per_doc = widen_narrow_input(
        d, min_partition_bytes=CPU_HEAVY_MIN_PARTITION_BYTES
    ).select(
        "lang",
        F.length(normalize_text("text")).cast("bigint").alias("nc"),
        ur.domain_col(url).alias("domain"),
        quality_keep_col().cast("int").alias("k"),
    )
    agg = (
        per_doc.join(blocked, "domain", "left_anti")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("k").cast("bigint").alias("n_keep"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("nc").cast("bigint").alias("n_chars_total"),
        )
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_keep",
        (
            F.col("n_keep").cast("double") / F.col("n_docs").cast("double")
        ).alias("keep_rate"),
        "n_langs",
        "n_chars_total",
        (
            F.col("n_chars_total").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("mean_chars"),
    )


_SQL_CHAIN_BLOCKED = f"domain IN ({_SQL_BLOCKED})"


@register(
    "web_prefilter_chain",
    oracle=f"""
    WITH st AS (
        SELECT doc_id, content_chars,{_SQL_EXTRACT_STAT_COLS}
        FROM ({_SQL_HTML_EXTRACT})
    ),
    sc AS (
        SELECT doc_id, content_chars, {_SQL_QSCORE} AS q FROM st
    ),
    ud AS (
        SELECT doc_id, {ur.sql_domain(f'({_SQL_URL})')} AS domain
        FROM documents
    )
    SELECT sc.doc_id, ud.domain, sc.content_chars,
           CAST(round(q * 1e6, 0) AS BIGINT) AS score_micro,
           ({_SQL_CHAIN_BLOCKED}) AS blocked,
           (NOT ({_SQL_CHAIN_BLOCKED}) AND sc.content_chars >= 1
                AND q >= {QSCORE_MIN}) AS keep,
           CASE WHEN {_SQL_CHAIN_BLOCKED} THEN 'blocked_domain'
                WHEN sc.content_chars < 1 THEN 'no_content'
                WHEN q < {QSCORE_MIN} THEN 'low_quality'
                ELSE 'keep' END AS reason
    FROM sc JOIN ud USING (doc_id)
    """,
    tags=("documents", "web", "html"),
    bench=True,
    doc="The END-TO-END web pre-filter verdict, one row per crawled "
    "page: HTML boilerplate extraction (Arrow batch) -> canonical "
    "domain (column algebra over the planted URL) -> blocklist check "
    "-> composite quality score over the EXTRACTED text -> keep bit "
    "plus the first failing stage as a reason (blocked_domain / "
    "no_content / low_quality / keep). The domain rides THROUGH the "
    "extraction batch as a passthrough column, so the whole chain is "
    "ONE map stage — zero shuffles, zero corpus re-joins — which is "
    "the shape that matters at 100 TB: a full-corpus pre-filter pass "
    "costs exactly one scan. Oracle recomposes the same three shared "
    "SQL fragments (planted-page ground truth, domain rules, score) "
    "the component queries pin individually.",
)
def web_prefilter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import html_extract as hx

    from ..functions.partitioning import (
        CPU_HEAVY_MIN_PARTITION_BYTES,
        widen_narrow_input,
    )

    d = _docs(spark, sf_dir)
    url = ur.planted_url()
    # fan the narrow scan out before the CPU-heavy parse batch
    planted = widen_narrow_input(
        d, min_partition_bytes=CPU_HEAVY_MIN_PARTITION_BYTES
    ).select(
        "doc_id",
        hx.plant_boilerplate_html("doc_id", "text").alias("html"),
        ur.domain_col(url).alias("domain"),
    )
    ex = hx.extract_main_content(planted, "html", passthrough=("domain",))
    scored = extract_quality_stats(ex, "domain").withColumn(
        "q", extract_quality_score_col()
    )
    blocked = F.col("domain").isin(
        *[f"{s}.com" for s in ur.BLOCKED_SOURCES]
    )
    keep = (
        (~blocked)
        & (F.col("content_chars") >= 1)
        & (F.col("q") >= QSCORE_MIN)
    )
    reason = (
        F.when(blocked, F.lit("blocked_domain"))
        .when(F.col("content_chars") < 1, F.lit("no_content"))
        .when(F.col("q") < QSCORE_MIN, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return scored.select(
        "doc_id",
        "domain",
        "content_chars",
        F.round(F.col("q") * 1e6, 0).cast("bigint").alias("score_micro"),
        blocked.alias("blocked"),
        keep.alias("keep"),
        reason.alias("reason"),
    )


DOMAIN_CAP = 18  # max docs kept per domain (binds at every test SF)
CAP_SALTS = 8  # stage-1 fan-out cells per domain (kills hot-domain skew)

_SQL_CAP_COIN = "CAST(('0x' || substr(md5('cap:' || doc_id), 1, 15)) AS BIGINT)"


@register(
    "domain_cap_sample",
    oracle=f"""
    SELECT doc_id, domain, sample_rank
    FROM (
        SELECT doc_id, domain,
               CAST(row_number() OVER (
                   PARTITION BY domain ORDER BY coin, doc_id
               ) AS BIGINT) AS sample_rank
        FROM (
            SELECT doc_id,
                   {ur.sql_domain(f'({_SQL_URL})')} AS domain,
                   {_SQL_CAP_COIN} AS coin
            FROM documents
        )
    )
    WHERE sample_rank <= {DOMAIN_CAP}
    """,
    tags=("documents", "web", "selection"),
    bench=True,
    doc="Per-domain crawl-budget sampling (the RefinedWeb-style "
    "domain cap): keep at most DOMAIN_CAP docs per canonical domain, "
    "chosen by a deterministic md5 coin on the doc id — stable across "
    "runs, coordination-free, and uniform within every domain. The "
    "plan is the classic TWO-STAGE top-K: stage 1 takes the top "
    "DOMAIN_CAP per (domain, salt) cell so a hot domain fans out over "
    "CAP_SALTS reducers instead of funnelling one; stage 2 re-ranks "
    "the <= CAP_SALTS*DOMAIN_CAP survivors per domain — exact because "
    "the true per-domain top-K is contained in the union of per-cell "
    "top-Ks. Shuffle volume after stage 1 is bounded by domains x "
    "salts x cap, independent of corpus size. Oracle is the "
    "single-window row_number definition.",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.texthash import md5_long

    d = _docs(spark, sf_dir)
    url = ur.planted_url()
    coin = md5_long(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    base = d.select(
        "doc_id",
        ur.domain_col(url).alias("domain"),
        coin.alias("coin"),
        (F.col("doc_id") % CAP_SALTS).alias("salt"),
    )
    w1 = Window.partitionBy("domain", "salt").orderBy("coin", "doc_id")
    stage1 = base.withColumn(
        "r1", F.row_number().over(w1)
    ).filter(F.col("r1") <= DOMAIN_CAP)
    w2 = Window.partitionBy("domain").orderBy("coin", "doc_id")
    return (
        stage1.withColumn(
            "sample_rank", F.row_number().over(w2).cast("bigint")
        )
        .filter(F.col("sample_rank") <= DOMAIN_CAP)
        .select("doc_id", "domain", "sample_rank")
    )
