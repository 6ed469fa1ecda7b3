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
from .documents import _SQL_DOCS_NORM
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
    from .documents import quality_filter_verdicts

    d = _docs(spark, sf_dir)
    url = ur.planted_url()
    keep = quality_filter_verdicts(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("k")
    )
    blocked = F.broadcast(
        d.sparkSession.createDataFrame(
            [(f"{s}.com",) for s in ur.BLOCKED_SOURCES],
            "domain string",
        )
    )
    from ..functions.texthash import normalize_text

    per_doc = d.select(
        "doc_id",
        "lang",
        F.length(normalize_text("text")).cast("bigint").alias("nc"),
        ur.domain_col(url).alias("domain"),
    ).join(keep, "doc_id")
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
