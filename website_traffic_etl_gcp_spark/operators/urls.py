"""URL canonicalization + domain rollup primitives (web-corpus side).

The other half of a web pre-filter (next to operators/html_extract.py,
which handles content): URL normalization so per-domain statistics,
blocklists, and dedup keys aggregate correctly, all in pure Catalyst
column algebra — regexp_extract / split / array_sort / array_join run
inside whole-stage codegen, and every regex is RE2-compatible (no
lookarounds) so the DuckDB oracle evaluates the IDENTICAL patterns.

Canonicalization rules (the standard crawl-frontier set):
1. scheme and host lowercased
2. fragment dropped
3. default ports stripped (http:80, https:443); others kept
4. duplicate slashes in the path collapsed
5. trailing slash stripped (except the root path)
6. tracking parameters removed (utm_*, gclid=, fbclid=)
7. surviving query params sorted lexicographically (full 'k=v'
   string order — a fixed convention, not RFC semantics)
8. an emptied query drops its '?'

The corpus has no URL column, so the registry queries PLANT a
deterministic URL per document from (doc_id, source) — mod-class
driven so every rule above is exercised (upper-case hosts, default
and non-default ports, dup/trailing slashes, shuffled + tracking
params, fragments) — the same planted-input pattern as
unicode_nfc_normalize and the HTML extraction pair. Both the plant
and the canonicalizer exist as a Spark Column AND a DuckDB SQL
fragment kept in this module so the two sides evolve together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")

# planted per-domain blocklist for the anti-join rollup
BLOCKED_SOURCES = ("src4", "src11", "src17")


# ---- planted URL (Spark + SQL twins) -----------------------------------


def planted_url(doc_id: str = "doc_id", source: str = "source") -> Column:
    d = F.col(doc_id)
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    host = F.when(
        d % 4 == 0, F.upper(F.concat(F.lit("www."), F.col(source), F.lit(".com")))
    ).otherwise(F.lower(F.concat(F.col(source), F.lit(".Com"))))
    port = (
        F.when(d % 6 == 0, F.lit(":443"))
        .when(d % 6 == 3, F.lit(":80"))
        .when(d % 6 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/cat"),
        F.when(d % 5 == 0, F.lit("//")).otherwise(F.lit("/")),
        (d % 7).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    q_main = F.concat(F.lit("id="), d.cast("string"))
    q_extra = F.when(d % 11 == 0, F.lit("&b=2&a=1")).otherwise(F.lit(""))
    q_track = F.concat(
        F.when(d % 3 == 0, F.lit("&utm_source=feed")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("&gclid=abc123")).otherwise(F.lit("")),
    )
    query = F.when(
        d % 2 == 1, F.concat(F.lit("?"), F.concat_ws("", q_track, q_extra, F.lit("&"), q_main).substr(F.lit(2), F.lit(1000)))
    ).otherwise(F.concat(F.lit("?"), q_main, q_extra, q_track))
    frag = F.when(
        d % 5 == 0, F.concat(F.lit("#sect"), (d % 3).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


SQL_PLANTED_URL = """
    (CASE WHEN {d} % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://'
    || (CASE WHEN {d} % 4 = 0 THEN upper('www.' || {src} || '.com')
             ELSE lower({src} || '.Com') END)
    || (CASE WHEN {d} % 6 = 0 THEN ':443'
             WHEN {d} % 6 = 3 THEN ':80'
             WHEN {d} % 6 = 1 THEN ':8080' ELSE '' END)
    || '/cat' || (CASE WHEN {d} % 5 = 0 THEN '//' ELSE '/' END)
    || CAST({d} % 7 AS VARCHAR)
    || (CASE WHEN {d} % 3 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN {d} % 2 = 1
        THEN '?' || substr(
            (CASE WHEN {d} % 3 = 0 THEN '&utm_source=feed' ELSE '' END)
            || (CASE WHEN {d} % 7 = 0 THEN '&gclid=abc123' ELSE '' END)
            || (CASE WHEN {d} % 11 = 0 THEN '&b=2&a=1' ELSE '' END)
            || '&id=' || CAST({d} AS VARCHAR), 2, 1000)
        ELSE '?id=' || CAST({d} AS VARCHAR)
            || (CASE WHEN {d} % 11 = 0 THEN '&b=2&a=1' ELSE '' END)
            || (CASE WHEN {d} % 3 = 0 THEN '&utm_source=feed' ELSE '' END)
            || (CASE WHEN {d} % 7 = 0 THEN '&gclid=abc123' ELSE '' END)
        END)
    || (CASE WHEN {d} % 5 = 0 THEN '#sect' || CAST({d} % 3 AS VARCHAR)
        ELSE '' END)
"""


# ---- canonicalizer (Spark + SQL twins) ---------------------------------

_RE_SCHEME = "^([A-Za-z]+)://"
_RE_AUTH = "^[A-Za-z]+://([^/?#]*)"
_RE_HOST = "^([^:]*)"
_RE_PORT = ":([0-9]+)$"
_RE_PATH = "^[A-Za-z]+://[^/?#]*([^?#]*)"
# anchored before the fragment: [^#?]* walks to the FIRST '?' or '#',
# and the match only succeeds when that first delimiter is '?', so
# fragment content (http://h/p#a?x=1) can never be resurrected as
# query params. RE2-compatible (no lookarounds), identical in both
# engines.
_RE_QUERY = r"^[^#?]*\?([^#]*)"
_RE_DOMAIN = r"([^.]+\.[^.]+)$"


def _clean_params(query: Column) -> Column:
    """Drop tracking params, sort the survivors (empty-string safe)."""
    parts = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~x.startswith(TRACKING_PREFIXES[0])
        & ~x.startswith(TRACKING_PREFIXES[1])
        & ~x.startswith(TRACKING_PREFIXES[2]),
    )
    return F.array_join(F.array_sort(parts), "&")


def url_parts(url: Column) -> dict[str, Column]:
    """scheme/host/port/path/query — '' when a part is absent (both
    engines' regexp_extract return '' on no-match)."""
    auth = F.regexp_extract(url, _RE_AUTH, 1)
    return {
        "scheme": F.lower(F.regexp_extract(url, _RE_SCHEME, 1)),
        "host": F.lower(F.regexp_extract(auth, _RE_HOST, 1)),
        "port": F.regexp_extract(auth, _RE_PORT, 1),
        "path": F.regexp_extract(url, _RE_PATH, 1),
        "query": F.regexp_extract(url, _RE_QUERY, 1),
    }


def canonical_url(url: Column) -> Column:
    p = url_parts(url)
    keep_port = (
        (p["port"] != "")
        & ~((p["scheme"] == F.lit("http")) & (p["port"] == F.lit("80")))
        & ~((p["scheme"] == F.lit("https")) & (p["port"] == F.lit("443")))
    )
    portpart = F.when(
        keep_port, F.concat(F.lit(":"), p["port"])
    ).otherwise(F.lit(""))
    path = F.regexp_replace(p["path"], "/+", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    cleaned = _clean_params(p["query"])
    querypart = F.when(
        cleaned != "", F.concat(F.lit("?"), cleaned)
    ).otherwise(F.lit(""))
    return F.concat(
        p["scheme"], F.lit("://"), p["host"], portpart, path, querypart
    )


def host_col(url: Column) -> Column:
    return url_parts(url)["host"]


def domain_col(url: Column) -> Column:
    """Registrable domain, simplified to the last two host labels
    (a real deployment swaps in the public-suffix list)."""
    return F.regexp_extract(host_col(url), _RE_DOMAIN, 1)


def _sql_clean_params(query: str) -> str:
    preds = " AND ".join(
        f"NOT starts_with(x, '{p}')" for p in TRACKING_PREFIXES
    )
    return (
        f"array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), x -> x != '' AND {preds})), '&')"
    )


SQL_URL_PARTS = {
    "scheme": f"lower(regexp_extract({{u}}, '{_RE_SCHEME}', 1))",
    "host": (
        f"lower(regexp_extract(regexp_extract({{u}}, '{_RE_AUTH}', 1), "
        f"'{_RE_HOST}', 1))"
    ),
    "port": (
        f"regexp_extract(regexp_extract({{u}}, '{_RE_AUTH}', 1), "
        f"'{_RE_PORT}', 1)"
    ),
    "path": f"regexp_extract({{u}}, '{_RE_PATH}', 1)",
    "query": f"regexp_extract({{u}}, '{_RE_QUERY}', 1)",
}


def sql_canonical_url(u: str) -> str:
    """DuckDB twin of canonical_url — evaluates the same regexes and
    rebuild steps over the expression ``u``."""
    scheme = SQL_URL_PARTS["scheme"].format(u=u)
    host = SQL_URL_PARTS["host"].format(u=u)
    port = SQL_URL_PARTS["port"].format(u=u)
    path = SQL_URL_PARTS["path"].format(u=u)
    query = SQL_URL_PARTS["query"].format(u=u)
    path_norm = (
        f"(CASE WHEN regexp_replace({path}, '/+', '/', 'g') = '' THEN '/' "
        f"ELSE regexp_replace({path}, '/+', '/', 'g') END)"
    )
    path_final = (
        f"(CASE WHEN length({path_norm}) > 1 AND {path_norm} LIKE '%/' "
        f"THEN substr({path_norm}, 1, length({path_norm}) - 1) "
        f"ELSE {path_norm} END)"
    )
    cleaned = _sql_clean_params(query)
    return (
        f"{scheme} || '://' || {host} "
        f"|| (CASE WHEN {port} != '' "
        f"    AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"    AND NOT ({scheme} = 'https' AND {port} = '443') "
        f"    THEN ':' || {port} ELSE '' END) "
        f"|| {path_final} "
        f"|| (CASE WHEN {cleaned} != '' THEN '?' || {cleaned} "
        f"    ELSE '' END)"
    )


def sql_domain(u: str) -> str:
    host = SQL_URL_PARTS["host"].format(u=u)
    return f"regexp_extract({host}, '{_RE_DOMAIN}', 1)"
