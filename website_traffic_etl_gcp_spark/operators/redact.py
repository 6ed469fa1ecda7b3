"""PII redaction for training-data pipelines.

Emails and long digit runs (IDs, phone-ish numbers) are the two
highest-yield regex classes a pretraining scrub removes first. Both
patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — no backrefs, no lookaround — so the
operator is oracle-checkable: counts AND the md5 of the redacted text
must match across engines.

Pure Catalyst column algebra (regexp_count / regexp_replace) — the
scan stays in whole-stage codegen; nothing here is a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java/RE2-portable: char classes + bounded quantifiers only.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
LONG_DIGITS_RE = r"[0-9]{6,}"

EMAIL_TOKEN = "<EMAIL>"
ID_TOKEN = "<ID>"


def redact_text(col: Column) -> Column:
    """Replace every email, then every surviving long digit run.
    Order matters: the email pattern may contain digit runs, and the
    replacement tokens contain neither pattern, so the composition is
    confluent (same result as any interleaving)."""
    no_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(no_email, LONG_DIGITS_RE, ID_TOKEN)


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc redaction report: hit counts per class, redacted length,
    and the md5 of the redacted text (pins the exact output without
    shipping it). One projection — no shuffle, no UDF; at 100 TB this
    is a map-only pass that reads and writes each split once."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN), F.lit(LONG_DIGITS_RE)
        )
        .cast("bigint")
        .alias("n_ids"),
        F.length(redact_text(c)).alias("redacted_len"),
        F.md5(redact_text(c)).alias("redacted_md5"),
    )
