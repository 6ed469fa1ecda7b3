"""Pluggable token counting — real BPE when a tokenizer library is
installed, the deterministic regex tokenizer otherwise.

Mirrors the XLS import-try pattern (sources/readers.py): the Spark
plumbing (Arrow-batched pandas_udf, per-executor lazy import, encoder
cached per worker process) is real and tested either way; only the
encoder itself is environment-dependent. The ORACLE-registered
fertility query (plans/selection.py) always uses the regex path so
its DuckDB contract holds on any machine; ``bpe_token_count`` is the
drop-in column for the genuine-coverage diagnostic when ``tiktoken``
is present.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .texthash import word_tokens

__all__ = [
    "bpe_available",
    "bpe_token_count",
    "token_count",
]

BPE_ENCODING = "cl100k_base"


def bpe_available() -> bool:
    """True iff a real BPE tokenizer can be imported driver-side.
    (Executors re-import inside the UDF; in any sane deployment the
    driver and executor environments match.)"""
    try:
        import tiktoken  # noqa: F401

        return True
    except Exception:
        return False


def bpe_token_count(col: Column | str) -> Column:
    """Token count under a real BPE encoding, as an Arrow-batched
    pandas_udf: the encoder is imported and constructed ONCE per
    executor worker (module-level cache), then applied per batch —
    never per row via py4j. Raises at EXECUTION time with a clear
    message when tiktoken is missing; call ``bpe_available()`` first
    to choose a path at plan time."""

    @pandas_udf("long")
    def _count(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        try:
            import tiktoken
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "bpe_token_count requires the 'tiktoken' package on "
                f"executors: {e}"
            ) from e
        enc = tiktoken.get_encoding(BPE_ENCODING)
        return pd.Series(
            [len(enc.encode(t)) if t else 0 for t in texts.fillna("")],
            dtype="int64",
        )

    return _count(F.col(col) if isinstance(col, str) else col)


def token_count(col: Column | str, mode: str = "regex") -> Column:
    """Token-count column under the chosen tokenizer.

    - ``regex``  — the deterministic whitespace+regex tokenizer
      (SQL-expressible; what every oracle-backed query uses).
    - ``bpe``    — real BPE via tiktoken (requires the package).
    - ``auto``   — bpe when available, else regex.
    """
    if mode == "auto":
        mode = "bpe" if bpe_available() else "regex"
    if mode == "bpe":
        return bpe_token_count(col)
    if mode == "regex":
        return F.size(word_tokens(col)).cast("long")
    raise ValueError(f"unknown tokenizer mode {mode!r}")
