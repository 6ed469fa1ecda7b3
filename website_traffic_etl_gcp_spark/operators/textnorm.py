"""Unicode normalization — the vectorized scalar-UDF path.

A multilingual corpus carries the same grapheme in composed (U+00E9)
and decomposed (e + U+0301) forms; every hash-based operator upstream
(exact dedup, shingles, minhash) treats them as different bytes unless
the pipeline normalizes first. Spark has no built-in Unicode
normalizer, so this is the honest use case for an Arrow-vectorized
``pandas_udf``: one Python call per BATCH (pandas ``str.normalize``,
backed by unicodedata), never per row — the scalar-UDF complement to
the ``mapInPandas`` plumbing in operators/multimodal.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC per Arrow batch (NULLs pass through)."""
    return s.str.normalize("NFC")


def with_nfc(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return nfc_normalize(c)
