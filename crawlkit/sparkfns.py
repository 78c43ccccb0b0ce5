"""Arrow-vectorized UDF wrappers + narrow column helpers (S7/P2).

All Python kernels are pandas UDFs over Arrow batches — no per-row
Python crosses the JVM boundary (``input_hint``).  The 64-bit url hash
is computed JVM-side with the built-in ``xxhash64`` so it stays inside
whole-stage codegen and matches across the engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from . import canon


@F.pandas_udf(T.StringType())
def canonical_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canon.canonical_url(u) if isinstance(u, str) else None)


@F.pandas_udf(T.BooleanType())
def is_valid_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canon.is_valid_url)


@F.pandas_udf(T.StringType())
def url_host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canon.url_host(u) if isinstance(u, str) else None)


def url_hash_col(url_canon: Column | str) -> Column:
    """xxhash64 of the canonical url — JVM-side, codegen-friendly."""
    col = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.xxhash64(col)


def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """P2 validity + S7 canonicalization + hash + host, as columns.

    Invalid URLs are *filtered out* (reference rejects them with 400,
    ``src/api.ts:62-64``).
    """
    return (
        df.where(is_valid_url_udf(F.col(url_col)))
        .withColumn("url_canon", canonical_url_udf(F.col(url_col)))
        .withColumn("url_hash", url_hash_col("url_canon"))
        .withColumn("host", url_host_udf(F.col("url_canon")))
    )
