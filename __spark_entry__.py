"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship corpus-pipeline query on sf0.001;
``queries()`` exposes one DataFrame builder per implemented operator
from SURVEY.md §2 plus the corpus-pipeline operators (dedupe /
similarity / text analysis / multimodal / crawl round); ``oracle_sql()``
carries the DuckDB twin for every SQL-expressible entry (see
``crawlkit/queries.py`` for the cross-engine determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from crawlkit import queries as Q
from crawlkit import textops

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the text-corpus triage pipeline over sf0.001 documents —
    token/quality/langid/fingerprint signals per doc, the shape every
    crawl round's results feed into downstream."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    return docs.select(
        "doc_id",
        "lang",
        textops.token_count("text").cast("long").alias("n_tokens"),
        F.round(textops.stopword_ratio("text"), 3).alias("stop_ratio"),
        F.round(textops.quality_score("text"), 3).alias("quality"),
        textops.langid("text").alias("langid_guess"),
        textops.fingerprint("text", 8).alias("fingerprint"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in Q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in Q.REGISTRY.items() if sql is not None
    }
