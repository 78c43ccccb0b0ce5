"""Document-store read API over the ``results`` table (S1/S2/P1).

The reference's point-read endpoints re-expressed as DataFrame
transforms: projection levels mirror ``/v1/document?output=``
(`/root/reference/src/api.ts:144-150`), the id lookup mirrors
``DocumentModel.fill`` (`src/db/model.ts:81-113`), and the latest-by-url
lookup mirrors ``findLatest`` — LIMIT 100 candidate scan, newest-first
byte-comparable id order, first row with a title
(`src/db/model.ts:161-191`).  On Iceberg these prune to one bucket via
``bucket(N, url_hash)`` partitioning; the scan + filter push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# P1 projection levels (src/api.ts:144-150); 'page' is page_len here —
# the engine stores the serialized-page length, not the body (the body
# lives in the pages table).
OUTPUT_COLUMNS: dict[str, list[str]] = {
    "basic": ["id", "url", "src", "title", "meta"],
    "detail": ["id", "url", "src", "title", "meta", "content"],
    "full": ["id", "url", "src", "title", "meta", "content", "html", "page_len"],
}


def select_output(results: DataFrame, output: str = "detail") -> DataFrame:
    try:
        cols = OUTPUT_COLUMNS[output]
    except KeyError:
        raise ValueError(f"unknown output level: {output}") from None
    return results.select(*cols)


def lookup_by_id(results: DataFrame, doc_id: bytes,
                 output: str = "detail") -> DataFrame:
    """S1 point lookup: WHERE id = ? LIMIT 1 with projection pushdown."""
    return select_output(
        results.where(F.col("id") == F.lit(doc_id)), output
    ).limit(1)


def find_latest(results: DataFrame, url_canon: str) -> DataFrame:
    """S2+A1: candidates for one url — newest-first byte-comparable id
    order, LIMIT 100 fan-out cap, first titled row — the reference's
    freshness-probe read (``src/db/model.ts:161-191``, which scans the
    id-clustered partition newest-first *before* its LIMIT 100).  The
    order-then-limit sequence matters: limiting an unordered scan would
    make the surviving candidate subset depend on partition order."""
    cand = (
        results.where(F.col("url_canon") == url_canon)
        .orderBy(F.col("id").desc())
        .limit(100)
        .where(F.col("title").isNotNull() & (F.col("title") != ""))
    )
    return cand.orderBy(F.col("id").desc()).limit(1)


def latest_per_url(results: DataFrame) -> DataFrame:
    """The corpus-wide variant (W1): newest titled row per url_canon —
    max_by keeps it a single shuffle with map-side partials."""
    titled = results.where(F.col("title").isNotNull() & (F.col("title") != ""))
    return (
        titled.groupBy("url_canon")
        .agg(F.max_by(F.struct(*titled.columns), F.struct("fetched_ts", "id")).alias("s"))
        .select("s.*")
    )
