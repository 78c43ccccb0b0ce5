"""Fetch + extract stage (S6/J8 + X1-X10).

"Fetching" in the batch rebuild is a join of the (narrow) selected
frontier against the Common-Crawl-style ``pages`` table on the
canonical url (SURVEY.md J8) — the reference's network fetch
(``/root/reference/src/crawler.ts:17-110``) replaced by a table scan, so
byte-identical extraction is what's verified.  Extraction runs in ONE
``mapInPandas`` pass over Arrow batches: per batch, the pure-Python
kernel (``extract.py``) computes title/meta/region-html/CBOR/text/links.

Shuffle hygiene: only the frontier's narrow key columns are joined into
the wide pages scan; the MB-scale raw ``html`` bytes never pass through
more than the single fetch join, and the stage output drops them
(results carry the canonical re-rendered html + page_len only,
mirroring the reference's stored doc row and its 1 MiB page/content
guard, ``src/api.ts:96-102`` + ``src/db/model.ts:73-79,142-147``).
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import canon
from .extract import MAX_CELL_SIZE, extract_document
from .schema import EXTRACTED_SCHEMA


def make_doc_id(url_canon: str, fetched_ts: datetime) -> bytes:
    """XID-style 12-byte id: 4B big-endian unix seconds + 8B content
    hash of the canonical url.  Timestamp-prefixed and byte-comparable
    like the reference's XID (``src/db/model.ts:48,169-182``) but
    deterministic (no machine/pid/counter randomness)."""
    ts = int(fetched_ts.timestamp()).to_bytes(4, "big")
    return ts + hashlib.blake2b(url_canon.encode(), digest_size=8).digest()


def _extract_partition(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in EXTRACTED_SCHEMA.fields]
    for pdf in batches:
        out: list[dict] = []
        for row in pdf.itertuples(index=False):
            rec = {
                "url": row.url_canon,
                "url_canon": row.url_canon,
                "url_hash": row.url_hash,
                "host": row.host,
                "src": row.src,
                "status": "fetch_failed",
                "title": None,
                "meta": None,
                "content": None,
                "html": None,
                "page_len": None,
                "text": None,
                "lang": row.lang,
                "links": None,
                "depth": row.depth,
            }
            if row.html_bytes is not None:
                html = bytes(row.html_bytes).decode("utf-8", errors="replace")
                ex = extract_document(html, row.url_canon, src=row.src)
                links = [
                    canon.resolve_link(row.url_canon, href) for href in ex.links
                ]
                rec.update(
                    status=ex.status,
                    links=links,
                    page_len=ex.page_len,
                )
                if ex.status == "ok":
                    if (
                        ex.page_len > MAX_CELL_SIZE
                        or len(ex.content_cbor) > MAX_CELL_SIZE
                    ):
                        # save() guards the trimmed PAGE bytes and the
                        # CBOR content bytes, strictly greater-than
                        # (model.ts:142-147) — not the region html,
                        # which the reference never stores
                        rec["status"] = "too_large"
                    else:
                        rec.update(
                            title=ex.title,
                            meta=ex.meta,
                            content=ex.content_cbor,
                            # the stored html column is the CANONICAL
                            # re-render of the amended tree, trimmed —
                            # setHTML(toHTML(obj)), api.ts:96-102 +
                            # model.ts:73-75; the X5 region html is
                            # transient parse input (crawler.ts:83)
                            html=ex.canonical_html.strip(),
                            text=ex.text,
                        )
            out.append(rec)
        yield pd.DataFrame(out, columns=cols)


from pyspark.sql import types as T

# What the round pipeline actually needs back from extraction when the
# wide results are written in-task: link-growth and status bookkeeping.
NARROW_EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), True),
        T.StructField("url_hash", T.LongType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("depth", T.IntegerType(), False),
    ]
)


def _results_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("id", pa.binary()),
            ("url", pa.string()),
            ("url_canon", pa.string()),
            ("url_hash", pa.int64()),
            ("host", pa.string()),
            ("src", pa.string()),
            ("title", pa.string()),
            ("meta", pa.map_(pa.string(), pa.string())),
            ("content", pa.binary()),
            ("html", pa.string()),
            ("page_len", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("status", pa.string()),
            ("depth", pa.int32()),
            ("fetched_ts", pa.timestamp("us", tz="UTC")),
            ("round", pa.int32()),
        ]
    )


def fetch_extract_write(
    selected: DataFrame,
    pages: DataFrame,
    sink,
    round_no: int,
    fetched_ts,
    n_selected: int | None = None,
) -> DataFrame:
    """Fetch-join + extraction that writes the WIDE results shard
    directly from each task via the warehouse's :class:`ShardSink`
    and emits only NARROW rows.

    Why: the wide columns (region html, CBOR content, text — ~60-80 KB
    per page) otherwise cross the Arrow pipe back into the JVM, get
    cached columnar, and get re-read for the parquet write — three
    full passes of multi-GB data per round.  Writing zstd parquet
    in-task keeps the wide bytes in one pass; Spark only ever shuffles
    the narrow link/status columns.

    ``sink`` is a :class:`crawlkit.storage.ShardSink` (from
    ``Warehouse.staging_sink``): it owns the write protocol —
    overwrite-by-task-id idempotence, object-store-safe paths, and
    manifest-gated visibility — so this function holds no filesystem
    assumptions.  Speculative execution must stay off (asserted here,
    off by default): a speculative twin racing the original on the
    same shard name could tear a shard.  The caller obtains the sink
    per attempt; ``staging_sink`` wipes orphan shards of a crashed
    previous attempt, whose task layout may have differed.
    """
    import pyarrow as pa
    from pyspark import TaskContext

    if (
        selected.sparkSession.conf.get("spark.speculation", "false").lower()
        == "true"
    ):
        raise RuntimeError(
            "fetch_extract_write writes one shard per task id and is not "
            "safe under speculative execution; set spark.speculation=false"
        )
    narrow_cols = [f.name for f in NARROW_EXTRACTED_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Incremental shard write: Arrow batches stream into the shard
        # in byte-bounded row groups (ShardWriter buffers to
        # CRAWLKIT_ROW_GROUP_BYTES then flushes one group), so the
        # worker holds O(row-group target) wide bytes — never the
        # task's whole shard (O(task-share) would be gigabytes at the
        # design point).  Opened lazily: a task with no ok rows leaves
        # no file; a task whose generator is closed EARLY (partial-
        # consumption action) aborts the shard rather than finalizing
        # a valid-looking footer over a truncated prefix — so a shard
        # file exists iff its task ran to completion.
        writer = None
        completed = False
        arrow_schema = _results_arrow_schema()
        try:
            for pdf in _extract_partition(batches):
                ok = pdf[pdf["status"] == "ok"]
                wide: list[dict] = []
                for row in ok.itertuples(index=False):
                    wide.append(
                        {
                            "id": make_doc_id(row.url_canon, fetched_ts),
                            "url": row.url,
                            "url_canon": row.url_canon,
                            "url_hash": row.url_hash,
                            "host": row.host,
                            "src": row.src,
                            "title": row.title,
                            "meta": list((row.meta or {}).items()),
                            "content": row.content,
                            "html": row.html,
                            "page_len": row.page_len,
                            "text": row.text,
                            "lang": row.lang,
                            "status": row.status,
                            "depth": row.depth,
                            "fetched_ts": fetched_ts,
                            "round": round_no,
                        }
                    )
                if wide:
                    table = pa.Table.from_pylist(wide, schema=arrow_schema)
                    if writer is None:
                        writer = sink.open_writer(
                            TaskContext.get().partitionId(), arrow_schema
                        )
                    writer.write_table(table)
                yield pdf[narrow_cols]
            completed = True
        finally:
            if writer is not None:
                if completed:
                    writer.close()
                else:
                    writer.abort()

    return _join_pages(selected, pages, n_selected).mapInPandas(
        run, NARROW_EXTRACTED_SCHEMA
    )


MAX_BROADCAST_KEYS = 1_000_000


def _max_broadcast_keys() -> int:
    """Broadcast-regime cutoff; env-overridable (CRAWLKIT_MAX_BROADCAST_KEYS)
    so tests and A/B audits can force the large-keys plan on a small
    corpus without touching code."""
    import os

    return int(os.environ.get("CRAWLKIT_MAX_BROADCAST_KEYS",
                              MAX_BROADCAST_KEYS))


def _join_pages(selected: DataFrame, pages: DataFrame,
                n_selected: int | None = None) -> DataFrame:
    """The J8 fetch join: selected frontier keys against the pages
    table.

    Shuffle hygiene — the MB-scale ``html`` column must NOT cross an
    exchange.  Two regimes:

    * SMALL (``n_selected`` ≤ ``MAX_BROADCAST_KEYS``, explicit count
      required — an unknown size never opts into an unbounded
      broadcast):
      - ``found``: pages INNER JOIN broadcast(narrow keys) — the html
        bytes stay in their scan partitions, zero exchange;
      - ``missing`` (dead links → fetch_failed): narrow keys LEFT ANTI
        pages.url — a narrow-vs-narrow shuffle of key columns only
        (the scan is column-pruned to ``url``).
    * LARGE / UNKNOWN: ``narrow LEFT OUTER pages`` with a
      ``shuffle_hash`` hint on the narrow side — the narrow frame is
      the BUILD side (SPARK-36612 left-outer build-left), so the html
      rows stream through the join with no sort and no hash table.
      When ``pages`` is the bucket-clustered table from
      :meth:`crawlkit.storage.Warehouse.bucketized_pages`, the scan
      reports its bucketing and only the narrow side shuffles (into
      the bucket partitioning): the html-bearing scan feeds the join
      with ZERO exchange at ANY selected-set size — the Iceberg
      bucket-transform plan, which is the shipped plan for the
      10^10-URL design point.  Over a raw (unbucketed) parquet scan
      the same code degrades to a full shuffle of pages; deployments
      at that scale bucketize at ingest.
    """
    from .dedupe import spread

    narrow = selected.select(
        F.col("url").alias("src"), "url_canon", "url_hash", "host", "depth"
    )
    pages_sel = pages.select(
        F.col("url").alias("page_url"),
        F.col("html").alias("html_bytes"),
        F.col("lang"),
    )
    if n_selected is None or n_selected > _max_broadcast_keys():
        # No spread(): the join output is already wide-parallel (the
        # bucket count or shuffle.partitions), and a post-join
        # repartition would be exactly the html shuffle this plan
        # exists to avoid.
        return narrow.hint("shuffle_hash").join(
            pages_sel, narrow.url_canon == F.col("page_url"), "left"
        ).drop("page_url")
    found = pages_sel.join(
        F.broadcast(narrow), F.col("url_canon") == F.col("page_url"), "inner"
    ).drop("page_url")
    missing = (
        narrow.join(
            pages_sel.select("page_url"),
            narrow.url_canon == F.col("page_url"),
            "left_anti",
        )
        .withColumn("html_bytes", F.lit(None).cast("binary"))
        .withColumn("lang", F.lit(None).cast("string"))
    )
    # The found side inherits the pages scan's split count; a small
    # corpus (few parquet splits) would starve the CPU-bound extraction
    # stage.  spread() rebalances only when under-parallel — at cluster
    # scale the scan has plenty of splits and this is a no-op.
    return spread(found.unionByName(missing))


def fetch_extract(selected: DataFrame, pages: DataFrame) -> DataFrame:
    """Join selected frontier rows to pages ("fetch") and extract,
    returning the full wide extraction frame.

    ``selected`` must carry url/url_canon/url_hash/host/depth.  Missing
    pages (dead links) surface as status='fetch_failed' (S5 → retry).
    The round pipeline uses :func:`fetch_extract_write` instead (wide
    results written in-task); this variant remains the simple surface
    for tests and ad-hoc use.
    """
    return _join_pages(selected, pages).mapInPandas(
        _extract_partition, EXTRACTED_SCHEMA
    )
