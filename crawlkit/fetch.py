"""Fetch + extract stage (S6/J8 + X1-X10).

"Fetching" in the batch rebuild is a join of the (narrow) selected
frontier against the Common-Crawl-style ``pages`` table on the
canonical url (SURVEY.md J8) — the reference's network fetch
(``/root/reference/src/crawler.ts:17-110``) replaced by a table scan, so
byte-identical extraction is what's verified.  Extraction runs in ONE
``mapInPandas`` pass over Arrow batches: per batch, the pure-Python
kernel (``extract.py``) computes title/meta/region-html/CBOR/text/links.

Shuffle hygiene: only the frontier's narrow key columns are joined into
the wide pages scan; the MB-scale ``html`` bytes never pass through more
than the single fetch join, and the stage output drops them (results
carry the region html + page_len only, honoring the reference's 1 MiB
cell guard, ``src/db/model.ts:7,142-147``).
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
                    page_len=len(ex.page.encode("utf-8")),
                )
                if ex.status == "ok":
                    if (
                        len(ex.content_cbor) >= MAX_CELL_SIZE
                        or len(ex.content_html.encode("utf-8")) >= MAX_CELL_SIZE
                    ):
                        # reference save() rejects >1MiB cells (model.ts:142-147)
                        rec["status"] = "too_large"
                    else:
                        rec.update(
                            title=ex.title,
                            meta=ex.meta,
                            content=ex.content_cbor,
                            html=ex.content_html,
                            text=ex.text,
                        )
            out.append(rec)
        yield pd.DataFrame(out, columns=cols)


def fetch_extract(selected: DataFrame, pages: DataFrame) -> DataFrame:
    """Join selected frontier rows to pages ("fetch") and extract.

    ``selected`` must carry url/url_canon/url_hash/host/depth.  Missing
    pages (dead links) surface as status='fetch_failed' (S5 → retry).
    """
    narrow = selected.select(
        F.col("url").alias("src"), "url_canon", "url_hash", "host", "depth"
    )
    joined = narrow.join(
        pages.select(
            F.col("url").alias("page_url"),
            F.col("html").alias("html_bytes"),
            F.col("lang"),
        ),
        narrow.url_canon == F.col("page_url"),
        "left",
    ).drop("page_url")
    # The join output inherits the pages scan's split count; a small
    # corpus (few parquet splits) would starve the CPU-bound extraction
    # stage.  spread() rebalances only when under-parallel — at cluster
    # scale the scan has plenty of splits and this is a no-op.
    from .dedupe import spread

    return spread(joined).mapInPandas(_extract_partition, EXTRACTED_SCHEMA)
