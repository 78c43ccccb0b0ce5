"""Deterministic synthetic corpus generator (FIXTURES.md §1-3).

Generates the Common-Crawl-style ``pages`` table
(``url, warc_ts, html, text, lang`` — BASELINE.json ``input_hint``),
the ``seeds`` list, and the ``robots`` politeness table.  Everything is
a pure function of ``(seed, i)`` — independent of partitioning, order,
and wall clock — so the same corpus materialises on any cluster layout.

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` with the
pinned extraction kernel computing the golden ``text`` column inline.
The link graph is a deterministic forest with cross-links: page ``i``
links to its ``fanout`` children ``i*fanout + 1 + j`` plus a modular
cross-link, yielding a multi-depth reachable graph from the root seeds.
A ``skew`` switch routes 80% of pages to one mega-host to exercise the
salted politeness scheduler (north_rule skew requirement).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd

from .extract import extract_document

EPOCH = datetime(2024, 1, 15, tzinfo=timezone.utc)  # fixed corpus epoch

_LANGS = ["eng", "zho", "fra", "deu", "spa", "jpn", "rus", "ara"]

_VOCAB = (
    "data spark crawl page engine frontier bloom filter host polite "
    "extract title anchor render batch shuffle partition scale iceberg "
    "snapshot round robots budget priority queue hash canonical text"
).split()


@dataclass(frozen=True)
class SynthConfig:
    n_pages: int = 2000
    n_hosts: int = 40
    seed: int = 42
    fanout: int = 4
    skew: bool = False  # mega-host holds ~80% of pages
    n_seeds: int = 10
    # page body weight: paragraph-count range (default matches the
    # original fixture bytes; bench raises it so per-page extraction
    # cost resembles real 50-200 KB web pages)
    body_paras: tuple = (2, 5)
    para_words: tuple = (8, 24)
    # "now" for freshness logic — fixed for determinism (T3/P3)
    now: datetime = field(default=EPOCH + timedelta(days=1))


def host_of(i: int, cfg: SynthConfig) -> str:
    if cfg.skew:
        rng = random.Random(f"{cfg.seed}:host:{i}")
        if rng.random() < 0.8:
            return "host0.example"
        return f"host{1 + i % (cfg.n_hosts - 1)}.example"
    return f"host{i % cfg.n_hosts}.example"


def path_of(i: int, cfg: SynthConfig) -> str:
    rng = random.Random(f"{cfg.seed}:path:{i}")
    prefix = "/private" if rng.random() < 0.10 else ""
    return f"{prefix}/p/{i}"


def url_of(i: int, cfg: SynthConfig) -> str:
    return f"https://{host_of(i, cfg)}{path_of(i, cfg)}"


def link_targets(i: int, cfg: SynthConfig) -> list[int]:
    targets = [
        child
        for j in range(cfg.fanout)
        if (child := i * cfg.fanout + 1 + j) < cfg.n_pages
    ]
    cross = (i * 7 + 3) % cfg.n_pages
    if cross != i and cross not in targets:
        targets.append(cross)
    return targets


def _link_href(i: int, j: int, cfg: SynthConfig) -> str:
    """Emit the link to page j, sometimes as a canonicalization variant
    (fragment / explicit :443 / shuffled+utm query) to exercise S7."""
    base = url_of(j, cfg)
    rng = random.Random(f"{cfg.seed}:variant:{i}:{j}")
    roll = rng.random()
    if roll < 0.15:
        return base + "#section-" + str(j % 7)
    if roll < 0.25:
        return base.replace("https://", "https://", 1).replace(
            ".example/", ".example:443/", 1
        )
    if roll < 0.35:
        return base + f"?utm_source=feed&ref={j % 5}"
    if roll < 0.40:
        return f"http://{host_of(j, cfg)}{path_of(j, cfg)}"  # invalid: not https
    return base


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def page_html(i: int, cfg: SynthConfig) -> str:
    """Deterministic page body exercising every extraction path:
    h1/h2-only/none titles, og meta, script blocks, 0/1/2-level region
    climbs, and the out-link graph."""
    rng = random.Random(f"{cfg.seed}:html:{i}")
    kind_roll = rng.random()
    title_words = _words(rng, 3).title()
    links = "".join(
        f'<a href="{_link_href(i, j, cfg)}">{_words(rng, 2)}</a> '
        for j in link_targets(i, cfg)
    )
    paras = "".join(
        f"<p>{_words(rng, rng.randint(*cfg.para_words))}</p>"
        for _ in range(rng.randint(*cfg.body_paras))
    )
    meta_lines = [
        f'<meta property="og:site_name" content="Host {host_of(i, cfg)}">',
        f'<meta property="article:tag" content="{rng.choice(_VOCAB)}">',
        '<meta property="twitter:card" content="summary">',
        '<meta name="viewport" content="width=device-width">',
    ]
    if rng.random() < 0.30:
        meta_lines.append(
            f'<meta property="og:title" content="OG {title_words} {i}">'
        )
    head = "<head>" + "".join(meta_lines) + "</head>"
    script = f"<script>var p={i}; if (p < {i + 1}) track('{_words(rng, 2)}');</script>"

    if kind_roll < 0.05:
        # no h1/h2 → not_found path (P5)
        body = f"<div><h3>{title_words}</h3>{paras}{links}</div>"
    elif kind_roll < 0.20:
        # h2-only fallback (X1)
        body = f"<div><h2>Page {i} {title_words}</h2>{paras}{links}</div>"
    else:
        heading = f"<h1>Page {i} {title_words}</h1>"
        depth_roll = rng.random()
        if depth_roll < 0.4:
            # title shares its parent with the content → no climb
            body = f"<article>{heading}{paras}{links}</article>"
        elif depth_roll < 0.75:
            # climb one level
            body = f"<div>{ '<div>' + heading + '</div>' }{paras}{links}</div>"
        else:
            # climb two levels
            body = (
                f"<div><div><div>{heading}</div></div>{paras}{links}</div>"
            )
    return f"<html>{head}<body>{script}{body}</body></html>"


def page_record(i: int, cfg: SynthConfig) -> dict:
    rng = random.Random(f"{cfg.seed}:rec:{i}")
    url = url_of(i, cfg)
    html = page_html(i, cfg)
    # warc_ts spread ±10 days around the epoch → the 3-day freshness
    # predicate (reference src/db/model.ts:45-50) splits fresh/stale.
    ts = EPOCH + timedelta(seconds=rng.randint(-10 * 86400, 10 * 86400))
    text = extract_document(html, url).text
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": rng.choice(_LANGS),
    }


def synth_pages(spark, cfg: SynthConfig):
    """Distributed deterministic pages table."""
    from . import schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            records = [page_record(int(i), cfg) for i in batch["id"]]
            yield pd.DataFrame.from_records(records)

    parallelism = min(32, max(2, cfg.n_pages // 64 or 2))
    return (
        spark.range(0, cfg.n_pages, numPartitions=parallelism)
        .mapInPandas(gen, schema.PAGES_SCHEMA)
    )


def seed_urls(cfg: SynthConfig) -> list[str]:
    """Root seed list: the first n_seeds pages plus two invalid URLs
    (P2 coverage: non-https + unparsable)."""
    seeds = [url_of(i, cfg) for i in range(cfg.n_seeds)]
    seeds.append("http://host0.example/p/0")
    seeds.append("https://")
    return seeds


def seeds_df(spark, cfg: SynthConfig):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(u, 0) for u in seed_urls(cfg)], "url string, depth int"
    ).withColumn("discovered_ts", F.lit(cfg.now))


def robots_records(cfg: SynthConfig) -> list[dict]:
    hosts = sorted({host_of(i, cfg) for i in range(cfg.n_pages)})
    out = []
    for host in hosts:
        rng = random.Random(f"{cfg.seed}:robots:{host}")
        out.append(
            {
                "host": host,
                "crawl_delay_ms": int(rng.choice([0, 100, 250, 500, 1000, 2000])),
                "disallow_rules": ["/private/"] if rng.random() < 0.5 else [],
                "allow_rules": [],
            }
        )
    return out


def robots_df(spark, cfg: SynthConfig):
    from . import schema

    return spark.createDataFrame(robots_records(cfg), schema.HOSTBUDGET_SCHEMA)
