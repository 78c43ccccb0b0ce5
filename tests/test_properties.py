"""Property-based tests (SURVEY.md §5.4) + mega-host skew fixture."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# canonicalization properties

_url_path = st.text(
    alphabet="abcdefghij/._-%20", min_size=0, max_size=30
)
_host = st.from_regex(r"[a-z]{1,10}(\.[a-z]{2,6}){1,2}", fullmatch=True)
_query = st.lists(
    st.tuples(st.sampled_from("abcxyz"), st.integers(0, 99)), max_size=4
)


@given(host=_host, path=_url_path, q=_query,
       frag=st.sampled_from(["", "#f", "#sec-2"]),
       port=st.sampled_from(["", ":443"]))
@settings(max_examples=200, deadline=None)
def test_canonical_idempotent_and_variant_stable(host, path, q, frag, port):
    from crawlkit import canon

    qs = "&".join(f"{k}={v}" for k, v in q)
    url = f"https://{host}{port}/{path}" + (f"?{qs}" if qs else "") + frag
    c = canon.canonical_url(url)
    assert c is not None
    # idempotence
    assert canon.canonical_url(c) == c
    # fragment and default port never survive
    assert "#" not in c and ":443" not in c
    # canonicalization of the variant equals canonicalization of the base
    base = f"https://{host}/{path}" + (f"?{qs}" if qs else "")
    assert canon.canonical_url(base) == c


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_is_valid_url_total(s):
    from crawlkit import canon

    # never raises, and only https urls can be valid (reference P2)
    v = canon.is_valid_url(s)
    if v:
        assert s.startswith("https://")


# ---------------------------------------------------------------------------
# bloom properties

@given(
    items=st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300,
                   unique=True),
    probes=st.lists(st.integers(-(2**62), 2**62), max_size=50),
)
@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bloom_never_false_negative(items, probes):
    from crawlkit.bloom import BloomPartition, optimal_bits, optimal_hashes

    m = optimal_bits(max(len(items), 16))
    bp = BloomPartition(m, optimal_hashes(m, max(len(items), 16)))
    bp.add(np.array(items, dtype=np.int64))
    hits = bp.might_contain(np.array(items, dtype=np.int64))
    assert bool(hits.all())  # no false negatives, ever
    # serialization roundtrip preserves membership
    bp2 = BloomPartition.from_bytes(bp.to_bytes())
    assert bool(bp2.might_contain(np.array(items, dtype=np.int64)).all())
    if probes:
        a = bp.might_contain(np.array(probes, dtype=np.int64))
        b = bp2.might_contain(np.array(probes, dtype=np.int64))
        assert (a == b).all()


# ---------------------------------------------------------------------------
# politeness properties (pure-python quota math via the column fn is
# exercised in Spark below; the invariant: never exceed quota per host)

def test_politeness_never_exceeds_quota_and_skew_spreads(spark):
    from crawlkit.politeness import apply_politeness

    # mega-host skew: 85% of candidates on one host
    rows = []
    for i in range(2000):
        host = "mega.example" if i % 20 != 3 else f"h{i % 7}.example"
        url = f"https://{host}/p/{i}"
        rows.append((url, url, i * 2654435761 % (2**62), host, i % 4, 0.0,
                     None, 0))
    cand = spark.createDataFrame(
        rows,
        "url string, url_canon string, url_hash long, host string,"
        "depth int, priority double, discovered_ts timestamp, retry_count int",
    )
    robots = spark.createDataFrame(
        [("mega.example", 1000, None, None)]
        + [(f"h{k}.example", 0, None, None) for k in range(7)],
        "host string, crawl_delay_ms long, disallow_rules array<string>,"
        "allow_rules array<string>",
    )
    selected, deferred = apply_politeness(cand, robots,
                                          round_duration_ms=60_000, salt=8)
    per_host = selected.groupBy("host").count().collect()
    quota = {r.host: (60 if r.host == "mega.example" else 1 << 30)
             for r in robots.collect()}
    for r in per_host:
        assert r["count"] <= quota[r.host], r
    # nothing lost: selected + deferred == robots-admitted candidates
    assert selected.count() + deferred.count() == cand.count()
    # deterministic within-host order: host_rank == 1..k by (depth, url)
    mega = (selected.where(F.col("host") == "mega.example")
            .orderBy("host_rank").collect())
    assert [m.host_rank for m in mega] == list(range(1, len(mega) + 1))
    order = [(m.depth, m.url_canon) for m in mega]
    assert order == sorted(order)


def test_skewed_crawl_round_correct(spark, tmp_warehouse):
    """End-to-end round over the skew=True corpus (80% one mega-host):
    the salted scheduler + AQE must still produce the exact per-host
    quota and the deterministic fetched set."""
    from crawlkit.rounds import CrawlConfig, run_crawl
    from crawlkit.synth import SynthConfig, robots_df, seeds_df, synth_pages

    scfg = SynthConfig(n_pages=300, n_hosts=6, n_seeds=8, fanout=3, skew=True)
    pages = synth_pages(spark, scfg)
    cfg = CrawlConfig(warehouse=tmp_warehouse, round_duration_ms=10_000)
    metrics = run_crawl(spark, cfg, pages, seeds_df(spark, scfg),
                        robots_df(spark, scfg), max_rounds=3)
    assert metrics, "crawl ran no rounds"
    from crawlkit.schema import FRONTIER_SCHEMA, RESULTS_SCHEMA
    from crawlkit.storage import Warehouse

    wh = Warehouse(tmp_warehouse)
    res = wh.read(spark, "results", RESULTS_SCHEMA)
    # every fetched page extracted ok and text matches the golden column
    joined = res.join(pages.select(F.col("url").alias("purl"),
                                   F.col("text").alias("golden")),
                      res.url_canon == F.col("purl"))
    bad = joined.where(F.col("text") != F.col("golden")).count()
    assert bad == 0
    # per-host per-round quota respected in the frontier→selected path
    robots = robots_df(spark, scfg).collect()
    delay = {r.host: r.crawl_delay_ms for r in robots}
    per = res.groupBy("host", "round").count().collect()
    for r in per:
        q = max(1, 10_000 // delay[r.host]) if delay[r.host] > 0 else 1 << 30
        assert r["count"] <= q, (r, q)
