"""robots.txt parser + Spark dim-table operator tests."""

from __future__ import annotations

from crawlkit.politeness import DEFAULT_CRAWL_DELAY_MS
from crawlkit.robots import parse_robots_txt, robots_table

SAMPLE = """
# example robots file
User-agent: googlebot
Disallow: /google-only/

User-agent: crawlkit
User-agent: otherbot
Disallow: /private/
Disallow: /tmp/*.log
Allow: /private/ok/
Crawl-delay: 1.5

User-agent: *
Disallow: /everyone-out/
Crawl-delay: 10
"""


def test_group_selection_and_rules():
    r = parse_robots_txt(SAMPLE, agent="crawlkit")
    assert r["disallow_prefixes"] == ["/private/", "/tmp/"]  # wildcard cut
    assert r["allow_prefixes"] == ["/private/ok/"]
    assert r["crawl_delay_ms"] == 1500
    # unknown agent falls back to the * group
    r = parse_robots_txt(SAMPLE, agent="someone-else")
    assert r["disallow_prefixes"] == ["/everyone-out/"]
    assert r["crawl_delay_ms"] == 10_000
    # agent token matching is substring-based, longest token wins
    r = parse_robots_txt(SAMPLE, agent="Mozilla-compatible googlebot/2.1")
    assert r["disallow_prefixes"] == ["/google-only/"]


def test_multiple_matching_groups_merge():
    """RFC 9309 §2.2.1: several groups matching the same agent at the
    same specificity combine their rules."""
    body = (
        "User-agent: crawlkit\nDisallow: /a/\n\n"
        "User-agent: other\nDisallow: /other/\n\n"
        "User-agent: crawlkit\nDisallow: /b/\nCrawl-delay: 2\n"
    )
    r = parse_robots_txt(body, agent="crawlkit")
    assert r["disallow_prefixes"] == ["/a/", "/b/"]
    assert r["crawl_delay_ms"] == 2000
    # a more specific token shadows the merged * groups entirely
    body2 = "User-agent: *\nDisallow: /x/\nUser-agent: crawlkit\nDisallow: /y/\n"
    assert parse_robots_txt(body2, agent="crawlkit")["disallow_prefixes"] == ["/y/"]


def test_empty_and_edge_cases():
    assert parse_robots_txt(None) == {
        "disallow_prefixes": [], "allow_prefixes": [],
        "crawl_delay_ms": DEFAULT_CRAWL_DELAY_MS,
    }
    assert parse_robots_txt("")["disallow_prefixes"] == []
    # bare Disallow: (empty value) = allow all, adds no rule
    r = parse_robots_txt("User-agent: *\nDisallow:\nCrawl-delay: bogus")
    assert r["disallow_prefixes"] == []
    assert r["crawl_delay_ms"] == DEFAULT_CRAWL_DELAY_MS  # bad delay ignored
    # comments and case-insensitivity
    r = parse_robots_txt("USER-AGENT: CrawlKit # hi\nDISALLOW: /x/ # bye")
    assert r["disallow_prefixes"] == ["/x/"]


def test_cli_crawl_with_raw_robots(spark, tmp_path, pages, synth_cfg,
                                   capsys):
    """spark-submit surface end-to-end: crawl driven through
    ``crawlkit.__main__`` with RAW robots.txt bodies (--robots-txt)."""
    import json

    from pyspark.sql import functions as F

    from crawlkit.__main__ import main
    from crawlkit.synth import robots_records, seeds_df

    pages_dir, seeds_dir, robots_dir = (
        str(tmp_path / d) for d in ("pages", "seeds", "robots")
    )
    pages.write.parquet(pages_dir)
    seeds_df(spark, synth_cfg).write.parquet(seeds_dir)
    # raw robots bodies equivalent to the synth hostbudget dim
    bodies = [
        (r["host"],
         "User-agent: crawlkit\n"
         + "".join(f"Disallow: {p}\n" for p in r["disallow_prefixes"])
         + f"Crawl-delay: {r['crawl_delay_ms'] / 1000}\n")
        for r in robots_records(synth_cfg)
    ]
    spark.createDataFrame(bodies, "host string, robots_txt string").write.parquet(
        robots_dir
    )
    rc = main([
        "--warehouse", str(tmp_path / "wh"), "--pages", pages_dir,
        "--seeds", seeds_dir, "--robots-txt", robots_dir,
        "--rounds", "2", "--master", "local[4]",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.startswith("{")]
    assert lines[-1]["rounds_run"] == 2 and lines[-1]["fetched"] > 0


def test_robots_table_feeds_politeness(spark):
    from pyspark.sql import functions as F

    from crawlkit.politeness import apply_politeness
    from crawlkit.schema import HOSTBUDGET_SCHEMA
    from crawlkit.sparkfns import with_url_identity

    fetched = spark.createDataFrame(
        [("a.example", SAMPLE), ("b.example", None)],
        "host string, robots_txt string",
    )
    dim = robots_table(fetched, agent="crawlkit")
    assert [f.name for f in dim.schema.fields] == \
        [f.name for f in HOSTBUDGET_SCHEMA.fields]
    rows = {r.host: r for r in dim.collect()}
    assert rows["a.example"].crawl_delay_ms == 1500
    assert rows["a.example"].disallow_prefixes == ["/private/", "/tmp/"]
    assert rows["b.example"].crawl_delay_ms == DEFAULT_CRAWL_DELAY_MS

    cand = with_url_identity(
        spark.createDataFrame(
            [("https://a.example/private/secret",),
             ("https://a.example/public/page",),
             ("https://b.example/anything",)],
            "url string",
        ).select("url", F.lit(0).alias("depth"),
                 F.lit(None).cast("double").alias("priority"))
    )
    selected, _deferred = apply_politeness(cand, dim, round_duration_ms=60_000)
    urls = {r.url_canon for r in selected.collect()}
    assert "https://a.example/private/secret" not in urls  # robots-blocked
    assert "https://a.example/public/page" in urls
    assert "https://b.example/anything" in urls
