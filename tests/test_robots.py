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
    assert r["disallow_rules"] == ["/private/", "/tmp/*.log"]  # verbatim
    assert r["allow_rules"] == ["/private/ok/"]
    assert r["crawl_delay_ms"] == 1500
    # unknown agent falls back to the * group
    r = parse_robots_txt(SAMPLE, agent="someone-else")
    assert r["disallow_rules"] == ["/everyone-out/"]
    assert r["crawl_delay_ms"] == 10_000
    # agent token matching is substring-based, longest token wins
    r = parse_robots_txt(SAMPLE, agent="Mozilla-compatible googlebot/2.1")
    assert r["disallow_rules"] == ["/google-only/"]


def test_multiple_matching_groups_merge():
    """RFC 9309 §2.2.1: several groups matching the same agent at the
    same specificity combine their rules."""
    body = (
        "User-agent: crawlkit\nDisallow: /a/\n\n"
        "User-agent: other\nDisallow: /other/\n\n"
        "User-agent: crawlkit\nDisallow: /b/\nCrawl-delay: 2\n"
    )
    r = parse_robots_txt(body, agent="crawlkit")
    assert r["disallow_rules"] == ["/a/", "/b/"]
    assert r["crawl_delay_ms"] == 2000
    # a more specific token shadows the merged * groups entirely
    body2 = "User-agent: *\nDisallow: /x/\nUser-agent: crawlkit\nDisallow: /y/\n"
    assert parse_robots_txt(body2, agent="crawlkit")["disallow_rules"] == ["/y/"]


def test_empty_and_edge_cases():
    assert parse_robots_txt(None) == {
        "disallow_rules": [], "allow_rules": [],
        "crawl_delay_ms": DEFAULT_CRAWL_DELAY_MS,
    }
    assert parse_robots_txt("")["disallow_rules"] == []
    # bare Disallow: (empty value) = allow all, adds no rule
    r = parse_robots_txt("User-agent: *\nDisallow:\nCrawl-delay: bogus")
    assert r["disallow_rules"] == []
    assert r["crawl_delay_ms"] == DEFAULT_CRAWL_DELAY_MS  # bad delay ignored
    # comments and case-insensitivity
    r = parse_robots_txt("USER-AGENT: CrawlKit # hi\nDISALLOW: /x/ # bye")
    assert r["disallow_rules"] == ["/x/"]


def test_rfc9309_wildcard_matching():
    """RFC 9309 §2.2.2 example vectors: full ``*`` anywhere, ``$`` end
    anchor, longest-match (most octets) precedence, Allow wins ties."""
    from crawlkit.robots import path_allowed

    # '/fish*' is equivalent to '/fish' (prefix + wildcard tail)
    for p in ("/fish", "/fishheads", "/fish/salmon.html", "/fish.php?id=2"):
        assert not path_allowed(p, ["/fish*"])
    for p in ("/Fish.asp", "/catfish", "/?id=fish"):
        assert path_allowed(p, ["/fish*"])

    # '/*.php$' anchors the end
    for p in ("/filename.php", "/folder/filename.php"):
        assert not path_allowed(p, ["/*.php$"])
    for p in ("/filename.php?parameters", "/filename.php/", "/windows.PHP"):
        assert path_allowed(p, ["/*.php$"])

    # mid-pattern wildcard: '/fish*.php' (multi-segment)
    assert not path_allowed("/fishheads/catfish.php?parameters", ["/fish*.php"])
    assert path_allowed("/Fish.PHP", ["/fish*.php"])

    # multiple wildcards in one rule
    assert not path_allowed("/a/x/b/y/c", ["/a/*/b/*/c"])
    assert path_allowed("/a/x/b/y", ["/a/*/b/*/c"])

    # precedence: most octets of the matching rule wins
    assert path_allowed("/page", ["/"], ["/p"])            # allow longer
    assert path_allowed("/folder/page", ["/folder"], ["/folder"])  # tie → allow
    assert not path_allowed("/page.htm", ["/*.htm"], ["/page"])    # disallow longer
    assert path_allowed("/", ["/"], ["/$"])                # anchored allow wins /
    assert not path_allowed("/page.htm", ["/"], ["/$"])    # anchor doesn't match

    # a '$' not at the end is a literal character
    assert not path_allowed("/a$b/x", ["/a$b/"])
    # no rules → allowed; empty path treated as '/'
    assert path_allowed("/anything", [])
    assert not path_allowed("", ["/"])


def test_allow_override_in_politeness_filter(spark):
    """ADVICE r2: 'Allow: /private/ok/' inside 'Disallow: /private/'
    must ADMIT the deeper path — allow_rules are evaluated now, not
    dead weight in the dim."""
    from pyspark.sql import functions as F

    from crawlkit.politeness import apply_politeness
    from crawlkit.sparkfns import with_url_identity

    dim = robots_table(
        spark.createDataFrame([("a.example", SAMPLE)],
                              "host string, robots_txt string"),
        agent="crawlkit",
    )
    cand = with_url_identity(
        spark.createDataFrame(
            [("https://a.example/private/ok/page",),
             ("https://a.example/private/secret",),
             ("https://a.example/tmp/build.log",),   # wildcard rule hits
             ("https://a.example/tmp/build.txt",)],  # ...but not this one
            "url string",
        ).select("url", F.lit(0).alias("depth"),
                 F.lit(None).cast("double").alias("priority"))
    )
    selected, _ = apply_politeness(cand, dim, round_duration_ms=60_000)
    urls = {r.url_canon for r in selected.collect()}
    assert "https://a.example/private/ok/page" in urls
    assert "https://a.example/private/secret" not in urls
    assert "https://a.example/tmp/build.log" not in urls
    assert "https://a.example/tmp/build.txt" in urls


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
         + "".join(f"Disallow: {p}\n" for p in r["disallow_rules"])
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
    assert rows["a.example"].disallow_rules == ["/private/", "/tmp/*.log"]
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


def test_robots_verdict_evaluates_once_per_round(spark):
    """VERDICT r3 item 3: selected and deferred must share ONE robots
    evaluation.  With the ranked frame persisted and materialized, the
    deferred branch's executed plan reads the cache (InMemoryTableScan)
    and contains no Arrow python-UDF stage — the robots matcher cannot
    run a second time when deferred materializes."""
    from pyspark.sql import functions as F

    from crawlkit.politeness import politeness_ranked
    from crawlkit.sparkfns import with_url_identity

    cand = with_url_identity(
        spark.createDataFrame(
            [(f"https://h{i % 3}.example/p/{i}",) for i in range(50)],
            "url string",
        ).select("url", F.lit(0).alias("depth"),
                 F.lit(None).cast("double").alias("priority"))
    )
    robots = spark.createDataFrame(
        [(f"h{k}.example", 6000, ["/blocked/"], []) for k in range(3)],
        "host string, crawl_delay_ms long, disallow_rules array<string>,"
        "allow_rules array<string>",
    )
    ranked = politeness_ranked(cand, robots, round_duration_ms=60_000).persist()
    try:
        selected = ranked.where(F.col("is_selected"))
        deferred = ranked.where(~F.col("is_selected"))
        n_sel = selected.count()  # materializes the cache (and the UDF, once)
        assert n_sel > 0 and n_sel < 50  # quota=10/host → some deferred
        plan = deferred._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # Everything BEFORE the InMemoryRelation marker is what executes
        # (the relation prints its cached build plan after it, which
        # includes the one-time UDF stage — that part reads the cache).
        executes = plan.split("InMemoryRelation", 1)[0]
        assert "ArrowEvalPython" not in executes
        assert "robots_allowed" not in executes
        # both branches still partition the candidate set exactly
        assert n_sel + deferred.count() == 50
    finally:
        ranked.unpersist()


def test_percent_encoding_normalization_rfc9309():
    """§2.2.2 / RFC 3986 comparison form: unreserved escapes decode,
    reserved escapes stay encoded (%2F ≠ /), hex case folds, raw
    non-ASCII compares against its encoded form."""
    from crawlkit.robots import normalize_octets, path_allowed

    # unreserved octet decodes on either side
    assert not path_allowed("/fish", ["/%66ish"])      # %66='f' in rule
    assert not path_allowed("/%66ish", ["/fish"])      # ... or in path
    # hex case-insensitive for kept escapes
    assert not path_allowed("/a%2fb", ["/a%2Fb"])
    # the RFC's corner: %2F is NOT a path slash
    assert path_allowed("/a/b", ["/a%2Fb"])
    assert path_allowed("/a%2Fb", ["/a/b"])
    # raw non-ASCII in rule vs encoded path (and vice versa)
    assert not path_allowed("/caf%C3%A9", ["/café"])
    assert not path_allowed("/café", ["/caf%C3%A9"])
    # %2A / %24 never become wildcard / anchor
    assert path_allowed("/ab", ["/a%2A"])              # literal '*', no match
    assert not path_allowed("/a*", ["/a%2A"])
    assert not path_allowed("/a$x", ["/a%24x"])
    assert normalize_octets("/a%2a%41ß") == "/a%2AA%C3%9F"


def test_rule_precedence_counts_octets_not_codepoints():
    """ADVICE r3: 'most octets wins' must count UTF-8 bytes.  'é' is one
    code point but two octets, so Allow '/aé' (4 octets) must outrank
    Disallow '/abc' — equal in code points... and crucially a 3-octet
    non-ASCII rule must beat a 3-codepoint/3-octet ASCII rule only on
    real byte count."""
    from crawlkit.robots import path_allowed

    # Precedence counts the rule's octets with raw non-ASCII escape-
    # expanded (robots.cc semantics): Disallow '/p/é' scores 6 vs
    # Allow '/p/*' at 4 → Disallow wins → blocked.  A raw-codepoint
    # metric would call the pair equal (4 == 4) and let Allow win the
    # tie.
    assert not path_allowed("/p/é-page", ["/p/é"], ["/p/*"])
    # encoded-rule spelling matches the same paths and, written out,
    # carries MORE raw octets ('/p/%C3%A9' = 10) — still blocked
    assert not path_allowed("/p/é-page", ["/p/%C3%A9"], ["/p/*"])
    # and the tie case: equal octets, Allow wins
    assert path_allowed("/p/q-page", ["/p/q"], ["/p/*", "/p/q"])


def test_rule_precedence_counts_raw_octets_not_normalized():
    """Precedence must rank by the rule AS WRITTEN, not its normalized
    comparison form — a rule spelling unreserved octets as %XX escapes
    loses 2 octets per escape under normalized counting, flipping
    verdicts vs the robots.cc reference behavior."""
    from crawlkit.robots import path_allowed

    # Disallow '/a%41%41' (8 raw octets, normalizes to '/aAA') vs
    # Allow '/aAAB' (5 raw octets): both match '/aAAB'; raw counting
    # picks the Disallow.  Normalized counting ('/aAA' = 4) would
    # wrongly let the Allow win.
    assert not path_allowed("/aAAB", ["/a%41%41"], ["/aAAB"])
    # symmetric direction: the escaped spelling on the Allow side
    # ('/b%43%43%44' = 11 raw octets vs Disallow '/bCCD' = 5)
    assert path_allowed("/bCCD", ["/bCCD"], ["/b%43%43%44"])
    # raw non-ASCII scores its ESCAPE-EXPANDED length (é → %C3%A9, so
    # Disallow '/café' = 10), beating Allow '/caf*' (5).
    assert not path_allowed("/café-menu", ["/café"], ["/caf*"])


def test_rule_precedence_escape_expands_raw_non_ascii():
    """ADVICE r4: robots.cc ranks by the PERCENT-ESCAPED rule length
    (each raw non-ASCII byte counts 3; existing %XX escapes verbatim),
    not the raw UTF-8 byte count.  The two metrics diverge exactly
    when a raw non-ASCII rule competes against a mid-length ASCII one:
    counting raw bytes under-weights the non-ASCII rule and flips the
    verdict to a politeness-violating fetch."""
    from crawlkit.robots import path_allowed, precedence_octets

    # the ADVICE counterexample: Disallow '/café' (raw 6, robots.cc
    # 10) vs Allow '/caf*-men' (9) on path '/café-menu' — robots.cc
    # disallows; the old raw-byte metric (6 < 9) allowed.
    assert precedence_octets("/café") == 10
    assert precedence_octets("/caf*-men") == 9
    assert not path_allowed("/café-menu", ["/café"], ["/caf*-men"])
    # spelled pre-escaped, the same rule scores the same (escapes are
    # kept verbatim, 3 chars per byte either way)
    assert precedence_octets("/caf%C3%A9") == 10
    assert not path_allowed("/café-menu", ["/caf%C3%A9"], ["/caf*-men"])
    # a LONGER ASCII allow still outranks it (11 > 10)
    assert path_allowed("/café-menu", ["/café"], ["/caf*-menu*"])
