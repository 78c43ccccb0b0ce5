"""J8 large-regime fetch join (VERDICT r3 item 1).

Above the broadcast cutoff the fetch join must NOT shuffle the pages
scan: with the pages corpus bucket-clustered on ``url``
(``Warehouse.bucketized_pages`` — the parquet stand-in for Iceberg's
``bucket(url)`` transform, SURVEY.md §1.3), the html-bearing scan feeds
the join with zero exchanges and only the narrow frontier side shuffles
into the bucket partitioning.  Verified three ways: the physical plan
(one Exchange, on the narrow side, bucketed scan active), fetched-set
equality vs the default engine with the cutoff forced to 1, and
resume-time re-registration of the bucketed table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlkit import schema
from crawlkit.rounds import CrawlConfig, run_crawl
from crawlkit.storage import Warehouse
from crawlkit.synth import robots_df, seeds_df

from test_rounds import MAX_DEPTH, MAX_ROUNDS, _fetch_order

BUCKETS = 16


@pytest.fixture(scope="module")
def bucket_wh(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wh-bucketed"))
    wh = Warehouse(d)
    return wh, wh.bucketized_pages(pages, BUCKETS)


def _selected_frame(spark):
    from crawlkit.sparkfns import with_url_identity

    return with_url_identity(
        spark.createDataFrame(
            [(f"https://h{i % 5}.example/p/{i}",) for i in range(40)],
            "url string",
        ).select(
            "url",
            F.lit(0).alias("depth"),
            F.lit(None).cast("double").alias("priority"),
        )
    )


def test_large_regime_plan_html_never_crosses_exchange(spark, bucket_wh):
    """The done-criterion plan audit: forcing the >cutoff regime, the
    executed plan has exactly ONE Exchange (the narrow frontier side,
    printed before the pages scan in the tree), the pages scan is a
    bucketed scan (SelectedBucketsCount), and the join streams pages
    as the probe side (ShuffledHashJoin BuildLeft) — no sort, no hash
    table, no shuffle of html."""
    from crawlkit.fetch import _join_pages

    _, pages_b = bucket_wh
    joined = _join_pages(_selected_frame(spark), pages_b,
                         n_selected=10**9)  # way over any cutoff
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan
    assert "ShuffledHashJoin" in plan and "BuildLeft" in plan, plan
    assert plan.count("Exchange") == 1, plan
    # tree prints the (shuffled) narrow left child before the pages
    # scan: the single Exchange must sit on the narrow side, never
    # above the html-bearing FileScan
    assert plan.index("Exchange") < plan.index("FileScan"), plan
    # and the join returns every selected key exactly once (left outer)
    assert joined.count() == 40


def test_unknown_size_never_broadcasts(spark, pages):
    """ADVICE r3: an unknown selected-set size must take the safe
    shuffled plan, not an unbounded broadcast."""
    from crawlkit.fetch import _join_pages

    plan = (
        _join_pages(_selected_frame(spark), pages, n_selected=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" not in plan, plan


def test_crawl_equivalent_in_forced_large_regime(
    spark, pages, synth_cfg, ref_crawl, tmp_path_factory, monkeypatch
):
    """Cutoff forced to 1 (every round in the large regime) + bucketed
    pages: the fetched set, result rows, and text bytes all equal the
    default engine's (the session reference crawl)."""
    ref_dir = ref_crawl[2]

    monkeypatch.setenv("CRAWLKIT_MAX_BROADCAST_KEYS", "1")
    big_dir = str(tmp_path_factory.mktemp("wh-big"))
    cfg_b = CrawlConfig(warehouse=big_dir, n_bloom_partitions=16,
                        max_depth=MAX_DEPTH, salt=4,
                        pages_buckets=BUCKETS)
    run_crawl(spark, cfg_b, pages, seeds_df(spark, synth_cfg),
              robots_df(spark, synth_cfg), max_rounds=MAX_ROUNDS)

    assert _fetch_order(spark, big_dir) == _fetch_order(spark, ref_dir)
    ref_res = Warehouse(ref_dir).read(spark, "results",
                                      schema.RESULTS_SCHEMA)
    big_res = Warehouse(big_dir).read(spark, "results",
                                      schema.RESULTS_SCHEMA)
    ref_rows = {(r["url_canon"], r["text"]) for r in
                ref_res.select("url_canon", "text").collect()}
    big_rows = {(r["url_canon"], r["text"]) for r in
                big_res.select("url_canon", "text").collect()}
    assert big_rows == ref_rows and len(big_rows) > 50


def test_resume_adopts_pinned_bucket_spec(
    spark, pages, synth_cfg, tmp_path_factory
):
    """A resume that omits ``pages_buckets`` must adopt the bucket
    count pinned on disk by the original ingest (like the seen-filter
    partition count) instead of silently degrading every fetch join
    to the shuffled plan."""
    d = str(tmp_path_factory.mktemp("wh-adopt"))
    cfg = CrawlConfig(warehouse=d, n_bloom_partitions=16,
                      max_depth=MAX_DEPTH, salt=4, pages_buckets=BUCKETS)
    first = run_crawl(spark, cfg, pages, seeds_df(spark, synth_cfg),
                      robots_df(spark, synth_cfg), max_rounds=1)
    assert first and Warehouse(d).pages_bucket_count() == BUCKETS

    r1 = Warehouse(d).last_committed_round()
    cfg2 = CrawlConfig(warehouse=d, n_bloom_partitions=16,
                       max_depth=MAX_DEPTH, salt=4)  # buckets forgotten
    resumed = run_crawl(spark, cfg2, pages, max_rounds=1)
    assert cfg2.pages_buckets == BUCKETS
    assert resumed and Warehouse(d).last_committed_round() == r1 + 1

    fresh = Warehouse(str(tmp_path_factory.mktemp("wh-fresh")))
    assert fresh.pages_bucket_count() is None


def test_bucketized_pages_reregisters_on_resume(spark, pages, bucket_wh):
    """A new session loses the in-memory catalog entry; the spec file
    next to the data re-registers the same bucketed table (simulated
    here by dropping the catalog entry)."""
    import hashlib

    wh, pages_b = bucket_wh
    n = pages_b.count()
    tag = hashlib.blake2b(str(wh.root.resolve()).encode(),
                          digest_size=4).hexdigest()
    name = f"crawlkit_pages_b{BUCKETS}_{tag}"
    assert spark.catalog.tableExists(name)
    spark.sql(f"DROP TABLE {name}")  # ≙ session restart
    again = wh.bucketized_pages(pages, BUCKETS)
    assert again.count() == n
    # and the large-regime join over the re-registered table is still
    # exchange-free on the pages side (a bare scan would not report
    # bucketing — autoBucketedScan only engages it when a join benefits)
    from crawlkit.fetch import _join_pages

    plan = (
        _join_pages(_selected_frame(spark), again, n_selected=10**9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SelectedBucketsCount" in plan, plan
    assert plan.count("Exchange") == 1, plan
    # mismatched bucket count on resume fails loudly
    with pytest.raises(ValueError, match="buckets"):
        wh.bucketized_pages(pages, BUCKETS * 2)
