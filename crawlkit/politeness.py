"""Per-host politeness scheduler: robots rules + crawl-delay quota (T4/W2).

The reference delegates politeness to crawlee's autoscaled per-host
throttling (``/root/reference/src/crawler.ts:30``); the batch rebuild
makes it explicit (north_rule): each host gets a per-round quota
``floor(round_duration / crawl_delay)``; candidates are ranked
``(depth ASC, priority DESC, url_canon ASC)`` — deterministic under any
partitioning — and the top-quota per host is fetched this round, the
remainder deferred to the next round.

Skew (mega-domains): a single window over ``host`` puts 80% of a skewed
frontier in one task.  We therefore rank in two stages: a *salted*
window over ``(host, pmod(url_hash, salt))`` prunes each of the salt
sub-groups to the quota, then the final window over ``host`` ranks the
≤ salt×quota survivors — the heavy host's work is spread across `salt`
tasks and the final window sees bounded input per host.

Robots path rules are applied with built-in functions only
(``parse_url`` + ``exists``/``startswith``) — JVM-side, codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_CRAWL_DELAY_MS = 500
UNLIMITED_QUOTA = 1 << 30


def robots_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates whose path hits a disallow prefix; attach
    crawl_delay_ms.  Robots is a per-host dim table → broadcast join."""
    joined = candidates.join(F.broadcast(robots), "host", "left")
    path = F.parse_url(F.col("url_canon"), F.lit("PATH"))
    disallowed = F.when(
        F.col("disallow_prefixes").isNull(), F.lit(False)
    ).otherwise(
        F.exists("disallow_prefixes", lambda p: path.startswith(p))
    )
    return (
        joined.where(~disallowed)
        .withColumn(
            "crawl_delay_ms",
            F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)),
        )
        .drop("disallow_prefixes", "allow_prefixes")
    )


def host_quota_col(round_duration_ms: int) -> F.Column:
    return (
        F.when(F.col("crawl_delay_ms") <= 0, F.lit(UNLIMITED_QUOTA))
        .otherwise(
            F.greatest(
                F.lit(1),
                F.floor(F.lit(round_duration_ms) / F.col("crawl_delay_ms")),
            )
        )
        .cast("long")
    )


def apply_politeness(
    candidates: DataFrame,
    robots: DataFrame,
    round_duration_ms: int = 60_000,
    salt: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """→ (selected, deferred).  Selected carries ``host_rank`` (the
    deterministic within-host crawl order); deferred rows wait for the
    next round (their politeness budget is exhausted this round)."""
    c = robots_filter(candidates, robots).withColumn(
        "host_quota", host_quota_col(round_duration_ms)
    )
    order = [F.col("depth").asc(), F.col("priority").desc(), F.col("url_canon").asc()]

    salted = Window.partitionBy("host", F.pmod(F.col("url_hash"), F.lit(salt))).orderBy(
        *order
    )
    stage1 = c.withColumn("salt_rank", F.row_number().over(salted)).where(
        F.col("salt_rank") <= F.col("host_quota")
    )

    per_host = Window.partitionBy("host").orderBy(*order)
    ranked = stage1.withColumn("host_rank", F.row_number().over(per_host))

    selected = ranked.where(F.col("host_rank") <= F.col("host_quota")).drop(
        "salt_rank", "host_quota", "crawl_delay_ms"
    )
    # Deferred = everything admitted by robots but over quota.  Recompute
    # membership by anti-joining the selected urls (cheap: selected is
    # the small side within a round).
    deferred = c.drop("host_quota", "crawl_delay_ms").join(
        selected.select("url_hash"), "url_hash", "left_anti"
    )
    return selected, deferred
