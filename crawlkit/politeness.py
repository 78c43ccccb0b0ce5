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

Robots admission is RFC 9309 longest-match (``*``/``$`` wildcards,
Allow overrides) via the Arrow-vectorized matcher in
:mod:`crawlkit.robots`; path+query extraction stays JVM-side
(``parse_url``), only the verdict crosses the Arrow boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_CRAWL_DELAY_MS = 500
UNLIMITED_QUOTA = 1 << 30


def robots_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates the host's robots rules exclude; attach
    crawl_delay_ms.  Robots is a per-host dim table → broadcast join;
    the verdict is RFC 9309 longest-match with full ``*``/``$``
    wildcard support and Allow overriding shorter Disallows, evaluated
    by the Arrow-vectorized matcher in :mod:`crawlkit.robots`
    (compiled per distinct rule set, not per row).  Matching runs on
    path+query — everything after the authority."""
    from .robots import robots_allowed_udf  # local: avoids import cycle

    joined = candidates.join(F.broadcast(robots), "host", "left")
    query = F.parse_url(F.col("url_canon"), F.lit("QUERY"))
    path = F.concat(
        F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit("/")),
        F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    admitted = robots_allowed_udf(
        path, F.col("disallow_rules"), F.col("allow_rules")
    )  # null rules (host without robots) → allowed
    return (
        joined.where(admitted)
        .withColumn(
            "crawl_delay_ms",
            F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)),
        )
        .drop("disallow_rules", "allow_rules")
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


def politeness_ranked(
    candidates: DataFrame,
    robots: DataFrame,
    round_duration_ms: int = 60_000,
    salt: int = 8,
) -> DataFrame:
    """ONE frame carrying the full politeness verdict: every robots-
    admitted candidate row plus ``host_rank`` (the deterministic
    within-host crawl order, null for salt-pruned rows) and
    ``is_selected``.  Selected and deferred are cheap filters of this
    frame — persist THIS once per round and the robots verdict UDF (the
    most expensive narrow stage) evaluates exactly once, instead of once
    per derived branch.

    Skew note: both windows stay salt-bounded.  Stage 1 ranks within
    ``(host, pmod(url_hash, salt))``.  Stage 2 must rank the stage-1
    survivors per host WITHOUT funnelling a mega-host's full candidate
    list into one task, so its partition key is ``host`` plus a selector
    that is a single constant for survivors (≤ salt×quota rows — the
    bounded set that needs a total order) but keeps the pruned rows
    spread across their salt sub-groups (their rank is never used)."""
    c = robots_filter(candidates, robots).withColumn(
        "host_quota", host_quota_col(round_duration_ms)
    )
    order = [F.col("depth").asc(), F.col("priority").desc(), F.col("url_canon").asc()]

    salted = Window.partitionBy("host", F.pmod(F.col("url_hash"), F.lit(salt))).orderBy(
        *order
    )
    staged = c.withColumn(
        "salt_ok", F.row_number().over(salted) <= F.col("host_quota")
    )

    survivor_part = F.when(F.col("salt_ok"), F.lit(-1)).otherwise(
        F.pmod(F.col("url_hash"), F.lit(salt))
    )
    per_host = Window.partitionBy("host", survivor_part).orderBy(*order)
    ranked = staged.withColumn(
        "host_rank",
        F.when(F.col("salt_ok"), F.row_number().over(per_host)).cast("int"),
    )
    return ranked.withColumn(
        "is_selected",
        F.col("salt_ok") & (F.col("host_rank") <= F.col("host_quota")),
    ).drop("salt_ok", "host_quota", "crawl_delay_ms")


def apply_politeness(
    candidates: DataFrame,
    robots: DataFrame,
    round_duration_ms: int = 60_000,
    salt: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """→ (selected, deferred).  Selected carries ``host_rank`` (the
    deterministic within-host crawl order); deferred rows wait for the
    next round (their politeness budget is exhausted this round).  Both
    halves are filters over :func:`politeness_ranked` — callers that
    materialize both should persist the ranked frame (as ``rounds.py``
    does) so the robots verdict runs once."""
    ranked = politeness_ranked(candidates, robots, round_duration_ms, salt)
    selected = ranked.where(F.col("is_selected")).drop("is_selected")
    deferred = ranked.where(~F.col("is_selected")).drop("is_selected", "host_rank")
    return selected, deferred
