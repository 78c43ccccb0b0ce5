"""robots.txt parsing → the politeness dim table (T4 input).

The reference delegates robots handling to crawlee's fetcher
(``/root/reference/src/crawler.ts:30``); the batch rebuild makes the
rules an explicit broadcast dim (``politeness.robots_filter``).  This
module produces that dim from raw robots.txt bodies: a pure-Python
RFC 9309-subset parser plus an Arrow-vectorized Spark operator that
turns a (host, robots_txt) frame — e.g. fetched /robots.txt pages —
into the ``hostbudget`` table.

Parser scope (documented subset):

* group selection per RFC 9309 §2.2.1: all groups whose user-agent
  token matches; the LONGEST matching agent token wins, ``*`` is the
  fallback; adjacent ``User-agent`` lines share one group.
* ``Allow`` / ``Disallow`` path prefixes.  Wildcard rules are kept up
  to the first ``*`` (the politeness filter is prefix-based); a bare
  ``Disallow:`` (empty) means allow-all and adds no rule.
* ``Crawl-delay`` seconds (int or float) → milliseconds.
* Comments (``#``), blank lines, unknown directives ignored.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .politeness import DEFAULT_CRAWL_DELAY_MS


def parse_robots_txt(body: str | None, agent: str = "crawlkit") -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns ``{"disallow_prefixes": [...], "allow_prefixes": [...],
    "crawl_delay_ms": int}`` — exactly the ``hostbudget`` dim columns.
    Missing/empty body → no rules, default delay (crawl allowed).
    """
    agent_lc = agent.lower()
    # groups: list of (agent_tokens, rules) where rules collects
    # (directive, value) in order
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_agent_run = False

    def close_group() -> None:
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                close_group()
                in_agent_run = True
            cur_agents.append(value.lower())
        else:
            in_agent_run = False
            cur_rules.append((key, value))
    close_group()

    # pick the LONGEST matching agent token ('*' matches everything at
    # the lowest specificity), then MERGE every group at that
    # specificity in document order — RFC 9309 §2.2.1: multiple
    # matching groups' rules MUST be combined
    def group_score(agents: list[str]) -> int | None:
        best = None
        for a in agents:
            if a == "*":
                score = 0
            elif a and a in agent_lc:
                score = len(a)
            else:
                continue
            best = score if best is None else max(best, score)
        return best

    scored = [(group_score(agents), rules) for agents, rules in groups]
    matching = [(s, r) for s, r in scored if s is not None]
    best_score = max((s for s, _ in matching), default=None)
    merged_rules = [
        kv for s, rules in matching if s == best_score for kv in rules
    ]

    disallow: list[str] = []
    allow: list[str] = []
    delay_ms = DEFAULT_CRAWL_DELAY_MS
    for key, value in merged_rules:
        if key == "disallow" and value:
            disallow.append(value.split("*", 1)[0])
        elif key == "allow" and value:
            allow.append(value.split("*", 1)[0])
        elif key == "crawl-delay":
            try:
                delay_ms = int(float(value) * 1000)
            except ValueError:
                pass
    return {
        "disallow_prefixes": disallow,
        "allow_prefixes": allow,
        "crawl_delay_ms": delay_ms,
    }


_ROBOTS_STRUCT = T.StructType(
    [
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
    ]
)


def robots_table(
    fetched: DataFrame,
    agent: str = "crawlkit",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → the ``hostbudget`` dim.  One narrow row per
    host out; parsing is an Arrow-batched pandas UDF (pure per-row
    compute, no shuffle — the output is the broadcast side of the
    politeness join, so this runs once per robots refresh, not per
    round)."""

    @F.pandas_udf(_ROBOTS_STRUCT)
    def parse_udf(bodies: pd.Series) -> pd.DataFrame:
        parsed = [parse_robots_txt(b, agent) for b in bodies]
        return pd.DataFrame(parsed)

    return fetched.select(
        F.col(host_col).alias("host"), parse_udf(F.col(body_col)).alias("r")
    ).select("host", "r.crawl_delay_ms", "r.disallow_prefixes",
             "r.allow_prefixes")  # HOSTBUDGET_SCHEMA column order
