"""robots.txt parsing + RFC 9309 rule matching → the politeness dim (T4).

The reference delegates robots handling to crawlee's fetcher
(``/root/reference/src/crawler.ts:30``); the batch rebuild makes the
rules an explicit broadcast dim (``politeness.robots_filter``).  This
module produces that dim from raw robots.txt bodies and owns the rule
MATCHER the politeness filter applies per candidate URL.

RFC 9309 semantics implemented:

* group selection per §2.2.1: all groups whose user-agent token
  matches; the LONGEST matching agent token wins, ``*`` is the
  fallback; adjacent ``User-agent`` lines share one group; multiple
  groups at the winning specificity MERGE their rules.
* ``Allow`` / ``Disallow`` path rules per §2.2.2 with full ``*``
  wildcards (any position, any count) and ``$`` end-anchors;
  precedence is MOST-OCTETS-of-rule counted the way robots.cc counts
  it (:func:`precedence_octets`: raw non-ASCII bytes as their 3-char
  percent escapes, existing ``%XX`` escapes verbatim), with Allow
  winning ties — verified against the RFC's ``/fish*`` / ``/*.php$``
  example vectors in ``tests/test_robots.py``.  A bare ``Disallow:``
  (empty) adds no rule.  Matching runs against path+query (everything
  after the authority).
* Percent-encoding normalization per §2.2.2 / RFC 3986: before
  comparison, percent-encoded unreserved US-ASCII octets are decoded
  (``%41`` ≡ ``A``) on BOTH the rule and the path; percent-encoded
  RESERVED octets stay encoded with uppercased hex (``%2f`` → ``%2F``
  ≠ ``/`` — the RFC's explicit corner), as do non-ASCII octets
  (``%C3%A9``); raw non-ASCII characters are percent-encoded so both
  sides compare in the same octet alphabet.  ``*``/``$`` are reserved
  characters, so an encoded ``%2A``/``%24`` can never become a
  wildcard or anchor.
* ``Crawl-delay`` seconds (int or float) → milliseconds.
* Comments (``#``), blank lines, unknown directives ignored.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .politeness import DEFAULT_CRAWL_DELAY_MS


def parse_robots_txt(body: str | None, agent: str = "crawlkit") -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns ``{"disallow_rules": [...], "allow_rules": [...],
    "crawl_delay_ms": int}`` — exactly the ``hostbudget`` dim columns.
    Rule strings are kept VERBATIM (wildcards included); matching is
    :func:`path_allowed`.  Missing/empty body → no rules, default
    delay (crawl allowed).
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
            disallow.append(value)
        elif key == "allow" and value:
            allow.append(value)
        elif key == "crawl-delay":
            try:
                delay_ms = int(float(value) * 1000)
            except ValueError:
                pass
    return {
        "disallow_rules": disallow,
        "allow_rules": allow,
        "crawl_delay_ms": delay_ms,
    }


# ---------------------------------------------------------------------------
# RFC 9309 §2.2.2 rule matching

# RFC 3986 §2.2 reserved characters: a percent-encoded reserved octet is
# NOT equivalent to its literal form (``%2F`` ≠ ``/``), so normalization
# must keep it encoded.  ``*`` and ``$`` being reserved also guarantees
# normalization can never mint a wildcard/anchor out of an escape.
_RESERVED = frozenset(b":/?#[]@!$&'()*+,;=")
_HEX = frozenset(b"0123456789abcdefABCDEF")


@lru_cache(maxsize=16384)
def normalize_octets(s: str) -> str:
    """Normalize a rule or a path to RFC 9309 comparison form, octet by
    octet over its UTF-8 encoding:

    * ``%XX`` where XX decodes to an UNRESERVED US-ASCII octet → the
      literal character (``%41`` → ``A``);
    * ``%XX`` for reserved or non-ASCII octets → kept, hex uppercased
      (``%2f`` → ``%2F``; ``%c3%a9`` → ``%C3%A9``);
    * raw non-ASCII octets → percent-encoded (``é`` → ``%C3%A9``), so
      rule and path compare in one alphabet;
    * malformed ``%`` (no two hex digits) → literal.

    The result is pure ASCII.  Used for MATCHING only; rule precedence
    uses robots.cc's escape-expanded metric instead (see
    :func:`precedence_octets` — the two differ when a rule spells
    unreserved octets as escapes)."""
    data = s.encode("utf-8")
    out: list[str] = []
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0x25 and i + 2 < n and data[i + 1] in _HEX and data[i + 2] in _HEX:
            v = int(data[i + 1 : i + 3], 16)
            if v < 0x80 and v not in _RESERVED and v != 0x25:
                out.append(chr(v))
            else:
                out.append("%%%02X" % v)
            i += 3
        elif b >= 0x80:
            out.append("%%%02X" % b)
            i += 1
        else:
            out.append(chr(b))
            i += 1
    return "".join(out)


@lru_cache(maxsize=16384)
def normalize_path(path: str) -> str:
    """Path-side comparison form: :func:`normalize_octets` plus raw
    ``*`` / ``$`` percent-encoded.  In a RULE those two are
    metacharacters (wildcard / anchor); in a PATH they are literal
    URL sub-delims, and a rule can only spell them as ``%2A`` /
    ``%24`` — so the path must carry the encoded form to match."""
    return normalize_octets(path).replace("*", "%2A").replace("$", "%24")


@lru_cache(maxsize=8192)
def rule_regex(rule: str) -> re.Pattern:
    """Compile one (normalized) robots rule: ``*`` → any char sequence,
    trailing ``$`` → end anchor, everything else literal; matches from
    the start of the path.  A NON-trailing raw ``$`` is a literal per
    RFC 9309, and the path comparison form carries literal ``$`` as
    ``%24`` — so it compiles to that escape."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    rx = "".join(
        ".*" if ch == "*" else "%24" if ch == "$" else re.escape(ch)
        for ch in body
    )
    return re.compile("^" + rx + ("$" if anchored else ""))


def precedence_octets(rule: str) -> int:
    """robots.cc's rule-length metric for §2.2.2 precedence: the length
    of the rule with raw non-ASCII octets percent-escaped but EXISTING
    ``%XX`` escapes kept verbatim — i.e. each raw UTF-8 byte >= 0x80
    counts 3 (``é`` → ``%C3%A9`` = 6), every other byte (including the
    three bytes of an already-written escape) counts 1.  Counting the
    raw byte length instead would let ``Allow: /caf*-men`` (9) outrank
    ``Disallow: /café`` (raw 6, robots.cc 10) on path ``/café-menu`` —
    a politeness-violating fetch vs the reference matcher."""
    data = rule.encode("utf-8")
    return len(data) + 2 * sum(1 for b in data if b >= 0x80)


@lru_cache(maxsize=2048)
def _matcher(disallow: tuple[str, ...], allow: tuple[str, ...]):
    """Precedence-ordered first-match evaluator for one host's rules:
    sort all rules by (rule octets DESC, Allow before Disallow) — the
    first rule that matches decides; no match → allowed.  This is the
    standard equivalent formulation of RFC 9309's 'most specific match
    (most octets) wins, Allow wins ties'.

    MATCHING uses the §2.2.2 percent-encoding comparison form
    (:func:`normalize_octets`); PRECEDENCE uses robots.cc's metric
    (:func:`precedence_octets`): the rule as written with raw
    non-ASCII bytes escape-expanded, existing escapes verbatim.  The
    two forms differ when a rule spells unreserved octets as escapes
    (``/a%41`` counts 6, but normalizes to the 3-char ``/aA`` for
    matching): counting the normalized form would let a shorter
    literal rule outrank it."""
    norm_a = [normalize_octets(r) for r in allow]
    norm_d = [normalize_octets(r) for r in disallow]
    rules = sorted(
        [(precedence_octets(raw), 1, rule_regex(r))
         for raw, r in zip(allow, norm_a)]
        + [(precedence_octets(raw), 0, rule_regex(r))
           for raw, r in zip(disallow, norm_d)],
        key=lambda t: (-t[0], -t[1]),
    )

    def allowed(path: str) -> bool:
        p = normalize_path(path)
        for _, is_allow, rx in rules:
            if rx.match(p):
                return bool(is_allow)
        return True

    return allowed


def path_allowed(
    path: str,
    disallow_rules: tuple[str, ...] | list[str],
    allow_rules: tuple[str, ...] | list[str] = (),
) -> bool:
    """Is ``path`` (path+query, leading '/') crawlable under the rules?"""
    if not disallow_rules:
        return True
    return _matcher(tuple(disallow_rules), tuple(allow_rules or ()))(
        path or "/"
    )


@F.pandas_udf(T.BooleanType())
def robots_allowed_udf(
    paths: pd.Series, disallow: pd.Series, allow: pd.Series
) -> pd.Series:
    """Arrow-vectorized verdict column for the politeness filter.
    Per-host compiled matchers are cached across the batch (hosts
    repeat heavily within a partition), so the regex compile cost is
    once per distinct rule set, not per row."""

    def one(p, d, a) -> bool:
        if d is None or len(d) == 0:
            return True
        return path_allowed(
            p if isinstance(p, str) else "/",
            tuple(d),
            tuple(a) if a is not None else (),
        )

    return pd.Series(map(one, paths, disallow, allow))


_ROBOTS_STRUCT = T.StructType(
    [
        T.StructField("disallow_rules", T.ArrayType(T.StringType()), False),
        T.StructField("allow_rules", T.ArrayType(T.StringType()), False),
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
    ).select("host", "r.crawl_delay_ms", "r.disallow_rules",
             "r.allow_rules")  # HOSTBUDGET_SCHEMA column order
