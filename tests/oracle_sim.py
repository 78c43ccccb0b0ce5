"""Single-threaded reference simulator for the crawl loop.

Implements the round semantics of ``crawlkit.rounds`` in plain Python —
one list at a time, no Spark — to serve as the ordering / URL-seen-set
oracle (north_rule: "matching the reference's crawl ordering and final
URL-seen set given the same seed list and politeness budget").

It shares only the *pure kernels* with the engine (canonicalization and
extraction — those are the pinned per-row semantics); every distributed
mechanism (bloom dedupe, salted windows, joins) is replaced by its
obvious sequential equivalent, so agreement between the two is evidence
the distributed plan preserves the semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawlkit import canon
from crawlkit.extract import extract_document
from crawlkit.politeness import DEFAULT_CRAWL_DELAY_MS, UNLIMITED_QUOTA
from crawlkit.synth import SynthConfig, page_record, robots_records, seed_urls


@dataclass
class SimResult:
    # per round: ordered list of (host, host_rank, url_canon) fetched
    rounds: list[list[tuple[str, int, str]]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)  # url_canon, terminal outcomes
    results: dict[str, dict] = field(default_factory=dict)  # url_canon -> doc


def simulate_crawl(
    cfg: SynthConfig,
    max_rounds: int = 10,
    max_depth: int = 4,
    round_duration_ms: int = 60_000,
    max_retries: int = 2,
) -> SimResult:
    pages = {}
    for i in range(cfg.n_pages):
        rec = page_record(i, cfg)
        pages[rec["url"]] = rec
    robots = {r["host"]: r for r in robots_records(cfg)}

    sim = SimResult()
    # frontier entries: url_canon -> (src_url, depth, retry_count)
    frontier: dict[str, tuple[str, int, int]] = {}
    for url in seed_urls(cfg):
        if not canon.is_valid_url(url):
            continue
        cu = canon.canonical_url(url)
        if cu not in frontier or 0 < frontier[cu][1]:
            frontier[cu] = (min(url, frontier[cu][0]) if cu in frontier else url, 0, 0)

    for _round in range(1, max_rounds + 1):
        if not frontier:
            break
        # drop already-seen
        candidates = {
            cu: v for cu, v in frontier.items() if cu not in sim.seen
        }
        # robots + quota (RFC 9309 longest-match, independent
        # reimplementation of the engine's matcher: evaluate EVERY
        # rule, keep the longest match per polarity, Allow wins ties;
        # matching uses the normalized comparison form, precedence
        # counts robots.cc's metric — the rule with raw non-ASCII
        # escape-expanded, existing %XX escapes verbatim)
        def sim_normalize(s: str) -> str:
            # regex-substitution formulation (engine uses a byte loop):
            # first escape raw non-ASCII to %XX, then fold %XX escapes —
            # unreserved ASCII decodes, everything else uppercases.
            import re as _re

            reserved = set(":/?#[]@!$&'()*+,;=%")
            s = "".join(
                ch if ord(ch) < 0x80 else
                "".join("%%%02X" % b for b in ch.encode("utf-8"))
                for ch in s
            )

            def fold(m: "_re.Match[str]") -> str:
                v = int(m.group(1), 16)
                if v < 0x80 and chr(v) not in reserved:
                    return chr(v)
                return "%" + m.group(1).upper()

            return _re.sub(r"%([0-9a-fA-F]{2})", fold, s)

        def sim_allowed(path: str, rules: dict) -> bool:
            import re as _re

            # path side additionally encodes raw '*'/'$' (rule
            # metacharacters — a rule can only spell the literals as
            # %2A/%24), matching the engine's normalize_path.
            npath = (
                sim_normalize(path).replace("*", "%2A").replace("$", "%24")
            )

            def matches(rule: str) -> bool:
                anchored = rule.endswith("$")
                body = rule[:-1] if anchored else rule
                rx = "".join(
                    ".*" if ch == "*" else "%24" if ch == "$"
                    else _re.escape(ch)
                    for ch in body
                )
                return _re.match(rx + ("$" if anchored else ""), npath) is not None

            def sim_octets(raw: str) -> int:
                # robots.cc length: percent-escape raw non-ASCII
                # (expressed here by escaping then measuring — the
                # engine counts bytes arithmetically instead)
                return len(
                    "".join(
                        ch if ord(ch) < 0x80 else
                        "".join("%%%02X" % b for b in ch.encode("utf-8"))
                        for ch in raw
                    )
                )

            best_d = max(
                (sim_octets(raw)
                 for raw in rules["disallow_rules"]
                 if matches(sim_normalize(raw))),
                default=-1,
            )
            if best_d < 0:
                return True
            best_a = max(
                (sim_octets(raw)
                 for raw in rules["allow_rules"]
                 if matches(sim_normalize(raw))),
                default=-1,
            )
            return best_a >= best_d

        per_host: dict[str, list[tuple[int, str]]] = {}
        for cu, (src, depth, retry) in candidates.items():
            host = canon.url_host(cu)
            rules = robots.get(host)
            path = cu.split(host, 1)[1] if host in cu else cu
            if rules and not sim_allowed(path or "/", rules):
                continue  # permanently excluded
            per_host.setdefault(host, []).append((depth, cu))
        selected: list[tuple[str, int, str]] = []
        deferred: dict[str, tuple[str, int, int]] = {}
        for host in sorted(per_host):
            delay = (
                robots[host]["crawl_delay_ms"]
                if host in robots
                else DEFAULT_CRAWL_DELAY_MS
            )
            quota = (
                UNLIMITED_QUOTA
                if delay <= 0
                else max(1, round_duration_ms // delay)
            )
            ranked = sorted(per_host[host])  # (depth asc, url_canon asc)
            for rank, (depth, cu) in enumerate(ranked, start=1):
                if rank <= quota:
                    selected.append((host, rank, cu))
                else:
                    deferred[cu] = candidates[cu]
        sim.rounds.append(selected)

        next_frontier: dict[str, tuple[str, int, int]] = dict(deferred)
        for host, rank, cu in selected:
            src, depth, retry = candidates[cu]
            page = pages.get(cu)
            if page is None:
                if retry + 1 <= max_retries:
                    next_frontier[cu] = (src, depth, retry + 1)
                continue
            ex = extract_document(page["html"].decode(), cu, src=src)
            sim.seen.add(cu)
            if ex.status == "ok":
                sim.results[cu] = {"title": ex.title, "text": ex.text}
                if depth + 1 <= max_depth:
                    for href in ex.links:
                        absu = canon.resolve_link(cu, href)
                        if not canon.is_valid_url(absu):
                            continue
                        lcu = canon.canonical_url(absu)
                        if lcu in sim.seen or lcu in deferred:
                            continue
                        prev = next_frontier.get(lcu)
                        if prev is None:
                            next_frontier[lcu] = (absu, depth + 1, 0)
                        else:
                            next_frontier[lcu] = (
                                min(prev[0], absu),
                                min(prev[1], depth + 1),
                                prev[2],
                            )
        frontier = {
            cu: v for cu, v in next_frontier.items() if cu not in sim.seen
        }
    return sim
