"""Host-weather probe: is this a window where benchmarks are adjudicable?

This sandbox is a co-tenant VM whose contention does NOT reliably show
up as /proc/stat steal (observed: 4-10x throughput suppression at
1-4% steal — see BASELINE.md round-4 weather adjudication).  What does
expose it is the SATURATION STRETCH: wall-time of an N-way parallel
pure-CPU workload divided by the single-process wall-time of the same
work.  On an idle 32-core box the ratio is ~1; when co-tenants hold
the physical cores it grows toward the overcommit factor.

Prints one JSON line.  Interpretation bands (this box, empirical):

  stretch <= 1.7   quiet — bench/scaling numbers are adjudicable
  1.7 - 3          degraded — absolute numbers low, A/B ratios ok-ish
  > 3              storm — only interleaved same-window A/Bs mean anything

Usage: python tools/weather_probe.py [n_workers]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

N_OPS = 20_000_000


def _spin(_=None) -> int:
    return sum(i * i for i in range(N_OPS))


def _steal_pct(window) -> float:
    def ticks():
        parts = open("/proc/stat").readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)

    s0, t0 = ticks()
    out = window()
    s1, t1 = ticks()
    return out, round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 32)

    def single():
        t0 = time.perf_counter()
        _spin()
        return time.perf_counter() - t0

    def parallel():
        t0 = time.perf_counter()
        with ProcessPoolExecutor(max_workers=n) as ex:
            list(ex.map(_spin, range(n)))
        return time.perf_counter() - t0

    one, steal_1 = _steal_pct(single)
    par, steal_n = _steal_pct(parallel)
    stretch = par / one
    print(json.dumps({
        "single_s": round(one, 2),
        f"parallel{n}_s": round(par, 2),
        "stretch": round(stretch, 2),
        "steal_pct_single": steal_1,
        "steal_pct_parallel": steal_n,
        "verdict": ("quiet" if stretch <= 1.7
                    else "degraded" if stretch <= 3 else "storm"),
    }))


if __name__ == "__main__":
    main()
