"""Compare two bench JSON artifacts (BENCH_r{N}.json or raw bench.py
output) per query — the round-over-round regression lens.

Usage:
    python tools/bench_compare.py BENCH_r03.json BENCH_r05.json
    python tools/bench_compare.py BENCH_r03.json - < fresh_bench_line.json

Reads either the driver artifact shape ({"parsed": {...}}) or a raw
bench line. Prints shared queries sorted by ratio (new/old), flags
>1.5x as SLOWER and <0.67x as FASTER, and lists queries only present
on one side. Exit code 1 if any shared query regressed >2x (the
BASELINE.md gate granularity).
"""

from __future__ import annotations

import json
import sys


def load_bench(path: str) -> dict:
    raw = sys.stdin.read() if path == "-" else open(path).read()
    d = json.loads(raw)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    oq = {k: v for k, v in old.get("queries", {}).items() if isinstance(v, (int, float))}
    nq = {k: v for k, v in new.get("queries", {}).items() if isinstance(v, (int, float))}
    # When both artifacts carry a machine canary, normalize by it so
    # host-speed drift (uniform 1.2x shifts across unrelated plans)
    # cancels out and only engine-relative changes remain.
    oc, nc = old.get("canary_sec"), new.get("canary_sec")
    if oc and nc:
        print(f"canary: {oc:.3f}s -> {nc:.3f}s (machine drift {nc/oc:.2f}x); "
              "ratios below are canary-normalized")
        oq = {k: v / oc for k, v in oq.items()}
        nq = {k: v / nc for k, v in nq.items()}
    shared = sorted(set(oq) & set(nq), key=lambda k: nq[k] / oq[k] if oq[k] else 0, reverse=True)
    worst = 0.0
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for k in shared:
        r = nq[k] / oq[k] if oq[k] else float("inf")
        worst = max(worst, r)
        flag = "  SLOWER" if r > 1.5 else ("  FASTER" if r < 0.67 else "")
        print(f"{k:40s} {oq[k]:8.3f} {nq[k]:8.3f} {r:6.2f}x{flag}")
    ot, nt = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"\nshared-query totals: {ot:.2f}s -> {nt:.2f}s ({nt/ot:.2f}x)" if ot else "")
    only_old, only_new = sorted(set(oq) - set(nq)), sorted(set(nq) - set(oq))
    if only_old:
        print(f"only in old: {', '.join(only_old)}")
    if only_new:
        print(f"only in new: {', '.join(only_new)}")
    errs = {k: v for k, v in new.get("queries", {}).items() if not isinstance(v, (int, float))}
    if errs:
        print(f"errors in new: {errs}")
        return 1
    return 1 if worst > 2.0 else 0


if __name__ == "__main__":
    sys.exit(main())
