"""Compare two bench result JSONs (timings + plan fingerprints).

Operationalizes the round-6 plan-fingerprint channel: a strategy flip
(broadcast→SMJ, lost pushdown, a Python boundary appearing) shows up
as a PLAN token diff even when timing noise hides the regression, and
sustained host-load windows (which inflate every query together) are
distinguished from genuine per-query regressions by the median ratio.

Usage: python tools/bench_diff.py OLD.json NEW.json
Accepts both the raw ``bench.py`` line and the driver's
``BENCH_r{N}.json`` wrapper (uses its ``parsed`` field).
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    op, np_ = old.get("plans", {}), new.get("plans", {})
    shared = sorted(set(oq) & set(nq))
    if not shared:
        print("no shared queries")
        return 1
    ratios = [nq[q] / oq[q] for q in shared if oq[q] > 0]
    ambient = statistics.median(ratios)
    print(
        f"shared {len(shared)} queries: {sum(oq[q] for q in shared):.2f}s -> "
        f"{sum(nq[q] for q in shared):.2f}s; median per-query ratio "
        f"{ambient:.2f}x (sustained load shows here as a uniform shift)"
    )
    for side, label in ((old, "old"), (new, "new")):
        if "loadavg_start" in side:
            print(
                f"  {label} host loadavg: {side['loadavg_start']} -> "
                f"{side.get('loadavg_end', '?')}"
            )

    plan_changes = [
        q for q in shared if q in op and q in np_ and op[q] != np_[q]
    ]
    if plan_changes:
        print("\nPLAN CHANGES (strategy flips — inspect .explain before trusting timings):")
        for q in plan_changes:
            print(f"  {q}: {op[q]} -> {np_[q]}")
    elif op and np_:
        print("\nplans: all shared fingerprints identical")
    else:
        print("\nplans: fingerprints missing on one side (pre-r6 bench?)")

    # ambient-normalized regressions: slower than the uniform shift explains
    flagged = [
        (q, oq[q], nq[q])
        for q in shared
        if oq[q] > 0 and nq[q] / oq[q] > max(1.5, 1.3 * ambient) and nq[q] - oq[q] > 0.15
    ]
    if flagged:
        print("\nregressions beyond the ambient shift:")
        for q, a, b in sorted(flagged, key=lambda t: t[1] - t[2]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")
    else:
        print("\nno per-query regression beyond the ambient shift")

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    errs = new.get("errors")
    if errs:
        print(f"\nERRORS in new run: {errs}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
