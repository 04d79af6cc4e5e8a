"""Per-query scaling exponents between two bench records (r2 verdict
item 3): exponent = log(t_hi / t_lo) / log(sf_hi / sf_lo), i.e. t ∝
sf^e. Flags queries whose exponent exceeds their family's documented
cost model.

Usage: python tools/scaling_exponents.py <lo.json> <hi.json>

Model classes (SURVEY §6): map-only / single-agg / broadcast-join
queries are ~linear (e ≤ ~1.2 with fixed-overhead amortization
usually pushing e BELOW 1 at these sizes); pair-candidate families
(dedup_*, *_pairs, cooccurrence graphs) scale with their qualifying-
pair OUTPUT volume, which the max_df / max_group / LSH-bucket caps
bound to ~linear-in-corpus with a larger constant; trainer/index
queries are rounds × (scan + fixed) so sublinear at toy SF. Anything
above SUPRA (default 1.6) without a pair-family excuse is a bug.
"""

from __future__ import annotations

import json
import math
import sys

PAIR_FAMILIES = (
    "dedup_", "minhash", "edit_distance", "triangle", "kcore",
    "label_propagation", "word_cooccurrence", "semantic", "simhash",
    "connected_components", "pagerank", "association_rules",
)
SUPRA = 1.6


def main(lo_path: str, hi_path: str) -> None:
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    ratio = hi["sf"] / lo["sf"]
    rows = []
    for name, t_lo in sorted(lo["queries"].items()):
        t_hi = hi["queries"].get(name)
        if t_hi is None:
            continue
        # sub-0.3s timings are pure fixed overhead; exponents on them
        # are noise — clamp the base to keep the log meaningful
        e = math.log(max(t_hi, 0.05) / max(t_lo, 0.05)) / math.log(ratio)
        rows.append((name, t_lo, t_hi, round(e, 2)))
    flagged = [
        r for r in rows
        if r[3] > SUPRA and not any(f in r[0] for f in PAIR_FAMILIES)
    ]
    out = {
        "sf_lo": lo["sf"],
        "sf_hi": hi["sf"],
        "n": len(rows),
        "median_exponent": sorted(r[3] for r in rows)[len(rows) // 2],
        "max_exponent": max(rows, key=lambda r: r[3]),
        "best_sum_lo": round(sum(r[1] for r in rows), 1),
        "best_sum_hi": round(sum(r[2] for r in rows), 1),
        "superlinear_unexplained": [
            {"query": n, "t_lo": a, "t_hi": b, "exponent": e}
            for n, a, b, e in sorted(flagged, key=lambda r: -r[3])
        ],
        "top10_exponent": [
            {"query": n, "t_lo": a, "t_hi": b, "exponent": e}
            for n, a, b, e in sorted(rows, key=lambda r: -r[3])[:10]
        ],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
