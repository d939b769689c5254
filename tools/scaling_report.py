"""Render SCALING.md from a baseline bench JSON and a scale-stress bench
JSON (both produced by bench.py).

Usage::

    python tools/scaling_report.py base.json x10.json 10 > SCALING.md
"""

from __future__ import annotations

import json
import sys

#: expected scaling class per headline query — the analysis column.
#: "fact" ~ linear in fact rows; "sub" ~ sublinear (dimension/output-bound
#: or amortized fixed work); "super" would be a red flag (none expected).
EXPECTED = {}


def main() -> None:
    base_p, big_p, mult = sys.argv[1], sys.argv[2], float(sys.argv[3])
    base = json.load(open(base_p))["queries"]
    big = json.load(open(big_p))["queries"]
    rows = []
    for name, t0 in base.items():
        t1 = big.get(name)
        if t1 is None:
            continue
        rows.append((name, t0, t1, t1 / t0))
    rows.sort(key=lambda r: -r[3])

    print(f"# SCALING — measured {mult:g}x fact-row stress\n")
    print(
        f"Baseline: sf0.1 (min-of-2, local[32]).  Stress: the same headline\n"
        f"via `tools/scale_stress.py gen --mult {mult:g}` — fact tables\n"
        f"replicated {mult:g}x with offset keys, dimensions fixed, document\n"
        f"replicas stride-permuted + position-salted and embedding replicas\n"
        f"dimension-shifted so\n"
        f"pair-output families measure throughput, not duplicate explosion\n"
        f"(see the tool docstring).  Ratio = wall(x{mult:g}) / wall(sf0.1);\n"
        f"a fact-bound query should ratio at <= {mult:g} (sublinear when\n"
        f"fixed costs amortize), dimension/output-bound queries near 1.\n"
        f"Ratios well above {mult:g} are superlinear red flags.\n"
    )
    print("| query | sf0.1 s | x{:g} s | ratio |".format(mult))
    print("|---|---|---|---|")
    for name, t0, t1, r in rows:
        flag = " **superlinear**" if r > mult * 1.35 and t1 > 2.0 else ""
        print(f"| {name} | {t0:.3f} | {t1:.3f} | {r:.2f}x{flag} |")
    tot0 = sum(r[1] for r in rows)
    tot1 = sum(r[2] for r in rows)
    print(
        f"\nTotals: {tot0:.1f}s -> {tot1:.1f}s "
        f"({tot1 / tot0:.2f}x for {mult:g}x the fact rows)."
    )


if __name__ == "__main__":
    main()
