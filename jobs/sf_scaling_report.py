"""Per-query scale-up report from two `tests/oracle_check.py` logs.

VERDICT r4 ask #1: prove the oracle gate's plans survive a 100x data
scale-up by running the gate at sf0.1 and sf1 and recording per-query
Spark-side runtime growth. A plan that is linear in the input should grow
by <= ~10x from sf0.1 to sf1 (plus fixed overhead, so small queries show
<1x-3x); a quadratic cliff shows up as >>10x growth.

Usage:
    python jobs/sf_scaling_report.py /tmp/oracle_sf01.log /tmp/oracle_sf1.log

Prints a markdown table (query, sf0.1 sec, sf1 sec, factor) sorted by
factor descending, plus a summary line, suitable for pasting into
BASELINE.md.
"""

from __future__ import annotations

import re
import sys


LINE = re.compile(
    r"^ok\*?\s+(\S+): (\d+) rows(?: \(oracle skipped[^)]*\))? "
    r"\[([0-9.]+)s spark(?:, ([0-9.]+)s oracle)?\]"
)


def parse(path: str) -> dict:
    out = {}
    for ln in open(path):
        m = LINE.match(ln.strip())
        if m:
            out[m.group(1)] = (float(m.group(3)), int(m.group(2)))
    return out


def main() -> None:
    small, big = parse(sys.argv[1]), parse(sys.argv[2])
    rows = []
    for q, (t1, n1) in big.items():
        if q in small:
            t0, n0 = small[q]
            rows.append((q, t0, t1, t1 / max(t0, 0.05), n0, n1))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | sf1 s | time factor | rows sf0.1 → sf1 |")
    print("|---|---|---|---|---|")
    for q, t0, t1, f, n0, n1 in rows:
        print(f"| {q} | {t0:.1f} | {t1:.1f} | {f:.1f}x | {n0} → {n1} |")
    factors = [r[3] for r in rows]
    if factors:
        med = sorted(factors)[len(factors) // 2]
        print(
            f"\n{len(rows)} queries compared; median time factor "
            f"{med:.1f}x for 10x data; max {max(factors):.1f}x "
            f"({rows[0][0]})."
        )
    missing = sorted(set(small) - set(big))
    if missing:
        print(f"missing at sf1: {', '.join(missing)}")


if __name__ == "__main__":
    main()
