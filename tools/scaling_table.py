#!/usr/bin/env python3
"""Build docs/SCALING.md's sweep table from three Bench JSON lines.

Usage: scaling_table.py sf0.001.json sf0.01.json sf0.1.json
Each file holds the one-line JSON that graft.Bench prints (also
written to bench_out.json). Prints the markdown table sorted by the
sf0.1 column, plus suite totals.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if '"metric"' in line:
                # tolerate sbt's [info] prefix
                return json.loads(line[line.index('{'):])
    raise SystemExit(f"no metric line in {path}")


def main():
    runs = [load(p) for p in sys.argv[1:4]]
    qs = [r["queries"] for r in runs]
    names = sorted(qs[2], key=lambda n: -qs[2][n])
    print("| query | sf0.001 | sf0.01 | sf0.1 | growth (0.01 -> 0.1) |")
    print("|---|---|---|---|---|")
    for n in names:
        a, b, c = (q.get(n, float("nan")) for q in qs)
        g = c / b if b else float("nan")
        print(f"| {n} | {a:.3f} | {b:.3f} | {c:.3f} | {g:.1f}x |")
    ta, tb, tc = (sum(q.values()) for q in qs)
    print(f"| **total** | **{ta:.1f}** | **{tb:.1f}** | **{tc:.1f}** | "
          f"**{tc / tb:.2f}x** |")


if __name__ == "__main__":
    main()
