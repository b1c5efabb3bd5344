#!/usr/bin/env python3
"""Render the consolidated SCALING.md table from two bench artifacts.

Usage: python3 tools/scaling_table.py <bench_sf01.json> <bench_sf1.json>
Prints a markdown table: query | sf0.1 | sf1 | ratio, sorted by ratio
descending, with the total row last.
"""
import json
import sys


def load(path):
    return json.load(open(path))


def main(a_path, b_path):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qa):
        if q in qb:
            ra, rb = qa[q], qb[q]
            rows.append((q, ra, rb, rb / ra if ra > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 | sf1 | ratio |")
    print("|---|---|---|---|")
    for q, ra, rb, ratio in rows:
        print(f"| {q} | {ra:.2f} | {rb:.2f} | {ratio:.1f} |")
    ta = sum(r[1] for r in rows)
    tb = sum(r[2] for r in rows)
    ratio = f"{tb / ta:.1f}" if ta > 0 else "inf"
    print(f"| **total ({len(rows)} queries)** | **{ta:.2f}** | **{tb:.2f}** | **{ratio}** |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
