#!/usr/bin/env python
"""Canonicalize results/ecdsa_bench.csv: newest row per degree, sorted
k descending (the reference CSV's order, ecdsa_bench.csv:2-10)."""
import sys

path = "results/ecdsa_bench.csv"
lines = open(path).read().strip().split("\n")
hdr, rows = lines[0], lines[1:]
best = {}
for r in rows:
    k = int(r.split(",")[0])
    best[k] = r  # last write wins
out = [hdr] + [best[k] for k in sorted(best, reverse=True)]
open(path, "w").write("\n".join(out) + "\n")
print(f"{len(best)} rows (k={sorted(best, reverse=True)})")
