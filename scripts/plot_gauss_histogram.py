#!/usr/bin/env python
"""Per-rank non-linear-GP histogram from gauss_evolution.dat — the
reference's scripts/plot/gen_histo.sh + plot.gpl equivalent (text output,
no gnuplot dependency).

Usage: python scripts/plot_gauss_histogram.py [gauss_evolution.dat] [row]
"""

import sys

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "gauss_evolution.dat"
    rows = []
    with open(path) as f:
        for line in f:
            vals = [int(v) for v in line.split()]
            if vals:
                rows.append(vals)
    if not rows:
        print("no data")
        return
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else len(rows) - 1
    ts, *counts = rows[idx]
    counts = np.asarray(counts)
    peak = max(counts.max(), 1)
    print(f"time step {ts}: non-linear GPs per rank "
          f"(total {counts.sum()}, max {counts.max()})")
    for r, c in enumerate(counts):
        bar = "#" * int(round(c / peak * 50))
        print(f"rank {r:>4d} | {c:>8d} {bar}")


if __name__ == "__main__":
    main()
