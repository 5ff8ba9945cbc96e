#!/usr/bin/env python3
"""Seeded-order agreement table (round-12 directive #3).

Compares two or more BENCH_DETAIL-style json files — typically one
stable-order run and two differently-seeded shuffled-order runs — and
prints, per query, each run's min seconds, the max/min spread across
runs, and the spread after normalizing each run by its own d01_end
sentinel (host-speed proxy). Two differently-seeded runs that agree
per-query rule POSITION out as a cause of a reading; divergence
localizes it to position/JVM-session state rather than the plan.

Usage: python3 dev/seed_agreement.py A.json B.json [C.json ...]
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    q = d["queries"]
    sent = q.get("d01_end", {}).get("min")
    seed = d.get("jvm", {}).get("seed")
    return path, seed, sent, {k: v["min"] for k, v in q.items()
                              if k != "d01_end"}


def main(paths):
    runs = [load(p) for p in paths]
    names = sorted(set().union(*[set(r[3]) for r in runs]))
    print(f"{'query':34s} " +
          " ".join(f"{r[0].split('/')[-1][:14]:>14s}" for r in runs) +
          f" {'spread':>7s} {'n_spread':>8s}")
    for p, seed, sent, _ in runs:
        print(f"# {p}: seed={seed} d01_end={sent}")
    flagged = []
    for n in names:
        vals = [r[3].get(n) for r in runs]
        if any(v is None for v in vals):
            print(f"{n:34s} MISSING IN SOME RUNS: {vals}")
            continue
        # normalize each run's reading by its own d01_end sentinel
        nvals = [v / r[2] for v, r in zip(vals, runs)]
        spread = max(vals) / min(vals) if min(vals) > 0 else float("inf")
        nspread = max(nvals) / min(nvals) if min(nvals) > 0 else float("inf")
        mark = " <-- DIVERGES" if nspread >= 1.5 and max(vals) >= 0.3 else ""
        if mark:
            flagged.append(n)
        print(f"{n:34s} " + " ".join(f"{v:14.3f}" for v in vals) +
              f" {spread:7.2f} {nspread:8.2f}{mark}")
    print()
    if flagged:
        print(f"DIVERGENT (normalized spread >=1.5x and >=0.3s): {flagged}")
    else:
        print("All queries agree across orders (normalized spread < 1.5x) — "
              "position ruled out.")


if __name__ == "__main__":
    main(sys.argv[1:])
