#!/usr/bin/env python3
"""Derive BASELINE.md's headline total from BASELINE_ROWS.json.

The headline number in BASELINE.md's first table row MUST equal this
script's `query_total` (round-16 ADVICE: the header drifted from the row
sum twice). Convention, stated once here and in the header text:

  - QUERY rows = every key except the arbitration twins (`*_fresh`) and
    the end-of-sequence sentinel (`d01_end`). `d01` itself IS a declared
    query (d01_scan_count) and is INCLUDED.

Run after any row is added/re-recorded:  python3 dev/baseline_total.py
"""
import json
import sys

rows = json.load(open("BASELINE_ROWS.json"))
non_query = {k for k in rows if k.endswith("_fresh")} | {"d01_end"}
qs = {k: v for k, v in rows.items() if k not in non_query}
total = sum(qs.values())
print(f"query_rows: {len(qs)}")
print(f"query_total: {total:.2f}")
print(f"excluded ({len(non_query)}): {sorted(non_query)}")

if len(sys.argv) > 1 and sys.argv[1] == "--check":
    md = open("BASELINE.md").read()
    want = f"**{total:.2f} s**"
    if want in md:
        print(f"BASELINE.md header matches ({want})")
    else:
        print(f"MISMATCH: BASELINE.md does not contain {want}")
        sys.exit(1)
