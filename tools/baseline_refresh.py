#!/usr/bin/env python3
"""Refresh BASELINE.md's recorded table from new full-suite bench JSONs.

Protocol (BASELINE.md): `min` is the MONOTONE MINIMUM across recorded
full-suite medians — only ever lowered; `med` is the median across
recorded medians. Without the historical sample list, existing rows
keep their med (conservative: the warm-phase protocol only speeds rows
up, so a stale med can only loosen the variance band, never hide a
regression — the 2x-min and min+0.75s terms still bind) and lower
their min; n increments by the new sample count. NEW rows (queries
with no table entry) get min/med/n computed from the provided samples.

Usage: python3 tools/baseline_refresh.py bench1.json [bench2.json ...]
Rewrites the table in place; prints every change.
"""
import json
import re
import statistics
import sys

BASE = "/root/repo/BASELINE.md"

def main():
    samples = {}  # name -> [medians]
    totals = []
    for path in sys.argv[1:]:
        d = json.load(open(path))
        totals.append(d["value"])
        for k, v in d["queries"].items():
            if v >= 0:
                samples.setdefault(k, []).append(v)
    nruns = len(sys.argv) - 1

    out = []
    seen = set()
    min_sum = 0.0
    med_sum = 0.0
    row_re = re.compile(
        r"^\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|\s*(\d+)\s*\|(.*)$")
    tot_re = re.compile(r"^\|\s*\*\*total\*\*\s*\|\s*\*\*([0-9.]+)\*\*\s*\|\s*\*\*([0-9.]+)\*\*\s*\|(.*)$")
    lines = open(BASE).read().splitlines()
    for line in lines:
        m = row_re.match(line)
        t = tot_re.match(line)
        if m:
            # EVERY matched table row contributes to the rewritten total,
            # including rows with no new sample (query absent from the
            # supplied JSONs: failed run, partial suite, rename) — those
            # keep min/med/n unchanged. Previously such rows were silently
            # excluded from the total, understating the total gate
            # (ADVICE r6). A row with no sample is loud, not silent.
            name, mn, md, n = m.group(1), float(m.group(2)), float(m.group(3)), int(m.group(4))
            seen.add(name)
            if name in samples:
                new_mn = min([mn] + samples[name])
                if new_mn < mn:
                    print(f"{name}: min {mn:.2f} -> {new_mn:.2f}")
                min_sum += new_mn
                med_sum += md
                out.append(f"| {name} | {new_mn:.2f} | {md:.2f} | {n + nruns} |{m.group(5)}")
            else:
                print(f"{name}: WARNING no sample in supplied JSONs — row kept as-is")
                min_sum += mn
                med_sum += md
                out.append(line)
            continue
        if t:
            # insert NEW rows just before the total line
            for name, ss in sorted(samples.items()):
                if name not in seen:
                    mn = min(ss)
                    md = statistics.median(ss)
                    print(f"{name}: NEW min {mn:.2f} med {md:.2f} n {len(ss)}")
                    min_sum += mn
                    med_sum += md
                    out.append(f"| {name} | {mn:.2f} | {md:.2f} | {len(ss)} | sf0.1, local[32] |")
            # the TOTAL GATE compares suite totals against the
            # min-COLUMN total, so the row is the column sums
            print(f"total row (column sums): min {min_sum:.1f} med {med_sum:.1f}")
            out.append(f"| **total** | **{min_sum:.1f}** | **{med_sum:.1f}** |{t.group(3)}")
            continue
        out.append(line)
    open(BASE, "w").write("\n".join(out) + "\n")
    print("BASELINE.md refreshed")

if __name__ == "__main__":
    main()
