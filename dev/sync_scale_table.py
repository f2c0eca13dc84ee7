#!/usr/bin/env python3
"""Rewrite the README scale table's numeric columns from the three tier
artifacts (notes untouched). Run after regenerating BENCH_FULL/SF1/SF10
at one head, BEFORE check_readme. Purely mechanical: the table is
artifact-sourced by contract.

Guards (the drift scenarios this script exists for must not crash or
silently no-op it): a query present in one artifact but missing from
another is skipped with a warning instead of a KeyError, and the run
FAILS if zero rows were rewritten — that means the row regex no longer
matches the README's column formatting and the "sync" did nothing."""
import json
import re
import sys

arts = {p: json.load(open(p))["queries"] for p in
        ["BENCH_FULL.json", "BENCH_SF1.json", "BENCH_SF10.json"]}

readme = open("README.md", encoding="utf-8").read()

skipped = []

def fix(m):
    q = m.group(1)
    missing = [p for p in arts if q not in arts[p]]
    if missing:
        # a scale-table row SHOULD be in all three artifacts; ANY partial
        # presence means the tiers were regenerated at different heads —
        # warn on all of it (a row present in FULL+SF1 but missing only
        # from SF10 was the silent-stale case)
        skipped.append((q, missing))
        return m.group(0)
    a = arts["BENCH_FULL.json"][q]
    b = arts["BENCH_SF1.json"][q]
    c = arts["BENCH_SF10.json"][q]
    if min(a, b, c) < 0:
        skipped.append((q, ["failed wall (-1) in an artifact"]))
        return m.group(0)
    return (f"| {q} | {a:.2f} | {b:.2f} | {c:.1f} | {c / b:.1f}× |"
            f" {m.group(2)} |")

out, n = re.subn(
    r"^\| (q\w+) \| [0-9.]+ \| [0-9.]+ \| [0-9.]+ \| [0-9.]+× \| (.*) \|$",
    fix, readme, flags=re.M)

for q, why in skipped:
    print(f"WARNING: skipped {q}: missing/unusable in {why}", file=sys.stderr)
if n == 0:
    sys.exit("ERROR: 0 scale-table rows matched the row regex — the README "
             "formatting drifted and nothing was synced; fix the regex or "
             "the table")
open("README.md", "w", encoding="utf-8").write(out)
print(f"rewrote {n} scale-table rows ({len(skipped)} skipped)")
