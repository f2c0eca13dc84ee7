#!/usr/bin/env python3
"""README scoreboard guard: every headline total in README.md must match
the committed artifact it cites. Run from the repo root (the verify
skill runs it); exits non-zero with a diff on any mismatch, so a stale
number can no longer survive a round.

Checked claims:
  - the three tier totals in the "Measured scaling" section
    (BENCH_FULL / BENCH_SF1 / BENCH_SF10), pattern
    ``BENCH_X.json`` ... **<N> s total**
  - the sf0.1 headline in the bench-methodology section, pattern
    "Bench at sf0.1 / local[32]: <N> s total"
"""
import json
import re
import sys

README = open("README.md", encoding="utf-8").read()

def artifact_total(path: str) -> float:
    with open(path) as f:
        return round(json.load(f)["value"], 1)

def claims(pattern: str, label: str):
    found = re.findall(pattern, README)
    if not found:
        print(f"FAIL {label}: README pattern not found: {pattern}")
        sys.exit(2)
    return [float(x) for x in found]

errors = []
for label, path, pattern in [
    ("sf0.1 total", "BENCH_FULL.json",
     r"`BENCH_FULL\.json`[^*]*\*\*([\d.]+) s total"),
    ("sf1 total", "BENCH_SF1.json",
     r"`BENCH_SF1\.json`[^*]*\*\*([\d.]+) s total"),
    ("sf10 total", "BENCH_SF10.json",
     r"`BENCH_SF10\.json`[^*]*\*\*([\d.]+) s total"),
    ("sf0.1 headline", "BENCH_FULL.json",
     r"Bench at sf0\.1 / local\[32\]: ([\d.]+) s total"),
]:
    actual = artifact_total(path)
    for c in claims(pattern, label):
        # the artifact is the source of truth; README numbers are rounded
        # to 0.1 s, so equality after rounding is the contract
        if abs(c - actual) > 0.05:
            errors.append(f"FAIL {label}: README says {c}, {path} says {actual}")

if errors:
    print("\n".join(errors))
    sys.exit(1)
print("README scoreboard matches committed artifacts")
