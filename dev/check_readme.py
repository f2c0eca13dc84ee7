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
  - every "all <N> queries" / "<N> driver queries" / "ALL <N> hash-match"
    count against len(queries) in BENCH_FULL.json
  - the per-query ceiling, pattern
    "suite-max per-query wall <N> s (<query>)" — both the value and the
    argmax query name, against BENCH_FULL.json
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

with open("BENCH_FULL.json") as f:
    full = json.load(f)

# query-count claims: "all 105 queries", "105 driver queries",
# "ALL 105 hash-match" — each must equal the artifact's inventory size
n_queries = len(full["queries"])
for label, pattern in [
    ("'all N queries' count", r"all (\d+) queries"),
    ("'N driver queries' count", r"(\d+) driver queries"),
    ("'ALL N hash-match' count", r"ALL (\d+) hash-match"),
    ("'N of N hash-gate' count", r"(\d+) of \d+ hash-gate"),
]:
    for c in re.findall(pattern, README):
        if int(c) != n_queries:
            errors.append(
                f"FAIL {label}: README says {c}, BENCH_FULL.json has "
                f"{n_queries} queries")

# per-query ceiling: value AND argmax query name
worst_q, worst_s = max(full["queries"].items(), key=lambda kv: kv[1])
m = re.search(r"suite-max per-query wall ([\d.]+) s \((\w+)\)", README)
if not m:
    errors.append("FAIL suite-max: README claim pattern not found")
else:
    if abs(float(m.group(1)) - round(worst_s, 1)) > 0.05:
        errors.append(f"FAIL suite-max value: README says {m.group(1)}, "
                      f"BENCH_FULL.json max is {worst_s:.2f}")
    if m.group(2) != worst_q:
        errors.append(f"FAIL suite-max query: README says {m.group(2)}, "
                      f"BENCH_FULL.json argmax is {worst_q}")

if errors:
    print("\n".join(errors))
    sys.exit(1)
print("README scoreboard matches committed artifacts")
