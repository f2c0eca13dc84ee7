#!/usr/bin/env python3
"""Rewrite the README scale table's numeric columns from the three tier
artifacts (notes untouched). Run after regenerating BENCH_FULL/SF1/SF10
at one head, BEFORE check_readme. Purely mechanical: the table is
artifact-sourced by contract."""
import json
import re

arts = {p: json.load(open(p))["queries"] for p in
        ["BENCH_FULL.json", "BENCH_SF1.json", "BENCH_SF10.json"]}

readme = open("README.md", encoding="utf-8").read()

def fix(m):
    q = m.group(1)
    if q not in arts["BENCH_SF10.json"]:
        return m.group(0)
    a = arts["BENCH_FULL.json"][q]
    b = arts["BENCH_SF1.json"][q]
    c = arts["BENCH_SF10.json"][q]
    return (f"| {q} | {a:.2f} | {b:.2f} | {c:.1f} | {c / b:.1f}× |"
            f" {m.group(2)} |")

out, n = re.subn(
    r"^\| (q\w+) \| [0-9.]+ \| [0-9.]+ \| [0-9.]+ \| [0-9.]+× \| (.*) \|$",
    fix, readme, flags=re.M)
open("README.md", "w", encoding="utf-8").write(out)
print(f"rewrote {n} scale-table rows")
