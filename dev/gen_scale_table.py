#!/usr/bin/env python3
"""Rewrite the numeric cells of README.md's "Measured scaling" table from
the committed tier artifacts (BENCH_FULL / BENCH_SF1 / BENCH_SF10), keeping
each row's hand-written note column untouched. The table numbers then have
exactly one source of truth — the artifacts — and can never drift from them.

    python3 dev/gen_scale_table.py          # rewrite README.md in place
    python3 dev/gen_scale_table.py --check  # exit 1 if any cell is stale

Run from the repo root. check_readme.py guards the headline totals; this
guards (and maintains) the per-query cells.
"""
import json
import re
import sys

TIERS = ["BENCH_FULL.json", "BENCH_SF1.json", "BENCH_SF10.json"]


def walls(path):
    with open(path) as f:
        return json.load(f)["queries"]


def fmt_small(v):  # sf0.1 / sf1 columns: 2-decimal seconds
    return f"{v:.2f}"


def fmt_sf10(v):  # sf10 column: 1-decimal seconds
    return f"{v:.1f}"


def main():
    check = "--check" in sys.argv
    full, sf1, sf10 = (walls(p) for p in TIERS)
    out, stale, in_table = [], [], False
    row = re.compile(r"^\| (q\w+) \| [\d.]+ \| [\d.]+ \| [\d.]+ \| [\d.]+× \|")
    with open("README.md", encoding="utf-8") as f:
        for line in f:
            m = row.match(line)
            if m:
                q = m.group(1)
                if q not in full or q not in sf1 or q not in sf10:
                    print(f"FAIL: {q} missing from a tier artifact")
                    sys.exit(2)
                if min(full[q], sf1[q], sf10[q]) < 0:
                    print(f"FAIL: {q} has a failed (-1) wall in a tier artifact")
                    sys.exit(2)
                note = line.rstrip("\n").split(" | ", 5)[5]
                new = (f"| {q} | {fmt_small(full[q])} | {fmt_small(sf1[q])} "
                       f"| {fmt_sf10(sf10[q])} | {sf10[q] / sf1[q]:.1f}× | {note}\n")
                if new != line:
                    stale.append(q)
                line = new
            out.append(line)
    if check:
        if stale:
            print("FAIL stale scale-table rows: " + ", ".join(stale))
            sys.exit(1)
        print("README scale table matches committed artifacts")
        return
    with open("README.md", "w", encoding="utf-8") as f:
        f.writelines(out)
    print(f"rewrote {len(stale)} stale rows" if stale else "table already current")


if __name__ == "__main__":
    main()
