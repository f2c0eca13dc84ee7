#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the parquet tables in
<sfDir>, and compares: schema (column names), row count, and exact values
(columns sorted by name, rows sorted). Reports per-query PASS/FAIL with a
diff sample on mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _temporal_kind(s: pd.Series):
    """'tz-aware' / 'naive' / 'date32' / None (not temporal)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return ("tz-aware"
                if getattr(getattr(s, "dt", None), "tz", None) is not None
                else "naive")
    if s.dtype == object:
        import datetime
        vals = s.dropna()
        if len(vals) and all(isinstance(v, datetime.date)
                             and not isinstance(v, datetime.datetime)
                             for v in vals.head(100)):
            return "date32"
    return None


def tz_mismatches(got: pd.DataFrame, exp: pd.DataFrame):
    """Columns whose temporal flavor differs between the two sides.

    The driver's gate hashes raw parquet/arrow schemas, so a Spark output
    written as timestamp[us, tz=UTC] fails against a naive DuckDB TIMESTAMP
    even when instants agree — and a Spark DATE (parquet date32, pandas
    object-of-date) fails against a DuckDB naive TIMESTAMP the same way.
    Report both divergence classes instead of silently normalizing them.
    """
    bad = []
    for c in sorted(set(got.columns) & set(exp.columns)):
        g_kind, e_kind = _temporal_kind(got[c]), _temporal_kind(exp[c])
        if (g_kind or e_kind) and g_kind != e_kind:
            bad.append((c, g_kind or str(got[c].dtype), e_kind or str(exp[c].dtype)))
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical dtypes for VALUE compare only — tz-awareness divergence is
    # reported separately by tz_mismatches() before this runs
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT PARQUET"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"{name}: rows-only check — {len(got)} rows "
                  f"({'PASS' if len(got) > 0 else 'FAIL: empty'})")
            if len(got) > 0: n_pass += 1
            else: n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        tz_bad = tz_mismatches(got, exp)
        if tz_bad:
            for c, g_kind, e_kind in tz_bad:
                print(f"{name}: TZ SCHEMA MISMATCH col {c}: spark={g_kind} duck={e_kind}")
            n_fail += 1; continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"{name}: PASS ({len(g)} rows)"); n_pass += 1
        except AssertionError as ex:
            print(f"{name}: VALUE MISMATCH")
            # show first differing cells
            diff_shown = 0
            for c in g.columns:
                neq = ~((g[c] == e[c]) | (g[c].isna() & e[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col {c} row {i}: spark={g[c][i]!r} duck={e[c][i]!r}")
                    diff_shown += 1
                    if diff_shown >= 5: break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
