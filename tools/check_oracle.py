#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by
graft.Verify), runs the matching SQL from oracle_sql.json in DuckDB
over the sfDir tables, and compares: column names (sorted), row count,
and values (rows sorted canonically). Reports exact and approx
(1e-9 rel tol for floats) match per query.

Dev tool only — the engine itself has no Python dependency.
"""
import json, math, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return f"{v:.12g}"
    return str(v)


def canon_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows), sorted(c.lower() for c in df.columns)


def approx_eq(a, b):
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (ValueError, TypeError):
        return a == b


def main(sf_dir, out_dir, only_present=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            if only_present:  # dev: partial Verify sweep (see Verify args 3+)
                continue
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        g_rows, g_cols = canon_df(got)
        e_rows, e_cols = canon_df(exp)
        if g_cols != e_cols:
            results[name] = f"SCHEMA_MISMATCH spark={g_cols} duck={e_cols}"
        elif len(g_rows) != len(e_rows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g_rows)} duck={len(e_rows)}"
        elif g_rows == e_rows:
            results[name] = "EXACT"
        else:
            bad = [(a, b) for a, b in zip(g_rows, e_rows) if a != b]
            napprox = sum(1 for a, b in bad
                          if all(approx_eq(x, y) for x, y in zip(a, b)))
            if napprox == len(bad):
                results[name] = f"APPROX ({len(bad)} rows differ only in float ulps)"
            else:
                ex = next((a, b) for a, b in bad
                          if not all(approx_eq(x, y) for x, y in zip(a, b)))
                results[name] = f"VALUE_MISMATCH {len(bad)} rows, e.g. spark={ex[0]} duck={ex[1]}"
    width = max((len(n) for n in results), default=0)
    nbad = 0
    for name, r in sorted(results.items()):
        flag = "OK " if r == "EXACT" else ("~  " if r.startswith("APPROX") else "BAD")
        if flag == "BAD":
            nbad += 1
        print(f"{flag} {name:<{width}} {r}")
    print(f"\n{len(results)} queries, {nbad} failing")
    return nbad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2],
                       "--only-present" in sys.argv[3:]) else 0)
