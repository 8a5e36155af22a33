#!/usr/bin/env python3
"""Dev-only differential harness mirroring the driver's DuckDB oracle
compare: run graft.Verify first (writes <out>/<query>/ parquet +
oracle_sql.json), then this script re-runs each oracle SQL in DuckDB over
the same sf tables and diffs values (columns sorted by name, rows sorted).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_df()
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
            print(f"FAIL {name}: schema {gcols} vs {ecols}"); n_bad += 1; continue
        # itertuples preserves per-column dtypes; .values would upcast a
        # mixed int/float frame to all-float and mask int-vs-float
        # mismatches that the driver's per-value hash does catch.
        g = list(got[gcols].itertuples(index=False, name=None))
        e = list(exp[ecols].itertuples(index=False, name=None))
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        g = sorted([tuple(str(norm(v)) for v in r) for r in g])
        e = sorted([tuple(str(norm(v)) for v in r) for r in e])
        if g == e:
            print(f"ok   {name} ({len(g)} rows)"); n_ok += 1
        else:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: {len([1 for a,b in zip(g,e) if a!=b])} row diffs, first: {bad}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
