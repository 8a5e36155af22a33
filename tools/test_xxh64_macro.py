#!/usr/bin/env python3
"""Differential test: DuckDB pure-SQL xxh64 macro vs tools/xxh64.py
(which is itself pinned to Spark XXH64 ground truth from graft.XxProbe)."""
import duckdb, random, string, sys, os
sys.path.insert(0, os.path.dirname(__file__))
from xxh64 import xxh64

con = duckdb.connect()
con.execute(open(os.path.join(os.path.dirname(__file__), "xxh64_macros.sql")).read())

rng = random.Random(7)
cases = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
         "abcdefghi", "abcdefghijkl", "hello world", "the quick brown fox",
         "0123456789012345678901234567890", "01234567890123456789012345678901",
         "the quick brown fox jumps over the lazy dog and keeps running far",
         "naïve café ünïcode ✓ test"]
for L in list(range(0, 100)) + [127, 128, 129, 255, 256, 300]:
    cases.append("".join(rng.choice(string.ascii_letters + string.digits + " _-")
                         for _ in range(L)))
bad = 0
con.execute("CREATE TABLE t(s VARCHAR)")
con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in cases])
rows = con.execute("SELECT s, xg_xxh64u(s), xg_h32(s) FROM t").fetchall()
for s, got64, got32 in rows:
    want = xxh64(s)
    if int(got64) != want or int(got32) != want % (1 << 32):
        bad += 1
        print(f"MISMATCH {s!r}: got {got64} want {want}")
print("all ok" if not bad else f"{bad}/{len(cases)} mismatches")
sys.exit(1 if bad else 0)
