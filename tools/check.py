#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running SparkEntry.oracleSql over the same testdata.
Usage: python3 tools/check.py [sf_dir] [out_dir]
"""
import json, sys, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()
    return str(v)

fails = []
for name, sql in sorted(oracles.items()):
    try:
        mine = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchdf()
        oracle = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        fails.append(name)
        continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    oracle = oracle.reindex(sorted(oracle.columns), axis=1)
    if list(mine.columns) != list(oracle.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oracle.columns)}")
        fails.append(name)
        continue
    if len(mine) != len(oracle):
        print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}")
        fails.append(name)
        continue
    mrows = [tuple(norm(v) for v in r) for r in mine.itertuples(index=False)]
    orows = [tuple(norm(v) for v in r) for r in oracle.itertuples(index=False)]
    if mrows != orows:
        ndiff = sum(1 for a, b in zip(mrows, orows) if a != b)
        print(f"FAIL {name}: {ndiff}/{len(mrows)} differing rows (in-order compare)")
        for i, (a, b) in enumerate(zip(mrows, orows)):
            if a != b:
                print(f"  row {i}:\n    mine   {a}\n    oracle {b}")
                break
        # also check as multisets (row-order-insensitive)
        if sorted(mrows) == sorted(orows):
            print("  (rows match as a multiset — ordering issue only)")
        fails.append(name)
        continue
    print(f"ok   {name}: {len(mrows)} rows")

print(f"\n{len(oracles) - len(fails)}/{len(oracles)} green" +
      (f"; FAILING: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
