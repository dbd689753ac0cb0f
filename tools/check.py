#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running SparkEntry.oracleSql over the same testdata.

The compare is REPR-sensitive, mimicking the driver's hasher: my side is
read with pyarrow (native parquet types — a DECIMAL column stays Decimal),
the oracle side comes back as DuckDB native Python values, and each value
is stringified before comparing. A Spark DECIMAL(18,2) output against a
DuckDB DOUBLE therefore FAILS ('123.40' vs '123.4') even though the values
are numerically equal — exactly the round-2 failure class that a
value-exact compare cannot see.

Usage: python3 tools/check.py [sf_dir] [out_dir]
"""
import datetime
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

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
    """Stringify a native value the way a repr-based hasher would."""
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:  # Spark writes UTC-adjusted timestamps
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    return str(v)


def read_mine(name):
    """My side via pyarrow: parquet logical types preserved (Decimal stays
    Decimal), so a decimal-vs-double schema drift is visible in the repr."""
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    tbl = pq.read_table(files)
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, list(zip(*data)) if data else []


def read_oracle(sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(r[i] for i in order) for r in rows]


fails = []
for name, sql in sorted(oracles.items()):
    try:
        mcols, mine = read_mine(name)
        ocols, oracle = read_oracle(sql)
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        fails.append(name)
        continue
    if mcols != ocols:
        print(f"FAIL {name}: columns {mcols} vs {ocols}")
        fails.append(name)
        continue
    if len(mine) != len(oracle):
        print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}")
        fails.append(name)
        continue
    mrows = [tuple(norm(v) for v in r) for r in mine]
    orows = [tuple(norm(v) for v in r) for r in oracle]
    if mrows != orows:
        ndiff = sum(1 for a, b in zip(mrows, orows) if a != b)
        print(f"FAIL {name}: {ndiff}/{len(mrows)} differing rows (in-order repr compare)")
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
