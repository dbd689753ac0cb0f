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
import pyarrow as pa
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


def pa_type_name(t):
    """Canonical DuckDB-style name for a pyarrow type, so my parquet schema
    and DuckDB's DESCRIBE output live in one comparable type space. The
    compare must be NATIVE-type-exact: the round-5 escape was a TIMESTAMPTZ
    oracle column vs a plain-TIMESTAMP Spark column that the value-level
    norm() silently reconciled while the driver's schema gate rejected it."""
    if pa.types.is_timestamp(t):
        return "TIMESTAMP WITH TIME ZONE" if t.tz else "TIMESTAMP"
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    if pa.types.is_int8(t):
        return "TINYINT"
    if pa.types.is_int16(t):
        return "SMALLINT"
    if pa.types.is_int32(t):
        return "INTEGER"
    if pa.types.is_int64(t):
        return "BIGINT"
    if pa.types.is_float32(t):
        return "FLOAT"
    if pa.types.is_float64(t):
        return "DOUBLE"
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "VARCHAR"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa_type_name(t.value_type) + "[]"
    return str(t).upper()


def read_mine(name):
    """My side via pyarrow: parquet logical types preserved (Decimal stays
    Decimal), so a decimal-vs-double schema drift is visible in the repr."""
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    tbl = pq.read_table(files)
    cols = sorted(tbl.column_names)
    types = {f.name: pa_type_name(f.type) for f in tbl.schema}
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [types[c] for c in cols], list(zip(*data)) if data else []


def read_oracle(sql):
    # Native column types via DESCRIBE — NOT the values: a TIMESTAMPTZ
    # column full of UTC instants stringifies identically to TIMESTAMP.
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    types = {r[0]: r[1] for r in desc}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ocols = [cols[i] for i in order]
    return (ocols, [types[c] for c in ocols],
            [tuple(r[i] for i in order) for r in rows])


fails = []
for name, sql in sorted(oracles.items()):
    try:
        mcols, mtypes, mine = read_mine(name)
        ocols, otypes, oracle = read_oracle(sql)
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        fails.append(name)
        continue
    if mcols != ocols:
        print(f"FAIL {name}: columns {mcols} vs {ocols}")
        fails.append(name)
        continue
    if mtypes != otypes:
        diffs = [f"{c}: mine {a} vs oracle {b}"
                 for c, a, b in zip(mcols, mtypes, otypes) if a != b]
        print(f"FAIL {name}: schema ({'; '.join(diffs)})")
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
