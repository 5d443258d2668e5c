#!/usr/bin/env python3
"""Dev helper mimicking the driver's correctness gate: compare each
graft.Verify parquet dump against its DuckDB oracle SQL over the same
testdata parquet. Sorts columns by name, sorts rows, compares values.

Usage: scripts/check_oracle.py [sfDir] [verifyOut] [queryName...]
"""
import sys, json, math, glob, os
import duckdb

def type_names(sql):
    """Column name -> real DuckDB type name (via con.sql; the DB-API
    .description collapses all numerics to NUMBER). Spark output is read
    back through DuckDB so int64 parquet -> BIGINT; an oracle whose SQL
    yields HUGEINT/DECIMAL where Spark produced BIGINT is a typing bug
    the value-level compare below is blind to (str(v) loses it) but the
    driver's hasher fails on. Compare types strictly."""
    rel = con.sql(sql)
    # Int widths <=64-bit hash identically in the driver (python int) —
    # collapse them. HUGEINT/DECIMAL/FLOAT/DOUBLE do NOT; keep distinct.
    INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
    return {c: ("INT" if str(t).upper() in INTS else str(t).upper())
            for c, t in zip(rel.columns, rel.types)}

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v!r}"
            elif isinstance(v, (bytes, bytearray)):
                v = v.hex()
            elif isinstance(v, list):
                v = json.dumps([f"{x!r}" if isinstance(x, float) else x for x in v])
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out

fail = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    pq = f"{OUT}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"FAIL {name}: no verify output at {pq}")
        fail += 1
        continue
    got_sql = f"SELECT * FROM '{pq}/*.parquet'"
    got_rel = con.execute(got_sql)
    got_cols = [d[0] for d in got_rel.description]
    got = canon(got_rel.fetchall(), got_cols)
    got_types = type_names(got_sql)
    try:
        exp_rel = con.execute(oracle[name])
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    exp_cols = [d[0] for d in exp_rel.description]
    exp = canon(exp_rel.fetchall(), exp_cols)
    exp_types = type_names(oracle[name])
    type_diff = {c: (got_types.get(c), exp_types.get(c))
                 for c in set(got_types) | set(exp_types)
                 if got_types.get(c) != exp_types.get(c)}
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        fail += 1
    elif type_diff:
        print(f"FAIL {name}: column dtype mismatch (spark, oracle): {type_diff}")
        fail += 1
    elif got != exp:
        print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; first diff:")
        for a, b in zip(got, exp):
            if a != b:
                print(f"  got {a}\n  exp {b}")
                break
        else:
            n = min(len(got), len(exp))
            print(f"  row-count mismatch beyond {n}")
        fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

extra = [k for k in os.listdir(OUT)
         if os.path.isdir(f"{OUT}/{k}") and k not in oracle]
if extra:
    print("no-oracle (rows-only check):", extra)
sys.exit(1 if fail else 0)
