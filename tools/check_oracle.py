#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: run each
oracle_sql.json query against the sf parquet tables, compare row-for-row
(columns sorted by name, rows sorted) with the Spark parquet dump."""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

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
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


fails = 0
for name, sql in sorted(oracle.items()):
    try:
        duck = con.execute(sql)
        dcols = [d[0] for d in duck.description]
        drows = duck.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
        fails += 1
        continue
    try:
        sp = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols = [d[0] for d in sp.description]
        srows = sp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark dump unreadable: {str(e)[:200]}")
        fails += 1
        continue
    if sorted(dcols) != sorted(scols):
        print(f"FAIL {name}: columns differ duck={sorted(dcols)} spark={sorted(scols)}")
        fails += 1
        continue
    dc, sc = canon(drows, dcols), canon(srows, scols)
    if dc != sc:
        fails += 1
        print(f"FAIL {name}: {len(dc)} duck rows vs {len(sc)} spark rows")
        for i, (a, b) in enumerate(zip(dc, sc)):
            if a != b:
                print(f"  first diff at {i}:\n   duck : {a[:220]}\n   spark: {b[:220]}")
                break
        else:
            if len(dc) != len(sc):
                only_d = set(dc) - set(sc)
                only_s = set(sc) - set(dc)
                for x in list(only_d)[:2]:
                    print(f"   only-duck : {x[:220]}")
                for x in list(only_s)[:2]:
                    print(f"   only-spark: {x[:220]}")
    else:
        print(f"PASS {name} ({len(dc)} rows)")

# rows-only queries
for name in sorted(set(__import__('os').listdir(OUT)) - set(oracle) - {"oracle_sql.json"}):
    try:
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} rows-only ({n} rows)")
        if n == 0:
            fails += 1
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:150]}")
        fails += 1

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
