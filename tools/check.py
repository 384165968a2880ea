#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL in DuckDB over the raw testdata tables and compare (rows, schema,
sorted values) against the Spark parquet dumps from graft.Verify."""
import json, math, sys
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {e}")
        continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        fails.append(name)
        print(f"FAIL {name}: cols oracle={ocols} spark={scols}")
        continue
    orows = sorted(tuple(canon(v) for v in r) for r in odf[ocols].itertuples(index=False))
    srows = sorted(tuple(canon(v) for v in r) for r in sdf[ocols].itertuples(index=False))
    if len(orows) != len(srows):
        fails.append(name)
        print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
        continue
    if orows != srows:
        fails.append(name)
        bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:")
        print(f"  oracle: {orows[bad]}")
        print(f"  spark : {srows[bad]}")
        continue
    print(f"ok   {name} ({len(orows)} rows)")

no_oracle = sorted(set(
    p.name for p in __import__('pathlib').Path(out_dir).iterdir()
    if p.is_dir()) - set(oracle))
for name in no_oracle:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    print(f"rows-only {name}: {n} rows")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
