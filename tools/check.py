#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL in DuckDB over the raw testdata tables and compare (rows, schema,
sorted values) against the Spark parquet dumps from graft.Verify.

Results STREAM to an incremental artifact (arg 3 or
$GRAFT_CHECK_OUT, default /tmp/graft_check.json): the file is
rewritten after EVERY query, so a timeout/kill mid-run leaves a
partial per-query record instead of nothing (the r6 failure mode —
a driver timeout inside one slow oracle family produced `{}`)."""
import json, math, os, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf0.001"
check_out = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
    "GRAFT_CHECK_OUT", "/tmp/graft_check.json")

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

results = {}

def flush():
    tmp = check_out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f)
    os.replace(tmp, check_out)

fails = []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        odf = con.execute(sql).fetchdf()
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {e}", flush=True)
        results[name] = {"match": False, "err": str(e)[:500],
                         "oracle_sec": round(time.time() - t0, 2)}
        flush()
        continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    ok, why = True, ""
    if ocols != scols:
        ok, why = False, f"cols oracle={ocols} spark={scols}"
    else:
        orows = sorted(tuple(canon(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
        srows = sorted(tuple(canon(v) for v in r)
                       for r in sdf[ocols].itertuples(index=False))
        if len(orows) != len(srows):
            ok, why = False, f"rows oracle={len(orows)} spark={len(srows)}"
        elif orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
            ok = False
            why = (f"value mismatch at sorted row {bad}: "
                   f"oracle={orows[bad]} spark={srows[bad]}")
    dt = round(time.time() - t0, 2)
    if ok:
        print(f"ok   {name} ({len(odf)} rows, {dt}s)", flush=True)
        results[name] = {"match": True, "rows": len(odf), "oracle_sec": dt}
    else:
        fails.append(name)
        print(f"FAIL {name}: {why}", flush=True)
        results[name] = {"match": False, "err": why[:500], "oracle_sec": dt}
    flush()

no_oracle = sorted(set(
    p.name for p in __import__('pathlib').Path(out_dir).iterdir()
    if p.is_dir()) - set(oracle))
for name in no_oracle:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    print(f"rows-only {name}: {n} rows", flush=True)
    results[name] = {"match": None, "rows_only": True, "rows": n}
    flush()

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
