#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL in DuckDB over the raw testdata tables and compare (rows, schema,
sorted values) against the Spark parquet dumps from graft.Verify.

Results STREAM to an incremental artifact (arg 3 or
$GRAFT_CHECK_OUT, default /tmp/graft_check.json): the file is
rewritten after EVERY query, so a timeout/kill mid-run leaves a
partial per-query record instead of nothing (the r6 failure mode —
a driver timeout inside one slow oracle family produced `{}`)."""
import hashlib, json, math, os, subprocess, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf0.001"
check_out = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
    "GRAFT_CHECK_OUT", "/tmp/graft_check.json")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver testdata ships single files; TileSf output is a Spark
    # DIRECTORY of part files — glob it so the sf1 gate reads both
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

def rows_hash(rows):
    """Order-independent hash of canonical rows — recorded per query
    so a later artifact-level mismatch carries its own forensics
    (which side changed vs this run, not just 'hashes differ')."""
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode() + b"\x1e")
    return h.hexdigest()

# provenance: every artifact records WHAT was graded (the r7 red —
# two driver hash-fails nobody could reproduce — was unadjudicable
# because no artifact said which commit/SF it came from)
def git_sha():
    try:
        return subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__)))
                              ).stdout.strip() or None
    except Exception:
        return None

results = {"_meta": {
    "git_sha": git_sha(), "sf_dir": sf_dir, "verify_dir": out_dir,
    "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}}

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
    ok, why, diff_rows = True, "", None
    ohash, shash = None, None
    if ocols != scols:
        ok, why = False, f"cols oracle={ocols} spark={scols}"
    else:
        orows = sorted(tuple(canon(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
        srows = sorted(tuple(canon(v) for v in r)
                       for r in sdf[ocols].itertuples(index=False))
        ohash, shash = rows_hash(orows), rows_hash(srows)
        if len(orows) != len(srows):
            ok, why = False, f"rows oracle={len(orows)} spark={len(srows)}"
        elif orows != srows:
            ok = False
            bads = [i for i, (a, b) in enumerate(zip(orows, srows))
                    if a != b]
            why = (f"value mismatch at sorted row {bads[0]}: "
                   f"oracle={orows[bads[0]]} spark={srows[bads[0]]}")
            # first N differing canonical rows, BOTH sides, straight
            # into the artifact — a mismatch must be diagnosable from
            # the artifact alone (r7 'Next round' #1)
            diff_rows = [{"row": i, "cols": ocols,
                          "oracle": list(orows[i]), "spark": list(srows[i])}
                         for i in bads[:5]]
    dt = round(time.time() - t0, 2)
    if ok:
        print(f"ok   {name} ({len(odf)} rows, {dt}s)", flush=True)
        results[name] = {"match": True, "rows": len(odf), "oracle_sec": dt,
                         "value_hash": shash}
    else:
        fails.append(name)
        print(f"FAIL {name}: {why}", flush=True)
        rec = {"match": False, "err": why[:500], "oracle_sec": dt,
               "oracle_hash": ohash, "spark_hash": shash}
        if diff_rows:
            rec["diff_rows"] = diff_rows
        results[name] = rec
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

results["_meta"]["finished_utc"] = time.strftime(
    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
results["_meta"]["n_oracle"] = len(oracle)
results["_meta"]["n_rows_only"] = len(no_oracle)
results["_meta"]["n_fail"] = len(fails)
flush()
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
