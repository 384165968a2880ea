#!/usr/bin/env python3
"""Distill a tools/check.py artifact into BASELINE_LOCAL.json — the
standing per-query DuckDB timing baseline (r7 VERDICT 'Next round'
#7: BASELINE.json publishes no timings, so 'within 2x of baseline'
had no per-query numbers; DuckDB-on-identical-SQL is the honest
local comparator).

Usage: tools/baseline.py /tmp/graft_check.json [BASELINE_LOCAL.json]

Bench.scala reads the output and reports Spark-vs-DuckDB ratios per
round. Caveat recorded in _meta: oracle_sec measures DuckDB running
the ORACLE formulation (often a deliberately naive unrolled/recursive
replay) at whatever thread count DuckDB defaults to — it is a sanity
bar, not a tuned-engine shootout.
"""
import json, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_check.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_LOCAL.json"

art = json.load(open(src))
out = {"_meta": {**art.get("_meta", {}), "source": src,
                 "what": "DuckDB oracle replay seconds per query"}}
for k, v in sorted(art.items()):
    if k.startswith("_"):
        continue
    if isinstance(v, dict) and "oracle_sec" in v and v.get("match"):
        out[k] = v["oracle_sec"]
json.dump(out, open(dst, "w"), indent=0, sort_keys=True)
print(f"{dst}: {len(out) - 1} query baselines")
