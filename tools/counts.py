#!/usr/bin/env python3
"""Count-consistency gate (r7 VERDICT 'Next round' #8): one number
everywhere, enforced.

Asserts, without running Spark:
  1. SparkEntry.queries has NO duplicate keys (a Scala Map literal
     keeps the last binding silently — r6 shipped a shadowed
     operator this way) and neither does oracleSql.
  2. Every oracleSql key is also a queries key.
  3. Every queries key appears (backtick-quoted) in SURVEY.md §2 —
     an operator without a SURVEY row is ungraded surface; a SURVEY
     row whose query key vanished is a stale claim.
  4. If a CORRECTNESS/check artifact is given (arg 1), its query
     keys match SparkEntry.queries exactly.

Usage: tools/counts.py [CORRECTNESS_rN.json]
"""
import json, re, sys, collections, pathlib

root = pathlib.Path(__file__).resolve().parent.parent
src = (root / "src/main/scala/graft/SparkEntry.scala").read_text()
survey = (root / "SURVEY.md").read_text()

errors = []

def keys_of(block_name, text):
    """Keys of one Map literal section, by source position."""
    start = text.index(f"def {block_name}")
    # section ends at the next top-level def after it (or EOF)
    nxt = re.search(r"\n  def \w+", text[start + 10:])
    end = start + 10 + nxt.start() if nxt else len(text)
    body = text[start:end]
    return [m.group(1) for m in
            re.finditer(r'^\s*"([A-Za-z0-9_]+)"\s*->', body, re.M)]

qkeys = keys_of("queries", src)
okeys = keys_of("oracleSql", src)

for label, ks in [("queries", qkeys), ("oracleSql", okeys)]:
    dups = [k for k, n in collections.Counter(ks).items() if n > 1]
    if dups:
        errors.append(f"DUPLICATE keys in SparkEntry.{label}: {sorted(dups)}")

qset, oset = set(qkeys), set(okeys)
extra_oracle = oset - qset
if extra_oracle:
    errors.append(f"oracleSql keys with NO query: {sorted(extra_oracle)}")

# SURVEY §2 rows and backticked query names
sec2 = survey[survey.index("## §2"):survey.index("## §3")]
rows = [l for l in sec2.splitlines()
        if re.match(r"^\| \d+\w*'? \|", l)]
ticked = set(re.findall(r"`([A-Za-z0-9_]+)`", sec2))
unsurveyed = sorted(qset - ticked)
if unsurveyed:
    errors.append(f"{len(unsurveyed)} queries with no SURVEY §2 row: "
                  f"{unsurveyed[:10]}{'...' if len(unsurveyed) > 10 else ''}")

artifact_n = None
if len(sys.argv) > 1:
    art = json.load(open(sys.argv[1]))
    akeys = {k for k in art if not k.startswith("_")}
    if akeys != qset:
        missing = sorted(qset - akeys)[:8]
        stray = sorted(akeys - qset)[:8]
        errors.append(f"artifact {sys.argv[1]} != SparkEntry.queries: "
                      f"missing={missing} stray={stray}")
    artifact_n = len(akeys)

print(f"queries={len(qkeys)} oracles={len(okeys)} "
      f"rows_only={len(qset - oset)} survey_rows={len(rows)}"
      + (f" artifact={artifact_n}" if artifact_n is not None else ""))
for e in errors:
    print("FAIL " + e)
sys.exit(1 if errors else 0)
