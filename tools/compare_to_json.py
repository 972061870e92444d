#!/usr/bin/env python3
"""Convert tools/compare.py stdout into the driver's CORRECTNESS json
shape (per query: rows/schema/hash match + row counts), so round-close
sf0.1 sweeps can be committed as CORRECTNESS_sf01_r{N}.json.

Usage: python3 tools/compare_to_json.py <compare_output.txt> <out.json>
"""
import json, re, sys

src, dst = sys.argv[1], sys.argv[2]
out = {}
for line in open(src):
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
    if m:
        out[m.group(1)] = {"rows_match": True, "schema_match": True,
                           "hash_match": True, "spark_rows": int(m.group(2)),
                           "oracle_rows": int(m.group(2)), "err": None}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line)
    if m:
        # attribute only the dimension that actually failed (ADVICE r19:
        # recording all three False misattributed e.g. a pure row-count
        # mismatch as a schema failure too); unknown dimensions are None
        name, err = m.group(1), m.group(2).strip()
        rec = {"rows_match": None, "schema_match": None, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": err}
        mr = re.match(r"rows spark=(\d+) duck=(\d+)", err)
        if err.startswith("columns ") or err.startswith("float32 output columns"):
            rec["schema_match"] = False
        elif mr:
            rec.update(rows_match=False, schema_match=True,
                       spark_rows=int(mr.group(1)), oracle_rows=int(mr.group(2)))
        elif err.startswith("col "):
            rec.update(rows_match=True, schema_match=True)
        out[name] = rec
json.dump(dict(sorted(out.items())), open(dst, "w"), indent=1, sort_keys=True)
n_pass = sum(1 for v in out.values() if v["hash_match"])
print(f"{dst}: {n_pass}/{len(out)} pass")
