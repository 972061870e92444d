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
        out[m.group(1)] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "spark_rows": None,
                           "oracle_rows": None, "err": m.group(2).strip()}
json.dump(dict(sorted(out.items())), open(dst, "w"), indent=1, sort_keys=True)
n_pass = sum(1 for v in out.values() if v["hash_match"])
print(f"{dst}: {n_pass}/{len(out)} pass")
