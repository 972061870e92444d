#!/usr/bin/env python3
"""Regenerate baseline_floors.json — the per-query steady FLOORS the
bench's load-retime trigger compares against (VERDICT r18 #1).

Floor(q) = min over the recent-era sf0.1 bench artifacts (r17+r18, the
rounds whose plans match the current code) of that query's steady
seconds. External load only ever INFLATES a measurement, so the min
over history is a true floor; a query whose plan legitimately slowed
later merely over-triggers a (cheap, harmless) in-JVM re-measure.

Run from the repo root after each round close:
    python3 tools/gen_floors.py [round ...]

With no arguments, every BENCH_r{N}*.json with N >= MIN_ROUND joins the
floor pool (ADVICE r19: the former hardcoded r17/r18/r19 glob list went
stale every round); passing explicit round numbers restricts to those.
MIN_ROUND marks the start of the current plan era — bump it when a
round deliberately re-plans queries so pre-era floors stop applying.
"""
import json, glob, re, sys

MIN_ROUND = 17  # first round whose plans match the current code era
only = {int(a) for a in sys.argv[1:]} or None
SOURCES = []
for p in sorted(glob.glob("BENCH_r*.json")):
    m = re.match(r"BENCH_r(\d+)", p)
    if not m:
        continue
    r = int(m.group(1))
    if (r in only) if only else (r >= MIN_ROUND):
        SOURCES.append(p)
floors = {}
used = []
for p in SOURCES:
    try:
        d = json.load(open(p))
    except Exception:
        continue
    qs = None
    if isinstance(d, dict):
        if isinstance(d.get("queries"), dict):
            qs = d["queries"]
        elif isinstance(d.get("parsed"), dict) and isinstance(d["parsed"].get("queries"), dict):
            qs = d["parsed"]["queries"]
        elif isinstance(d.get("tail"), str):
            # driver artifacts wrap the bench line in a "tail" capture that
            # may be truncated at the head — recover the queries map by
            # scanning for the complete big line inside it
            for line in d["tail"].splitlines():
                try:
                    j = json.loads(line)
                    if isinstance(j.get("queries"), dict):
                        qs = j["queries"]
                        break
                except Exception:
                    continue
    if not qs:
        continue
    used.append(p)
    for k, v in qs.items():
        if isinstance(v, (int, float)) and v > 0:
            floors[k] = min(floors.get(k, 1e18), float(v))

out = {"sf": "/root/testdata/sf0.1",
       "sources": used,
       "floors": {k: round(v, 3) for k, v in sorted(floors.items())}}
json.dump(out, open("baseline_floors.json", "w"), indent=1)
print(f"{len(floors)} floors from {len(used)} artifacts -> baseline_floors.json")
