#!/usr/bin/env python3
"""Render the SURVEY §6 engine-vs-engine table: Spark headline medians vs
the DuckDB oracle replay, at sf0.1 and sf1, with growth ratios.

Usage: engine_compare.py SPARK_sf01.json DUCKDB_sf01.json SPARK_sf1.json DUCKDB_sf1.json
Every oracle is a computed replay as of round 11 (t08/t09 moved from
golden VALUES pins to Mod61 signature replays), so nothing is excluded;
streaming queries compare a stateful watermarked drain against
its batch-equivalent SQL, flagged accordingly.
"""
import json
import sys

GOLDEN = set()

s01, d01, s1, d1 = (json.load(open(p))["queries"] for p in sys.argv[1:5])

rows = []
for q in s01:
    if q in GOLDEN or q not in d01:
        continue
    r = {
        "q": q,
        "spark01": s01[q], "duck01": d01.get(q),
        "spark1": s1.get(q), "duck1": d1.get(q),
    }
    if r["duck1"] and r["spark1"]:
        r["spark_growth"] = r["spark1"] / s01[q]
        r["duck_growth"] = r["duck1"] / d01[q] if d01[q] else float("inf")
        r["sf1_edge"] = r["duck1"] / r["spark1"]  # >1 → Spark faster at sf1
    rows.append(r)

rows.sort(key=lambda r: -(r.get("duck1") or 0))
print("| query | Spark sf0.1 | DuckDB sf0.1 | Spark sf1 | DuckDB sf1 | Spark 10× | DuckDB 10× |")
print("|---|---|---|---|---|---|---|")
for r in rows:
    print(f"| {r['q']} | {r['spark01']:.2f} | {r['duck01']:.2f} | "
          f"{r['spark1']:.2f} | {r['duck1']:.2f} | "
          f"{r['spark_growth']:.1f}× | {r['duck_growth']:.1f}× |")

tot = lambda d, keys: sum(v for k, v in d.items() if k in keys)
keys = {r["q"] for r in rows}
print(f"\ntotals over {len(keys)} compared queries:")
print(f"  sf0.1: Spark {tot(s01, keys):.1f}s  DuckDB {tot(d01, keys):.1f}s")
print(f"  sf1  : Spark {tot(s1, keys):.1f}s  DuckDB {tot(d1, keys):.1f}s")
wins = [r for r in rows if r.get("sf1_edge", 0) > 1]
print(f"  Spark faster at sf1 on {len(wins)}: "
      + ", ".join(f"{r['q']} ({r['sf1_edge']:.1f}×)" for r in wins))
