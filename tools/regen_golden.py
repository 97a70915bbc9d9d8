#!/usr/bin/env python3
"""Regenerate the golden VALUES oracle blocks for the pinned queries from a
Verify output directory. The printed SQL is what belongs in the
corresponding `*Sql` vals (t08/t09 in TextQueries — xxhash64-dependent,
not replayable in DuckDB; q34 in CoverageQueries — HLL++/percentile sketch
internals) whenever those pipelines change. v04/v05/v06 graduated to
computed DuckDB replay oracles in round 4; g06 graduated in round 5
(fixed-point integer PageRank replayed by a recursive CTE) — neither is a
pin anymore.

Usage: regen_golden.py <verify_out_dir>   (run Verify at sf0.01 first —
the gate scale these oracles are pinned to)
"""
import sys, duckdb

SPECS = {
    "t08_minhash_lsh_dedup": [("doc_a", "BIGINT"), ("doc_b", "BIGINT"),
                              ("est_jaccard", "DOUBLE")],
    "t09_simhash_dedup": [("doc_a", "BIGINT"), ("doc_b", "BIGINT"),
                          ("hamming", "INT")],
    "q34_approx_sketches": [("l_returnflag", "VARCHAR"),
                            ("approx_parts", "BIGINT"),
                            ("exact_parts", "BIGINT"),
                            ("approx_median_price", "DOUBLE")],
}

outdir = sys.argv[1]
con = duckdb.connect()
for name, cols in SPECS.items():
    df = con.sql(
        f"SELECT * FROM '{outdir}/{name}/*.parquet' ORDER BY 1, 2").df()
    rows = []
    for _, r in df.iterrows():
        def fmt(c, t):
            if t == "DOUBLE":
                return repr(float(r[c]))
            if t == "VARCHAR":
                return "'" + str(r[c]).replace("'", "''") + "'"
            return str(int(r[c]))
        rows.append("(" + ", ".join(fmt(c, t) for c, t in cols) + ")")
    collist = ", ".join(c if t == "VARCHAR" else f"CAST({c} AS {t}) AS {c}"
                        for c, t in cols)
    names = ", ".join(c for c, _ in cols)
    print(f"===== {name} ({len(rows)} rows)")
    print(f"SELECT {collist}\n       FROM (VALUES\n         "
          + ",\n         ".join(rows) + f")\n       AS t({names})\n")
