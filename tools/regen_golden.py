#!/usr/bin/env python3
"""Regenerate the golden VALUES oracle blocks for the deterministic LSH/IVF
queries from a Verify output directory. The printed SQL is what belongs in
the corresponding `*Sql` vals (t08/t09 in TextQueries, v04/v05/v06 in
VectorQueries) whenever those pipelines change.

Usage: regen_golden.py <verify_out_dir>   (run Verify at sf0.01 first —
the gate scale these oracles are pinned to)
"""
import sys, duckdb

SPECS = {
    "t08_minhash_lsh_dedup": [("doc_a", "BIGINT"), ("doc_b", "BIGINT"),
                              ("est_jaccard", "DOUBLE")],
    "t09_simhash_dedup": [("doc_a", "BIGINT"), ("doc_b", "BIGINT"),
                          ("hamming", "INT")],
    "v04_ann_lsh_topk": [("query_id", "BIGINT"), ("rank", "INT"),
                         ("corpus_id", "BIGINT"), ("cosine", "DOUBLE")],
    "v05_embedding_neardup": [("vec_a", "BIGINT"), ("vec_b", "BIGINT"),
                              ("cosine", "DOUBLE")],
    "v06_ivf_topk": [("query_id", "BIGINT"), ("rank", "INT"),
                     ("corpus_id", "BIGINT"), ("cosine", "DOUBLE")],
}

outdir = sys.argv[1]
con = duckdb.connect()
for name, cols in SPECS.items():
    df = con.sql(
        f"SELECT * FROM '{outdir}/{name}/*.parquet' ORDER BY 1, 2").df()
    rows = []
    for _, r in df.iterrows():
        vals = [repr(float(r[c])) if t == "DOUBLE" else str(int(r[c]))
                for c, t in cols]
        rows.append("(" + ", ".join(vals) + ")")
    collist = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in cols)
    names = ", ".join(c for c, _ in cols)
    print(f"===== {name} ({len(rows)} rows)")
    print(f"SELECT {collist}\n       FROM (VALUES\n         "
          + ",\n         ".join(rows) + f")\n       AS t({names})\n")
