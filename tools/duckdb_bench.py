#!/usr/bin/env python3
"""Time the DuckDB oracle replay of each headline query at a given sf —
the single-node OLAP reference point for SURVEY §6's engine-vs-engine
table. The oracle SQL is written for bit-exact replay (not hand-tuned
DuckDB), so treat the numbers as "the same declarative spec executed by a
first-class columnar engine", not a DuckDB best-case.

Usage: duckdb_bench.py <sfdir> <oracle_sql.json> [reps=3] [out.json]
Requires a prior Verify dump only for its oracle_sql.json.
"""
import json
import statistics
import sys
import time

import duckdb

sfdir = sys.argv[1]
oracle_path = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
out_path = sys.argv[4] if len(sys.argv) > 4 else None

# the headline set Bench times (keep in sync with Bench.scala); oracle
# queries missing from the dump (none today) are skipped with a notice
HEADLINE = [
    "q01_pricing_summary", "q03_top_revenue_orders", "q05_region_star_join",
    "q07_window_topk_per_group", "q12_bag_difference", "q25_left_outer_join",
    "q36_grouping_sets", "q39_pivot", "q40_recursive_cte", "q42_lateral_topn",
    "q45_salted_skew_join", "q46_ordered_set_aggs", "e01_tumbling_window",
    "e04_sessionization", "e05_asof_join", "e07_session_window",
    "e08_cohort_retention", "e09_funnel", "t02_token_stats",
    "t07_ngram_jaccard_dedup", "t08_minhash_lsh_dedup", "t09_simhash_dedup",
    "t12_dedup_clusters", "t14_tfidf_topk", "t18_sequence_packing",
    "t19_stratified_sample", "t20_corpus_shuffle", "t21_chunking",
    "t22_block_dedup", "t23_mixture_sample", "t25_curation_pipeline",
    "t26_lm_perplexity_filter", "t27_incremental_dedup",
    "t28_staged_incremental_dedup", "t30_heavy_hitters",
    "t31_bloom_decontamination", "t32_cdc_dedup", "t33_ppjoin_dedup",
    "t34_dsir_selection", "t35_incremental_cdc_dedup", "t36_bm25_retrieval",
    "t37_staged_bm25_retrieval", "t38_incremental_bm25_index",
    "t39_bpe_tokenize", "t40_quality_classifier",
    "v02_cosine_topk", "v04_ann_lsh_topk",
    "v06_ivf_topk", "v07_int8_quantize", "v08_twostage_topk",
    "v09_quantized_topk", "v10_quantized_prefix_topk",
    "v11_ivf_quantized_topk", "v15_pq_topk", "v16_pq_stored_topk",
    "v17_ivf_pq_topk", "v18_pq_trained_topk", "v19_staged_ivfpq_topk",
    "v20_hybrid_rrf_topk",
    "v12_semantic_dedup",
    "v13_incremental_semantic_dedup", "q38_udtf_flatmap",
    "g01_two_hop_traversal", "g12_bucketed_traversal",
    "g05_connected_components", "g06_pagerank_topk", "g09_triangle_count",
    "g10_weighted_sssp", "t29_mp4_demux", "e11_anomaly_zscores",
    "t42_compacted_bm25_index", "s01_stream_tumbling_window",
    "s05_stream_session_window", "s07_stream_running_totals",
    "s08_stream_inactivity", "s09_stream_chained_agg",
    "s11_stream_semantic_dedup", "s12_stream_jaccard_ingest",
    "s13_stream_cdc_ingest", "s14_stream_bm25_ingest",
    "s15_stream_graph_ingest", "t41_frame_luma",
    "t43_compacted_cdc_store", "v21_compacted_ivf_layout",
]

import glob
import os

con = duckdb.connect()
con.sql("SET threads TO 32")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_path))
results, failed = {}, []
for name in HEADLINE:
    sql = oracle.get(name)
    if sql is None:
        print(f"skip {name}: no oracle SQL", file=sys.stderr)
        continue
    try:
        con.sql(sql).fetchall()  # warm (page cache + plan)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(samples), 4)
        print(f"{name}: {results[name]}s")
    except Exception as e:  # noqa: BLE001 — record and continue
        failed.append(name)
        print(f"FAIL {name}: {str(e)[:200]}", file=sys.stderr)

total = round(sum(results.values()), 3)
out = {"metric": "duckdb_oracle_replay", "value": total, "unit": "sec",
       "sf": sfdir, "reps": reps, "threads": 32,
       "queries": results, "failed": failed}
line = json.dumps(out)
print(line)
if out_path:
    with open(out_path, "w") as f:
        f.write(line)
