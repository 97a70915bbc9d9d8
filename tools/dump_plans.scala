import java.nio.file.{Files, Paths}
val names = Seq("q01_pricing_summary", "q05_region_star_join", "q07_window_topk_per_group",
  "q10_global_topk", "q46_ordered_set_aggs", "e04_sessionization", "e05_asof_join",
  "t07_ngram_jaccard_dedup", "t08_minhash_lsh_dedup", "t21_chunking",
  "t22_block_dedup", "t23_mixture_sample", "t30_heavy_hitters",
  "t31_bloom_decontamination", "t32_cdc_dedup", "t33_ppjoin_dedup",
  "t34_dsir_selection", "t35_incremental_cdc_dedup", "t36_bm25_retrieval",
  "t37_staged_bm25_retrieval", "t38_incremental_bm25_index",
  "t39_bpe_tokenize", "t40_quality_classifier", "v02_cosine_topk",
  "v04_ann_lsh_topk", "v06_ivf_topk", "v08_twostage_topk",
  "v15_pq_topk", "v17_ivf_pq_topk", "v18_pq_trained_topk", "v19_staged_ivfpq_topk",
  "v20_hybrid_rrf_topk",
  "g01_two_hop_traversal", "g09_triangle_count")
val sb = new StringBuilder
sb.append("# Physical plan audit (generated)\n\n")
sb.append("Formatted plans for the headline operator families at sf0.01, as planned\n")
sb.append("by Spark 4.1.2 with AQE on (initial adaptive plan; runtime re-planning can\n")
sb.append("only improve these). Regenerate with `tools/dump_plans.sh`. The shapes the\n")
sb.append("suite pins in PlanAuditSpec are visible here: broadcast star joins, single\n")
sb.append("window exchanges, TakeOrderedAndProject top-k, bucketed candidate joins\n")
sb.append("with no cartesian products, and parquet PushedFilters.\n")
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
  sb.append(s"\n## $n\n\n```\n")
  sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
  sb.append("\n```\n")
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("[res] wrote PLANS.md " + sb.length + " chars")
System.exit(0)
