package graft

/** Plan-shape regression guards (SURVEY.md §8): the 100 TB posture lives in
  * the physical plan, so the load-bearing shapes are pinned as tests — a
  * future edit that silently turns a broadcast join into a shuffle join, or
  * a bucketed candidate join into a cartesian product, fails here instead
  * of in a cluster bill.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = TestSpark.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q05 star join broadcasts every dimension (fact tables are the only shuffle)") {
    val p = plan("q05_region_star_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    // region/nation/customer/orders dims all broadcast: the only allowed
    // hash exchanges are the lineitem⋈orders fact side + final agg
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 3, s"too many shuffle exchanges ($shuffles):\n$p")
  }

  test("dedup/ANN candidate generation never degenerates to a cartesian product") {
    for (name <- Seq("t07_ngram_jaccard_dedup", "t08_minhash_lsh_dedup",
        "t09_simhash_dedup", "v05_embedding_neardup", "v06_ivf_topk")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
    }
  }

  test("v02 brute-force kNN broadcasts the query side, never the corpus") {
    val p = plan("v02_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus must not re-shuffle as cartesian:\n$p")
  }

  test("q10 global top-k uses TakeOrderedAndProject (no global sort)") {
    val p = plan("q10_global_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q02 filter reaches the parquet scan and columns are pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushdown:\n$p")
    // projection pruning: the scan schema must not include every lineitem
    // column (l_comment-free fixtures still have 15+; the query needs ~6)
    assert(!p.contains("l_tax") || p.contains("l_tax)"),
      s"scan reads unneeded columns:\n$p")
  }

  test("aggregations keep partial (map-side) aggregation") {
    val p = plan("q01_pricing_summary")
    // two HashAggregates around one exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial agg:\n$p")
  }
}
