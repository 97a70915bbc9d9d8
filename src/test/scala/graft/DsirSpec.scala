package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dsir, GlobalOrder}

/** Laws for the DSIR importance-resampling operator (t34) and its
  * GlobalOrder rank machinery.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random frame with TIES in the sort key (floor
  // collapses values) so the id tie-break is actually exercised
  private def rankFixture(n: Int) =
    spark.range(n).toDF("id")
      .withColumn("key", floor(pmod(xxhash64(col("id")), lit(97))).cast("double"))

  test("GlobalOrder.rank equals the naive global window across partitionings") {
    val df = rankFixture(500)
    val naive = df.withColumn("expect",
      row_number().over(Window.orderBy(col("key").desc, col("id").asc)))
    for (parts <- Seq(1, 3, 16)) {
      val got = GlobalOrder.rank(
        df.repartition(parts), Seq(col("key").desc, col("id").asc), "rank")
      val joined = got.join(naive.select(col("id"), col("expect")), "id")
      assert(joined.where(col("rank") =!= col("expect")).isEmpty,
        s"ranks diverge from the global window at input partitions=$parts")
      // every rank exactly once
      assert(got.select(col("rank")).distinct().count() === 500L)
    }
  }

  test("GlobalOrder.rank survives an empty input") {
    val empty = rankFixture(0)
    assert(GlobalOrder.rank(empty, Seq(col("key").desc, col("id"))).isEmpty)
  }

  // two disjoint vocabularies: target-like docs draw from T, the rest from
  // R. 40 grams × ~ln-ratio separation per gram puts tens of nats between
  // the two score populations — no double-representable Gumbel draw can
  // bridge it, so the assertion is deterministic, not probabilistic.
  private def dsirFixture = {
    val tWords = (0 until 20).map(i => s"alpha$i")
    val rWords = (0 until 20).map(i => s"beta$i")
    def doc(words: Seq[String], seed: Int): String =
      (0 until 21).map(j => words((seed * 7 + j * 13) % words.size)).mkString(" ")
    val rows = (0 until 30).map { i =>
      if (i < 10) (i.toLong, doc(tWords, i), "target")
      else (i.toLong, doc(rWords, i), "pool")
    }
    rows.toDF("doc_id", "text", "kind")
  }

  test("DSIR selects exactly k docs and ranks target-like docs first") {
    val df = dsirFixture
    val out = Dsir.select(
      df.where(col("kind") === "target"), df, "doc_id", "text",
      k = 10, buckets = 512).cache()
    try {
      assert(out.count() === 30L)
      assert(out.where(col("selected")).count() === 10L)
      // the 10 target-vocabulary docs outscore every beta-vocabulary doc
      val selectedIds = out.where(col("selected"))
        .select(col("doc_id")).as[Long].collect().toSet
      assert(selectedIds === (0L until 10L).toSet,
        s"selection drifted off the target-like docs: $selectedIds")
      // rank is a permutation of 1..n
      assert(out.select(col("sel_rank")).as[Long].collect().sorted
        .sameElements(1L to 30L))
    } finally out.unpersist()
  }

  test("DSIR verdict equals the naive single-window recompute") {
    val df = dsirFixture
    val target = df.where(col("kind") === "target")
    val out = Dsir.select(target, df, "doc_id", "text", k = 7, buckets = 256)
    // same scoring path, naive global window for the rank
    val ratios = Dsir.fitLogRatios(target, df, "text", 256)
    val u = (graft.functions.DsirExpressions.hash61(col("doc_id").cast("string"))
      .cast("double") + lit(0.5)) / lit(graft.functions.Mod61.P.toDouble)
    val naive = Dsir.score(df, "doc_id", "text", ratios, 256)
      .withColumn("logw", round(col("__raw_logw") + lit(1e-9), 4))
      .withColumn("sel_key", round(col("__raw_logw") - log(-log(u)) + lit(1e-9), 4))
      .withColumn("sel_rank",
        row_number().over(Window.orderBy(col("sel_key").desc, col("doc_id").asc))
          .cast("long"))
      .withColumn("selected", col("sel_rank") <= 7)
      .select("doc_id", "n_grams", "logw", "sel_key", "sel_rank", "selected")
    assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty,
      "operator verdict diverges from the naive-window recompute")
  }

  test("DSIR verdict is invariant to input partitioning") {
    val df = dsirFixture
    val target = df.where(col("kind") === "target")
    val a = Dsir.select(target, df, "doc_id", "text", k = 5, buckets = 256)
    val b = Dsir.select(target, df.repartition(13), "doc_id", "text",
      k = 5, buckets = 256)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("score rejects a table fitted with a different bucket count") {
    intercept[IllegalArgumentException] {
      Dsir.score(dsirFixture, "doc_id", "text", new Array[Double](8), 16)
    }
  }
}
