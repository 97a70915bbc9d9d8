package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Round-17 phase decomposition of ngramJaccardPairs (t07; t12/t27/t28/
  * s12 share its shape): postings build, df-cap, size window, pair
  * self-join — which phase owns the ~3.3s at sf0.1?
  * Run: sbt -batch "Test/runMain graft.R17JaccardProbe /root/testdata/sf0.1"
  */
object R17JaccardProbe {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))

    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val n = spark.sparkContext.defaultParallelism

    noop(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.1, 3, 100, n))
    cleanup()
    for (rep <- 1 to 3) {
      // cumulative phases, rebuilt fresh each time (pins freed between)
      val input = docs.repartition(n)
      val postingsAll = Dedup.jaccardPostings(input, "doc_id", "text", 3)
        .localCheckpoint(false)
      val tPost = timed(noop(postingsAll))
      val hot = postingsAll.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df_count"))
        .where(col("df_count") > 100).select(col("shingle"))
      val postings = postingsAll.join(hot, Seq("shingle"), "left_anti")
      val p = postings.withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc"))))
        .localCheckpoint(false)
      val tSz = timed(noop(p))
      val a = p.select(col("shingle"), col("doc").as("doc_a"), col("sz").as("sz_a"))
      val b = p.select(col("shingle"), col("doc").as("doc_b"), col("sz").as("sz_b"))
      val joined = a.hint("merge").join(b.hint("merge"), Seq("shingle"))
        .where(col("doc_a") < col("doc_b") &&
          least(col("sz_a"), col("sz_b")).cast("double") >=
            lit(0.1) * greatest(col("sz_a"), col("sz_b")).cast("double"))
        .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
        .agg(count(lit(1)).as("c"))
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") /
            (col("sz_a") + col("sz_b") - col("c")).cast("double")).as("jaccard"))
        .where(col("jaccard") >= 0.1)
      val tJoin = timed(noop(joined))
      // the same pair join with a broadcast build side instead of merge
      val joinedB = a.join(broadcast(b), Seq("shingle"))
        .where(col("doc_a") < col("doc_b") &&
          least(col("sz_a"), col("sz_b")).cast("double") >=
            lit(0.1) * greatest(col("sz_a"), col("sz_b")).cast("double"))
        .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
        .agg(count(lit(1)).as("c"))
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") /
            (col("sz_a") + col("sz_b") - col("c")).cast("double")).as("jaccard"))
        .where(col("jaccard") >= 0.1)
      val tJoinB = timed(noop(joinedB))
      val nPost = p.count()
      cleanup()
      println(f"[probe] rep $rep postings=$tPost%.3f szwindow=$tSz%.3f " +
        f"pairjoin(merge)=$tJoin%.3f pairjoin(bcast)=$tJoinB%.3f rows=$nPost")
    }
    spark.stop()
  }
}
