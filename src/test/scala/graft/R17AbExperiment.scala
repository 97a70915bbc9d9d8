package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.streaming.Streams

/** Round-17 same-session interleaved A/B experiments. Same-session
  * interleaving is the only reliable harness on this host: hypervisor
  * steal swings cross-run totals 1.5-2x within minutes, so every A/B
  * runs its variant pairs back-to-back x3 and reports per-rep seconds.
  *
  *   E1  bm25 docLen: tf re-aggregation (pre-r17) vs map-only scan
  *   E2  dedup clusters: distributed GraphX CC vs driver-local union-find
  *   E3  s01-style complete-mode drain: no-data micro-batch on vs off
  *   E4  s09-style drain: checkpoint scratch on /tmp (disk) vs /dev/shm
  *
  * Run: sbt -batch "Test/runMain graft.R17AbExperiment /root/testdata/sf0.1"
  */
object R17AbExperiment {

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
    import spark.implicits._

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def fmt(ts: Seq[(Double, Double)]): String =
      ts.map { case (a, b) => f"(a=$a%.3f, b=$b%.3f)" }.mkString(" ")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.streams.resetTerminated()
    }

    val docs = graft.queries.Tables.t(spark, sf, "documents")

    // E1: docLen derivation
    def docLenOld(): Unit = noop(
      docs.select(col("doc_id").as("corpus_id"),
          explode(tokens(coalesce(col("text"), lit("")))).as("term"))
        .groupBy(col("corpus_id"), col("term")).agg(count(lit(1)).as("tf"))
        .groupBy(col("corpus_id")).agg(sum(col("tf")).as("dl")))
    def docLenNew(): Unit = noop(
      docs.select(col("doc_id").as("corpus_id"),
        size(tokens(coalesce(col("text"), lit("")))).cast("long").as("dl")))
    docLenOld(); docLenNew() // warm
    val e1 = (1 to 3).map(_ => (timed(docLenOld()), timed(docLenNew())))
    println(s"[exp] E1 docLen old(a) vs new(b): ${fmt(e1)}")
    // commit the internal sub-plans bm25TopK's result checkpoint hides
    // from the query-level dump: the docLen branch before (explode + two
    // aggregate exchanges) vs after (map-only scan, zero exchanges)
    def dumpPlan(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/root/repo/plans/r17/$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    dumpPlan(docs.select(col("doc_id").as("corpus_id"),
        explode(tokens(coalesce(col("text"), lit("")))).as("term"))
      .groupBy(col("corpus_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("corpus_id")).agg(sum(col("tf")).as("dl")),
      "t36_bm25_docLen_subplan_before")
    dumpPlan(docs.select(col("doc_id").as("corpus_id"),
        size(tokens(coalesce(col("text"), lit("")))).cast("long").as("dl")),
      "t36_bm25_docLen_subplan_after")

    // E2: clusters
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, shingleN = 3, maxDf = 100,
      inputPartitions = spark.sparkContext.defaultParallelism)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    def ccOld(): Unit = noop(graft.dedup.Dedup.distributedClusters(
      pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)]))
    def ccNew(): Unit = noop(graft.dedup.Dedup.clusters(pairs))
    ccOld(); ccNew()
    val e2 = (1 to 3).map(_ => (timed(ccOld()), timed(ccNew())))
    println(s"[exp] E2 clusters graphx(a) vs local(b): ${fmt(e2)}")
    cleanup()

    // E3: no-data micro-batch for a complete-mode windowed drain
    def drainS01(noData: Boolean): Long = {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noData.toString)
      try {
        val out = Streams.runToMemory(spark,
          Streams.tumblingAgg(Streams.eventsStream(spark, sf)),
          s"e3_${noData}_${System.nanoTime()}", mode = "complete",
          statePartitions = Some(8))
        out.count()
      } finally spark.conf
        .set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    }
    println(s"[exp] E3 row parity: on=${drainS01(true)} off=${drainS01(false)}")
    val e3 = (1 to 3).map { _ =>
      val a = timed(drainS01(true)); val b = timed(drainS01(false))
      cleanup(); (a, b)
    }
    println(s"[exp] E3 s01 noData on(a) vs off(b): ${fmt(e3)}")

    // E4: checkpoint scratch medium for an append drain with state
    def drainS09(root: String): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(root), "graft_e4_")
      try {
        val q = Streams.hourlyActiveUsers(Streams.eventsStream(spark, sf))
          .writeStream.format("memory")
          .queryName(s"e4_${System.nanoTime()}")
          .option("checkpointLocation", s"$dir/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally Streams.deleteTree(dir)
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    drainS09("/tmp"); cleanup()
    val e4 = (1 to 3).map { _ =>
      val a = timed(drainS09("/tmp")); cleanup()
      val b = timed(drainS09("/dev/shm")); cleanup()
      (a, b)
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    println(s"[exp] E4 s09 ckpt /tmp(a) vs /dev/shm(b): ${fmt(e4)}")

    println("[exp] done")
    spark.stop()
  }
}
