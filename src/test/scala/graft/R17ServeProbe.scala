package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 decomposition of the staged-BM25 serve (the t37/t42/s14/v20
  * lexical leg): where do ~2.5s go in a query-vocabulary-sized scoring
  * job? Times the serve's phases cumulatively — vocab collect, scored
  * aggregate without the rank window, full top-k, materialized top-k —
  * so each increment isolates one plan feature.
  * Run: sbt -batch "Test/runMain graft.R17ServeProbe /root/testdata/sf0.1"
  */
object R17ServeProbe {

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

    val dir = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    graft.operators.Retrieval.stageBm25Index(docs, "doc_id", "text").write(dir)
    val queries = docs.where(col("doc_id") % 100 === 0)
    val index = graft.operators.Retrieval.StagedBm25Index.read(spark, dir)

    def serve(): org.apache.spark.sql.DataFrame =
      graft.operators.Retrieval.bm25TopKStaged(
        index, queries, "doc_id", "text", k = 10)

    noop(serve()); cleanup() // warm
    for (rep <- 1 to 3) {
      // construction runs the serve's eager driver jobs (vocab collect,
      // pruned-df collect, stats head); execution is the scoring job
      var df: org.apache.spark.sql.DataFrame = null
      val cons = timed { df = serve() }
      val exec = timed(noop(df))
      // and the two sub-plans of the scoring job, isolated: the scored
      // aggregate without the rank window, then with it
      val parts = df.queryExecution // keep analyzer warm
      val scoredOnly = timed(noop(df.sparkSession.emptyDataFrame))
      cleanup()
      // same serve with a data-sized shuffle width: is the 2s exec
      // per-task scheduling tax at 32 partitions, or real work?
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      var df4: org.apache.spark.sql.DataFrame = null
      val cons4 = timed { df4 = serve() }
      val exec4 = timed(noop(df4))
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      cleanup()
      println(f"[probe] rep $rep construct=$cons%.3f exec=$exec%.3f " +
        f"emptyjob=$scoredOnly%.3f construct4=$cons4%.3f exec4=$exec4%.3f")
    }
    spark.stop()
  }
}
