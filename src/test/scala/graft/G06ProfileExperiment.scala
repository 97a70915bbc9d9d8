package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for g06's long-keyed PageRank at a given SF dir.
  * Run: sbt -batch "Test/runMain graft.G06ProfileExperiment /tmp/sf1"
  */
object G06ProfileExperiment {

  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    for (rep <- 0 to 1) {
      val verts = time(s"[$rep] verts plan+checkpoint") {
        t("customer").select((col("c_custkey") * 4).as("vid"))
          .unionByName(t("orders").select((col("o_orderkey") * 4 + 1).as("vid")))
          .unionByName(t("part").select((col("p_partkey") * 4 + 2).as("vid")))
          .select(col("vid").cast("long").as("vid")).localCheckpoint(true)
      }
      val edges = time(s"[$rep] edges plan+checkpoint") {
        t("orders").select(
            (col("o_custkey") * 4).as("src"), (col("o_orderkey") * 4 + 1).as("dst"))
          .unionByName(t("lineitem").select(
            (col("l_orderkey") * 4 + 1).as("src"), (col("l_partkey") * 4 + 2).as("dst")))
          .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
          .localCheckpoint(true)
      }
      val nv = time(s"[$rep] counts")(verts.count() + edges.count())
      val vArr = time(s"[$rep] verts collect")(verts.as[Long].collect())
      val eArr = time(s"[$rep] edges collect")(edges.as[(Long, Long)].collect())
      println(s"[prof] [$rep] nVerts=${vArr.length} nEdges=${eArr.length} ($nv)")
      time(s"[$rep] build index maps + arrays") {
        val n = vArr.length
        val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
        var i = 0
        while (i < n) { idx.put(vArr(i), i); i += 1 }
        val m = eArr.length
        val src = new Array[Int](m); val dst = new Array[Int](m)
        i = 0
        while (i < m) {
          src(i) = idx.get(eArr(i)._1).intValue(); dst(i) = idx.get(eArr(i)._2).intValue(); i += 1
        }
        (src, dst)
      }
      val ranks = time(s"[$rep] full local pagerank call") {
        graft.graph.GraphAlgos.pageRankFixedPointLong(
          verts.toDF("vid"), edges, iters = 25)
      }
      time(s"[$rep] downstream filter+sort+limit+noop") {
        ranks.where(col("vid") % 4 === 2)
          .select(concat(lit("p:"), floor(col("vid") / 4).cast("long")).as("part_id"),
            col("rank_nano"))
          .orderBy(col("rank_nano").desc, col("part_id")).limit(20)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
