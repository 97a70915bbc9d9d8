package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Ann

/** The measured 10× scale step for auto-cell semantic dedup (SURVEY §8 —
  * the planes=8 LSH experiment repeated for cells): synthetic
  * deterministic corpora at 50k and 500k vectors (dim 64), timing
  *
  *   (a) end-to-end `semanticDedup` under auto cells (the production
  *       default: k = n/256, hierarchical assignment above 64 cells),
  *   (b) the assignment pass alone, flat vs hierarchical, at each scale —
  *       isolating the O(n·k) vs O(n·log) difference the hierarchy buys.
  *
  * Run: sbt -batch "Test/runMain graft.CellScaleExperiment [50000,500000]"
  * Prints `[scale] <label>: <sec>` lines; numbers are recorded in
  * SURVEY.md §8. Not a ScalaTest suite — wall-clock assertions this
  * coarse would flake; the grading is the recorded ratio.
  */
object CellScaleExperiment {

  private def syn(spark: SparkSession, n: Long, dim: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map(d =>
        (pmod(hash(col("id"), lit(d)), lit(997)) + lit(13)).cast("double")): _*)
        .as("embedding"))

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(f"[scale] $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(50000L, 500000L))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // long runs lose /tmp shuffle files to the sandbox's tmp reaper —
      // keep block-manager state under the build dir instead
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "target/spark-tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      // materialize the input so generation cost never pollutes a timing
      val df = syn(spark, n, 64).repartition(32).localCheckpoint(true)
      val k = Ann.autoCells(n)
      println(s"[scale] --- n=$n autoCells=$k ---")
      def noop(d: org.apache.spark.sql.DataFrame): Unit =
        d.write.format("noop").mode("overwrite").save()
      val cent = Ann.seedCentroids(df, "vec_id", "embedding", k)
        .localCheckpoint(true)
      time(s"assign_hier n=$n k=$k")(noop(
        Ann.assignCellsHierarchical(cent, df, "vec_id", "embedding",
          "corpus", keep = 1, nCells = k)))
      // flat is α·n·k: past 500k it is hours (the cliff this experiment
      // documents) — skip rather than burn the measurement budget
      if (n <= 500000L)
        time(s"assign_flat n=$n k=$k")(noop(
          Ann.assignCellsFlat(cent, df, "vec_id", "embedding",
            "corpus", keep = 1)))
      time(s"semanticDedup_auto n=$n")(noop(
        Dedup.semanticDedup(df, "vec_id", "embedding", threshold = 0.97)))
      df.unpersist()
      cent.unpersist()
    }
    spark.stop()
  }
}
