package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Ann

/** The v13 batch≪corpus claim, measured (SURVEY §8, round-8 task 8): a
  * FIXED 250-doc batch deduplicated incrementally against corpora of
  * 5k / 50k / 500k vectors (dim 64). If the incremental path really costs
  * ∝ batch (+ the pruned partition scan), the timings stay ~flat while
  * the corpus grows 100× — the property that makes nightly ingest viable
  * at 100 TB, where re-running full-corpus v12 per batch would be
  * corpus-sized work every night.
  *
  * The corpus layout (IVF-partitioned parquet + persisted centroids) is
  * STAGED untimed, exactly like a production ingest layout: staging is
  * paid once at corpus build, not per batch.
  *
  * Run: sbt -batch "Test/runMain graft.V13ScaleExperiment [5000,50000,500000]"
  * Prints `[scale] <label>: <sec>` lines; numbers recorded in SURVEY §8.
  * Not a ScalaTest suite — wall-clock assertions this coarse would flake;
  * the grading is the recorded ratio.
  */
object V13ScaleExperiment {

  private def syn(spark: SparkSession, from: Long, n: Long, dim: Int) =
    spark.range(from, from + n).select(col("id").as("vec_id"),
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
      .getOrElse(Seq(5000L, 50000L, 500000L))
    val batchN = 250L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "target/spark-tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    sizes.foreach { n =>
      val k = Ann.autoCells(n)
      println(s"[scale] --- corpus n=$n autoCells=$k batch=$batchN ---")
      val corpus = syn(spark, 0L, n, 64).repartition(32).localCheckpoint(true)
      // batch ids are newer than the whole corpus — the normal ingest shape
      val batch = syn(spark, n, batchN, 64).localCheckpoint(true)
      val dir = java.nio.file.Files.createTempDirectory("graft_v13_scale_").toString
      // staging = ingest-time work, untimed by the batch metric but printed
      // for the record (it scales with the CORPUS, once)
      time(s"stage_layout n=$n k=$k") {
        Ann.withIvfQuantizedLayout(corpus, "vec_id", "embedding", nCentroids = k)
          .write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/layout")
        Ann.seedCentroids(corpus, "vec_id", "embedding", k)
          .write.mode("overwrite").parquet(s"$dir/centroids")
      }
      val stored = spark.read.parquet(s"$dir/layout")
      val centroids = spark.read.parquet(s"$dir/centroids")
      // warm once (classload/codegen), then time 3 reps; report each
      noop(Dedup.semanticDedupIncremental(stored, centroids, batch,
        "vec_id", "embedding", threshold = 0.97, nCells = k))
      (1 to 3).foreach { rep =>
        time(s"v13_batch${batchN}_corpus$n rep$rep")(noop(
          Dedup.semanticDedupIncremental(stored, centroids, batch,
            "vec_id", "embedding", threshold = 0.97, nCells = k)))
      }
      corpus.unpersist(); batch.unpersist()
    }
    spark.stop()
  }
}
