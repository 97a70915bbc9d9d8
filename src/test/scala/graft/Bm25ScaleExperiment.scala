package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Measured scale steps for the round-11 BM25 retrieval family (SURVEY §8
  * — the TextScaleExperiment pattern):
  *
  *   (a) t36 inline vs t37 staged SERVING at each corpus size, fixed
  *       50-query set: the inline operator re-tokenizes and re-aggregates
  *       the corpus per call, so it grows with the corpus; the staged
  *       serving path reaches the store only through the term-range +
  *       broadcast-semi prune, so its cost tracks the query terms'
  *       POSTING LISTS. Honest caveat measured rather than claimed away:
  *       with a Zipf head, a query's stopword-ish terms have
  *       corpus-proportional posting lists, so staged serving is
  *       SUBLINEAR, not flat — the recorded ratio is the claim (a real
  *       engine drops stopwords or WAND-prunes to get flatter; our
  *       serving stays exact).
  *   (b) STAGING (ingest) at each size — corpus-proportional by design,
  *       timed separately like cdc_stage.
  *   (c) FOLDING a fixed 5k-doc batch into each staged corpus — the
  *       append-only design makes this corpus-FLAT (nothing reads the
  *       base index; the meta check is one row), the property that makes
  *       continuous ingest (t38/s14) viable at 100 TB.
  *
  * Run: sbt -batch "Test/runMain graft.Bm25ScaleExperiment [50000,500000]"
  * Prints `[scale] <label>: <sec>` lines; numbers recorded in SURVEY §8.
  * Not a ScalaTest suite — wall-clock assertions flake; the grading is
  * the recorded ratio.
  */
object Bm25ScaleExperiment {

  /** Deterministic Zipf-ish corpus (TextScaleExperiment's generator shape):
    * 60 words/doc, ~10% head stopwords from a 20-word vocabulary, 50k-word
    * tail. Head terms give every query corpus-sized posting lists (the
    * hard case for serving); tail terms give it selective ones.
    */
  private def syn(spark: SparkSession, n: Long): DataFrame = {
    val words = transform(sequence(lit(0), lit(59)), j => {
      val tail = concat(lit("w"), pmod(hash(col("id"), j), lit(50000)).cast("string"))
      val zipf = pmod(hash(col("id"), j, lit(1)), lit(10)) === 0
      val head = concat(lit("s"), pmod(hash(j), lit(20)).cast("string"))
      when(zipf, head).otherwise(tail)
    })
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words).as("text"))
  }

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(f"[scale] $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  private def cleanupBlocks(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.sharedState.cacheManager.clearCache()
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
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "target/spark-tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val batchN = 5000L
    sizes.foreach { n =>
      // corpus NOT checkpointed (the DsirScaleExperiment lesson: pinned
      // text blocks starve large aggregations; generation is cheap)
      val corpus = syn(spark, n).repartition(32)
      val queries = syn(spark, n).where(col("doc_id") < 50)
        .repartition(4).localCheckpoint(true)
      println(s"[scale] --- bm25 corpus=$n queries=50 k=$k ---")

      val inline = time(s"bm25_inline corpus=$n (t36 serving)") {
        val v = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", k)
          .localCheckpoint(true)
        v.count()
        v
      }
      // collect to the driver (50·k rows): no cleanupBlocks until the END
      // of the size iteration — it unpersists every RDD in the JVM,
      // including the localCheckpoint blocks of `queries` (still needed by
      // the staged phase), which die unrecoverably with
      // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (the Bench.cleanupBlocks
      // invariant, learned here the hard way)
      val inlineRows = inline.collect().map(_.toSeq).toSet
      require(inlineRows.size == 50 * k,
        s"inline returned ${inlineRows.size} rows, want ${50 * k} — at 60 " +
          "shared-head-term words per doc every query must fill its top-k")

      val dir = java.nio.file.Files.createTempDirectory("graft_bm25_scale_").toString
      try {
        time(s"bm25_stage corpus=$n (ingest-time)") {
          Retrieval.stageBm25Index(corpus, "doc_id", "text").write(dir)
        }
        val staged = time(s"bm25_staged corpus=$n (t37 serving)") {
          val v = Retrieval.bm25TopKStaged(
            Retrieval.StagedBm25Index.read(spark, dir), queries,
            "doc_id", "text", k).localCheckpoint(true)
          v.count()
          v
        }
        // staged serving must agree with inline exactly (the parity law,
        // here re-checked at scale so the timings compare equal work)
        require(staged.collect().map(_.toSeq).toSet == inlineRows,
          s"staged/inline divergence at corpus=$n — timings meaningless")
        // the df-cap scale knob: 0.01 excludes the 20 Zipf-head terms
        // (df ≈ 0.26n ≫ n/100) and keeps the tail (df ≈ 54·n/50000 ≤
        // n/100), so serving cost is bounded by SELECTIVE posting lists —
        // the flat line the uncapped (exact) path can't have
        val capped = time(s"bm25_staged_dfcap corpus=$n (t37 serving, cap 0.01)") {
          val v = Retrieval.bm25TopKStaged(
            Retrieval.StagedBm25Index.read(spark, dir), queries,
            "doc_id", "text", k, maxDfFraction = 0.01).localCheckpoint(true)
          v.count()
          v
        }
        require(capped.count() == 50L * k,
          s"capped serving returned ${capped.count()} rows, want ${50 * k} — " +
            "tail-term overlap must still fill every query's top-k")
        val batch = syn(spark, batchN)
          .withColumn("doc_id", col("doc_id") + lit(n))
          .repartition(8).localCheckpoint(true)
        time(s"bm25_fold corpus=$n batch=$batchN (t38 ingest tick)") {
          Retrieval.foldIntoBm25Index(spark, dir, batch, "doc_id", "text",
            gen = 1L)
        }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
          .asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      cleanupBlocks(spark)
    }
    spark.stop()
  }
}
