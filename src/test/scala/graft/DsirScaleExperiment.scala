package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Dsir

/** Measured scale steps for the round-11 additions (SURVEY §8 — the
  * TextScaleExperiment pattern):
  *
  *   (a) t34 DSIR selection at 50k → 500k → 5M docs: the claim is
  *       LINEARITY — fit is two count-only bucket aggregations, scoring is
  *       a shuffle-free scan, and GlobalOrder's rank is two parallel
  *       full-data exchanges of 4 numeric columns — nothing in the
  *       pipeline is super-linear, and the selected set is asserted to be
  *       exactly k at every point (a broken rank would miscount).
  *   (b) t35 incremental CDC dedup with a FIXED 5k-doc batch against
  *       staged corpora of 50k → 500k docs: the claim is
  *       BATCH-PROPORTIONALITY — the store is reached only via the ranged
  *       broadcast semi join, so a 10× corpus should move the nightly cost
  *       far less than 10× (the v13/t28 shape). Store staging is timed
  *       separately (ingest-time work, corpus-proportional by design).
  *       Planted recall asserted: batch docs d ≡ 3 (mod 10) embed a
  *       corpus span behind a shifted preamble and must flag.
  *
  * Run: sbt -batch "Test/runMain graft.DsirScaleExperiment [50000,500000]"
  * Prints `[scale] <label>: <sec>` lines; numbers recorded in SURVEY §8.
  * Not a ScalaTest suite — wall-clock assertions flake; the grading is
  * the recorded ratio.
  */
object DsirScaleExperiment {

  /** Deterministic corpus, TextScaleExperiment's generator verbatim (60
    * words, ~10% Zipf-head stopwords, 50k-word tail): docs d ≡ 0 (mod 10)
    * lean on a separate "target-flavored" head vocabulary so DSIR has a
    * real signal to rank on.
    */
  private def syn(spark: SparkSession, n: Long): DataFrame = {
    val targetish = col("id") % 10 === 0
    val words = transform(sequence(lit(0), lit(59)), j => {
      val tail = concat(lit("w"), pmod(hash(col("id"), j), lit(50000)).cast("string"))
      val zipf = pmod(hash(col("id"), j, lit(1)), lit(10)) === 0
      val head = when(targetish, concat(lit("t"), pmod(hash(j), lit(20)).cast("string")))
        .otherwise(concat(lit("s"), pmod(hash(j), lit(20)).cast("string")))
      when(zipf, head).otherwise(tail)
    })
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words).as("text"))
  }

  /** CDC fixture: corpus docs are unique 60-token texts; every corpus doc
    * d ≡ 0 (mod 1000) carries a shared 40-token span. Batch docs (ids
    * above the corpus) with d ≡ 3 (mod 10) embed that same span behind a
    * 5-token doc-specific preamble — the planted chunk dup.
    */
  private def cdcSyn(spark: SparkSession, n: Long, span: String,
      planted: Boolean, flavor: String): DataFrame = {
    // `flavor` keeps corpus and batch base tokens DISJOINT: both sides
    // generate from range ids, and identical non-carrier texts would turn
    // every batch doc into a whole-doc duplicate of a corpus doc
    val base = transform(sequence(lit(0), lit(59)), j =>
      concat(lit(flavor), pmod(hash(col("id"), j), lit(1000000)).cast("string"),
        lit("x"), col("id").cast("string"), lit("_"), j.cast("string")))
    val carrier =
      if (planted) col("id") % 10 === 3
      else col("id") % 1000 === 0
    val pre = transform(sequence(lit(0), lit(4)), j =>
      concat(lit("p"), col("id").cast("string"), lit("_"), j.cast("string")))
    spark.range(n).select(col("id").as("doc_id"),
      when(carrier, concat(concat_ws(" ", pre), lit(" " + span)))
        .otherwise(concat_ws(" ", base)).as("text"))
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

    // ---------------- (a) t34 DSIR linearity
    sizes.foreach { n =>
      val docs = syn(spark, n).repartition(32).localCheckpoint(true)
      val target = docs.where(col("doc_id") % 10 === 0).localCheckpoint(true)
      val k = n / 5
      println(s"[scale] --- dsir n=$n k=$k ---")
      val out = time(s"dsir_select n=$n") {
        val v = Dsir.select(target, docs, "doc_id", "text", k = k)
          .localCheckpoint(true)
        v.count() // force end-to-end
        v
      }
      val selected = out.where(col("selected")).count()
      require(selected == k, s"selected $selected != k=$k — rank broke at n=$n")
      cleanupBlocks(spark)
    }

    // ---------------- (b) t35 incremental CDC: fixed batch, growing corpus
    val span = (0 until 40).map(i => s"sp${i % 31}q$i").mkString(" ")
    val batchN = 5000L
    sizes.foreach { n =>
      // corpus NOT checkpointed: staging consumes it exactly once, and at
      // 5M docs the ~2 GB of pinned text blocks starved the staging
      // distinct's per-task hash maps (AGGREGATE_OUT_OF_MEMORY on the 8g
      // test heap) — generation is cheap, heap headroom is not
      val corpus = cdcSyn(spark, n, span, planted = false, flavor = "u")
        .repartition(32)
      val batch = cdcSyn(spark, batchN, span, planted = true, flavor = "b")
        .withColumn("doc_id", col("doc_id") + lit(n))
        .repartition(32).localCheckpoint(true)
      println(s"[scale] --- cdc corpus=$n batch=$batchN ---")
      val dir = java.nio.file.Files.createTempDirectory("graft_cdc_scale_").toString
      try {
        time(s"cdc_stage corpus=$n (ingest-time)") {
          Dedup.stageCdcChunks(corpus, "doc_id", "text", avgChunkTokens = 20)
            .write(dir)
        }
        val store = Dedup.StagedChunkStore.read(spark, dir)
        val verdicts = time(s"cdc_incremental corpus=$n batch=$batchN") {
          val v = Dedup.cdcDedupIncremental(store, batch, "doc_id", "text")
            .localCheckpoint(true)
          v.count()
          v
        }
        val flagged = verdicts
          .where(col("doc_id") % 10 === 3 && col("n_dup_chunks") > 0).count()
        val expect = batch.where(col("doc_id") % 10 === 3).count()
        require(flagged == expect,
          s"planted recall $flagged/$expect at corpus=$n — timing meaningless")
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
