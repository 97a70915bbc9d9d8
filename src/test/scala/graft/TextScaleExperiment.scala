package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The measured 10× scale step for TEXT near-dup dedup (SURVEY §8 — the
  * cells experiment's pattern applied to the t07/t08 kernels): synthetic
  * deterministic corpora at 50k and 500k documents (60 words each, ~10%
  * Zipf-head stopword mass so hot shingles exist and the df-cap engages),
  * with 1% planted near-dup pairs (docs `i ≡ 1 (mod 100)` copy doc i-1
  * with two fixed word positions perturbed → 3-gram Jaccard ≈ 0.8),
  * timing
  *
  *   (a) `ngramJaccardPairs` — t07's exact inverted-index kernel at the
  *       production cap (maxDf = 100), and
  *   (b) `minhashPairs` — t08's one-pass signature + banded LSH join,
  *
  * each also asserting planted-pair RECALL (an unrecalled plant means the
  * kernel broke at scale, making its timing meaningless).
  *
  * Run: sbt -batch "Test/runMain graft.TextScaleExperiment [50000,500000]"
  * Prints `[scale] <label>: <sec>` lines; numbers recorded in SURVEY §8.
  * Not a ScalaTest suite — wall-clock assertions flake; the grading is
  * the recorded ratio.
  */
object TextScaleExperiment {

  /** Deterministic corpus: doc d = 60 words; word j is a Zipf-head
    * stopword for ~10% of (d, j) draws, else one of 50k tail words.
    * Docs d ≡ 1 (mod 100) instead re-generate doc d-1's words, with
    * positions 17 and 43 swapped for doc-d-specific tokens — the planted
    * near-dup: 6 of ~58 distinct 3-gram shingles differ, Jaccard ≈ 0.8.
    */
  private def syn(spark: SparkSession, n: Long): DataFrame = {
    val isDup = pmod(col("id"), lit(100)) === 1
    val base = when(isDup, col("id") - 1).otherwise(col("id"))
    val words = transform(sequence(lit(0), lit(59)), j => {
      val tail = concat(lit("w"), pmod(hash(base, j), lit(50000)).cast("string"))
      val zipf = pmod(hash(base, j, lit(1)), lit(10)) === 0
      val common = when(zipf,
        concat(lit("s"), pmod(hash(j), lit(20)).cast("string"))).otherwise(tail)
      when(isDup && (j === 17 || j === 43),
        concat(lit("p"), col("id").cast("string"), lit("_"), j.cast("string")))
        .otherwise(common)
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

    sizes.foreach { n =>
      val docs = syn(spark, n).repartition(32).localCheckpoint(true)
      val planted = n / 100 // pairs (i-1, i) for i ≡ 1 (mod 100)
      println(s"[scale] --- n=$n plantedPairs=$planted ---")
      // Each operator gets a clean block store (Bench.cleanupBlocks's
      // rationale: operator-internal checkpoints — t07's ~2 GB postings
      // pin at n=500k — otherwise stay cached into the NEXT operator's
      // run, and the accumulated heap pressure OOM'd t33's verification
      // stage in a way no single operator reproduces). The shared corpus
      // checkpoint must SURVIVE the sweep (truncated lineage is
      // unrecoverable), so only blocks pinned after it are dropped.
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      def cleanupExceptCorpus(): Unit =
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !keep.contains(id) }
          .values.foreach(_.unpersist(blocking = true))

      val jac = time(s"t07_ngram_jaccard n=$n")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            threshold = 0.5, shingleN = 3, maxDf = 100)
          .localCheckpoint(true))
      val jacPlanted = jac
        .where(col("doc_b") - col("doc_a") === 1 && pmod(col("doc_b"), lit(100)) === 1)
        .count()
      println(s"[scale] t07 recall: $jacPlanted/$planted planted, ${jac.count()} total pairs")
      require(jacPlanted == planted,
        s"t07 lost planted pairs at n=$n: $jacPlanted/$planted")
      cleanupExceptCorpus()

      // t33: EXACT uncapped Jaccard via prefix filtering — must find every
      // planted pair (no LSH slack: the prefix principle is lossless)
      val pp = time(s"t33_ppjoin n=$n")(
        Dedup.ppjoinPairs(docs, "doc_id", "text", threshold = 0.5, shingleN = 3)
          .localCheckpoint(true))
      val ppPlanted = pp
        .where(col("doc_b") - col("doc_a") === 1 && pmod(col("doc_b"), lit(100)) === 1)
        .count()
      println(s"[scale] t33 recall: $ppPlanted/$planted planted, ${pp.count()} total pairs")
      require(ppPlanted == planted,
        s"t33 lost planted pairs at n=$n: $ppPlanted/$planted — prefix principle violated")
      cleanupExceptCorpus()

      val mh = time(s"t08_minhash_lsh n=$n")(
        Dedup.minhashPairs(docs, "doc_id", "text",
            threshold = 0.5, k = 64, bands = 16, shingleN = 3)
          .localCheckpoint(true))
      val mhPlanted = mh
        .where(col("doc_b") - col("doc_a") === 1 && pmod(col("doc_b"), lit(100)) === 1)
        .count()
      println(s"[scale] t08 recall: $mhPlanted/$planted planted, ${mh.count()} total pairs")
      // LSH is probabilistic: 16 bands of 4 slots at J≈0.8 collide with
      // p ≈ 1-(1-0.8⁴)¹⁶ ≈ 0.9996 — demand ≥ 99% of plants
      require(mhPlanted >= planted * 99 / 100,
        s"t08 recall collapsed at n=$n: $mhPlanted/$planted")
      cleanupExceptCorpus()
    }
    spark.stop()
  }
}
