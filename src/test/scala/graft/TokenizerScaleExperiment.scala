package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, QualityClassifier}

/** The measured 10× scale step for the round-12 trained-tokenizer pair
  * (SURVEY §8): t39's claim is that BPE SEGMENTATION is
  * vocabulary-proportional (the nMerges interpreted-HOF folds run over
  * DISTINCT words, never corpus rows), t40's that the NB quality model is
  * a FIXED-SIZE broadcast table whatever the corpus.
  *
  * The corpus makes the cross-scale laws EXACT instead of statistical:
  * doc d's text (and t40 label) is a pure function of `d mod 50k`, so the
  * n=500k corpus is ten id-shifted replicas of the n=50k one — every word
  * count and every (bucket, class) count scales by exactly 10, the
  * vocabulary is IDENTICAL at both scales, and therefore:
  *
  *   - t39: the trained merge list must be EQUAL at both scales (pair
  *     stats are 10× throughout — every argmax unchanged), the segmented
  *     vocabulary table must be row-for-row equal, and the segment phase's
  *     wall-clock must be ~flat while the corpus phase grows ~10×.
  *   - t40: the model must have ≤ `buckets` weight rows at BOTH scales
  *     (feature hashing, no vocabulary growth), and a fixed probe set
  *     scored under the 50k-trained and 500k-trained models must produce
  *     IDENTICAL keep verdicts (llr shifts only by the Laplace terms,
  *     O(1/count) — the planted ±1.6-nat/token class margins dwarf it).
  *
  * Run: sbt -batch "Test/runMain graft.TokenizerScaleExperiment [50000,500000]"
  * Prints `[scale] <label>: <sec>` lines; numbers recorded in SURVEY §8.
  * Not a ScalaTest suite — wall-clock assertions flake; the grading is
  * the recorded ratio plus the hard equality requires.
  */
object TokenizerScaleExperiment {

  private val Base = 50000L // the replication period — one "generation"
  private val TailVocab = 20000
  private val Buckets = 4096

  /** word j of base-doc r: 30% a class-signal word (16 per class,
    * triangular frequencies so the top-of-vocabulary ranks are strict),
    * else a shared tail word. Positives (r even) draw signal words from
    * the `good` set, negatives from `bad` — ±1 llr sign per signal token,
    * a margin the cross-scale Laplace drift cannot flip.
    */
  private def syn(spark: SparkSession, n: Long): DataFrame = {
    require(n % Base == 0, s"n must be a multiple of $Base, got $n")
    val r = pmod(col("id"), lit(Base))
    val pos = pmod(r, lit(2)) === 0
    val words = transform(sequence(lit(0), lit(59)), j => {
      val u = pmod(hash(r, j), lit(1000))
      // triangular head pick: k ∈ [0,16) with weight 16-k, so the head
      // frequency ranks are strict and scale-stable (cum. thresholds
      // 16, 31, 45, ... over a uniform draw in [0, 136))
      val draw = pmod(hash(r, j, lit(3)), lit(136))
      val cuts = (1 to 16).map(m => m * 16 - m * (m - 1) / 2) // 16,31,...,136
      val headK = cuts.init.zipWithIndex.foldRight(lit(15): org.apache.spark.sql.Column) {
        case ((cut, idx), acc) => when(draw < cut, lit(idx)).otherwise(acc)
      }
      val signal = concat(when(pos, lit("good")).otherwise(lit("bad")),
        headK.cast("string"))
      val tail = concat(lit("w"),
        pmod(hash(r, j, lit(7)), lit(TailVocab)).cast("string"))
      when(u < 300, signal).otherwise(tail)
    })
    spark.range(n).select(col("id").as("doc_id"), pos.as("label"),
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

    // the fixed probe every scale's model scores: one base generation
    val probe = syn(spark, Base).localCheckpoint(true)

    var prevMerges: Option[Seq[(String, String)]] = None
    var prevSegs: Option[DataFrame] = None
    var prevVerdicts: Option[DataFrame] = None

    sizes.foreach { n =>
      val docs = syn(spark, n).repartition(32).localCheckpoint(true)
      println(s"[scale] --- n=$n ---")

      // ---------------- t39: train + vocabulary segmentation + corpus agg
      import graft.functions.TextFunctions.tokens
      val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      val wcnt = time(s"t39_word_counts n=$n")(
        toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true))
      val vocab = wcnt.count()
      val top = wcnt.orderBy(col("cnt").desc, col("word")).limit(128)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val merges = time(s"t39_train n=$n")(Bpe.trainMerges(top, 10))
      // the vocabulary-proportional phase: nMerges folds over DISTINCT
      // words — must be ~FLAT across the 10× corpus step (same vocab)
      val segs = time(s"t39_segment_vocab n=$n vocab=$vocab")(
        Bpe.segment(wcnt.select(col("word")), "word", merges)
          .select(col("word"), size(col("syms")).as("n_bpe_word"))
          .localCheckpoint(true))
      // the corpus-proportional phase: broadcast word map onto the stream
      val aggRows = time(s"t39_corpus_agg n=$n")(
        toks.join(broadcast(segs), Seq("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("n_bpe_word")).as("n_bpe"))
          .count())
      require(aggRows == n, s"t39 lost documents at n=$n")

      prevMerges.foreach { m =>
        require(m == merges,
          s"BPE merges differ across scales at n=$n:\n  prev=$m\n  cur=$merges")
        println(s"[scale] t39 LAW: merge list identical across scales (${m.size} merges)")
      }
      prevSegs.foreach { p =>
        val diff = p.exceptAll(segs).count() + segs.exceptAll(p).count()
        require(diff == 0, s"segmented vocabulary differs at n=$n: $diff rows")
        println(s"[scale] t39 LAW: segmented vocabulary identical across scales ($vocab words)")
      }
      prevMerges = Some(merges)
      prevSegs = Some(segs)

      // ---------------- t40: fixed-size model + cross-scale verdicts
      val model = time(s"t40_train n=$n")(
        QualityClassifier.train(docs, "text", "label", Buckets))
      val pinnedW = model.weights.localCheckpoint(true)
      val wrows = pinnedW.count()
      require(wrows <= Buckets,
        s"t40 model grew past its bucket bound at n=$n: $wrows > $Buckets")
      println(s"[scale] t40 LAW: model is $wrows rows (bound $Buckets) at n=$n")
      val scored = time(s"t40_score_fixed_probe n=$n-model")(
        QualityClassifier.score(model.copy(weights = pinnedW),
          probe, "doc_id", "text")
          .select(col("doc_id"), col("keep")).localCheckpoint(true))
      // verdict sanity: the planted labels are recovered on the probe
      val acc = scored.join(probe, "doc_id")
        .where(col("keep") === col("label")).count()
      require(acc == Base, s"t40 misclassified ${Base - acc} probe docs at n=$n")
      prevVerdicts.foreach { p =>
        val diff = p.exceptAll(scored).count() + scored.exceptAll(p).count()
        require(diff == 0,
          s"t40 probe verdicts differ across scale-trained models: $diff rows")
        println(s"[scale] t40 LAW: fixed-probe verdicts identical across scales")
      }
      prevVerdicts = Some(scored)
    }
    spark.stop()
  }
}
