package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DsirExpressions
import graft.functions.TextFunctions.tokens

/** Trained document-quality classification — the CCNet/GPT-3 curation
  * stage that t26's untrained perplexity filter approximates: a NAIVE
  * BAYES classifier over hashed unigram features, fit on a labeled
  * corpus split (curated positives vs raw negatives) and applied as a
  * linear scorer (NB is linear in log space: score = Σ per-feature
  * log-likelihood ratios). Complements t26 (no labels, corpus-global
  * statistics) with the supervised form the big pipelines actually run.
  *
  * Design for 100 TB, and for the oracle:
  *
  *   - FEATURE HASHING, not a vocabulary: tokens map to `buckets` ids via
  *     [[graft.functions.Mod61]]'s base-131 hash (a codegen'd Expression
  *     on the Spark side, the `list_reduce` HUGEINT replay on DuckDB's) —
  *     the model is a FIXED-SIZE table whatever the corpus vocabulary,
  *     so it broadcasts at any scale (the same argument as the DSIR
  *     ratio table, operators/Dsir.scala).
  *   - CLOSED-FORM training: one token-bucket aggregation per class —
  *     a single shuffle over (bucket) carrying two count columns. No
  *     gradient loop, nothing iterative; "training" is exactly the kind
  *     of aggregation Spark already does at scale.
  *   - FIXED-POINT weights: each per-bucket log-likelihood ratio is
  *     stored as integer micro-units (`floor((llr + 1e-9)·10⁶ + 0.5)`,
  *     the house engine-neutral rounding spelling). Document scores are
  *     then SUMS OF BIGINTS — exact and summation-ORDER-FREE, so the
  *     cross-engine hash comparison never depends on float accumulation
  *     order (a stricter guarantee than t26's rounded float mean).
  *   - Laplace smoothing (+1 per bucket, +buckets per class total) keeps
  *     every weight finite; tokens hashing to buckets unseen in training
  *     score the shared default weight (both classes at their priors).
  */
object QualityClassifier {

  /** The trained model: a fixed-size bucket→weight table plus the
    * out-of-vocabulary default — both in integer micro-units.
    */
  final case class NbModel(weights: DataFrame, defaultPpm: Long, buckets: Int)

  private def bucketOf(term: Column, buckets: Int): Column =
    pmod(DsirExpressions.hash61(term), lit(buckets.toLong))

  /** The engine-neutral fixed-point spelling shared with the DuckDB
    * replay: floor((x + 1e-9)·10⁶ + 0.5) as a BIGINT.
    */
  private def ppm(x: Column): Column =
    floor((x + lit(1e-9)) * lit(1e6) + lit(0.5)).cast("long")

  /** Fit the classifier: one hashed-bucket aggregation over the labeled
    * corpus (label true = curated/positive). Token-bucket counts are NB's
    * sufficient statistics — training IS the aggregation.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 4096): NbModel = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val feats = labeled.select(col(labelCol).as("pos"),
        explode(tokens(col(textCol))).as("term"))
      .select(col("pos"), bucketOf(col("term"), buckets).as("bucket"))
    val cls = feats.groupBy(col("bucket")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("pc"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("nc"))
    // class totals: driver-sized (two longs) — the model must embed them
    // as literals so the weight expression is a pure per-row function
    val tot = cls.agg(
      coalesce(sum(col("pc")), lit(0L)), coalesce(sum(col("nc")), lit(0L)))
      .head()
    val (pt, nt) = (tot.getLong(0), tot.getLong(1))
    val llr = log((col("pc") + lit(1.0)) / lit(pt + buckets.toDouble)) -
      log((col("nc") + lit(1.0)) / lit(nt + buckets.toDouble))
    val weights = cls.select(col("bucket"), ppm(llr).as("llr_ppm"))
    // unseen bucket: both classes at count 0 — the smoothed prior ratio
    val default = math.floor((math.log(1.0 / (pt + buckets)) -
      math.log(1.0 / (nt + buckets)) + 1e-9) * 1e6 + 0.5).toLong
    NbModel(weights, default, buckets)
  }

  /** Score documents: hashed-token lookup against the broadcast model,
    * exact BIGINT sum per doc, mean in micro-units rounded to 4dp.
    * `keep` is the positive-class verdict (score > 0 ⇔ the curated class
    * is more likely under NB with equal priors).
    */
  def score(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val feats = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("term"))
      .select(col(idCol), bucketOf(col("term"), model.buckets).as("bucket"))
    feats.join(broadcast(model.weights), Seq("bucket"), "left")
      .withColumn("w", coalesce(col("llr_ppm"), lit(model.defaultPpm)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_ppm"))
      .withColumn("mean_llr", round(
        col("score_ppm").cast("double") / lit(1e6) / col("n_tokens") +
          lit(1e-9), 4))
      .withColumn("keep", col("score_ppm") > 0L)
  }
}
