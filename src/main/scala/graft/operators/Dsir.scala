package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{DsirExpressions, Mod61, TextFunctions}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169), t34: pick the `k` raw-pool documents whose hashed
  * n-gram distribution looks most like a small TARGET corpus, by importance
  * weight under two bag-of-hashed-ngrams unigram models.
  *
  *   - features: unigrams + bigrams of the whitespace tokens, hashed into
  *     `buckets` buckets ([[graft.functions.HashedNgramBuckets]] — Mod61, so
  *     the DuckDB oracle replays every bucket id);
  *   - fit: bucket counts on the target and on the raw pool, Laplace +1
  *     smoothing → per-bucket log p(b) − log q(b), a `buckets`-sized double
  *     table (driver-sized BY CONSTRUCTION: `buckets` is a fixed hyper-param,
  *     never data-dependent);
  *   - weight: log w(doc) = Σ over the doc's grams of the table entry —
  *     computed INSIDE the scan projection ([[graft.functions.BucketTableSum]]
  *     carrying the table, the broadcast-sketch pattern): scoring a 100 TB
  *     pool is one shuffle-free linear pass;
  *   - resample: Gumbel top-k — rank on log w + g(doc) where
  *     g = −ln(−ln(u)) and u = (hash61(id)+0.5)/p is a DETERMINISTIC uniform
  *     (the paper samples without replacement ∝ exp(log w); Gumbel-key
  *     top-k is the standard equivalent, and a hash-derived u makes the
  *     draw replayable in SQL where rand() would not be);
  *   - the global rank never funnels through one task: [[GlobalOrder.rank]]
  *     (range-repartition + per-range window + broadcast offsets).
  *
  * Shuffle budget: 2 bucket aggregations (map-side partial, ≤ `buckets`
  * rows reach each exchange) + GlobalOrder's two parallel full-data
  * exchanges. The raw pool's text is read twice (fit q, then score) — the
  * fit is count-only, so the second read is the one that carries weight.
  *
  * The published verdict keys are 4dp-rounded with the 1e-9 nudge (the t26
  * cross-engine argument); ties at equal rounded key break by ascending id,
  * so the selection boundary replays exactly.
  */
object Dsir {

  val DefaultBuckets = 8192

  /** Per-bucket log p(b) − log q(b) with Laplace +1 smoothing, as a
    * `buckets`-sized table. Two count-only aggregations; each collect is
    * ≤ `buckets` rows.
    */
  def fitLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): Array[Double] = {
    def bucketCounts(df: DataFrame): Array[Long] = {
      val out = new Array[Long](buckets)
      df.select(explode(DsirExpressions.ngramBuckets(
          TextFunctions.tokens(col(textCol)), buckets)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .collect()
        .foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
      out
    }
    val tc = bucketCounts(target)
    val rc = bucketCounts(raw)
    val tTot = tc.sum.toDouble + buckets
    val rTot = rc.sum.toDouble + buckets
    Array.tabulate(buckets) { b =>
      math.log((tc(b) + 1) / tTot) - math.log((rc(b) + 1) / rTot)
    }
  }

  /** id, n_grams, raw (unrounded) log importance weight. The bucket array is
    * materialized in its own projection so the two consumers (count + sum)
    * don't re-evaluate the hashing — CollapseProject keeps a non-cheap
    * expression that is referenced twice in its own project.
    */
  def score(raw: DataFrame, idCol: String, textCol: String,
      logRatios: Array[Double], buckets: Int): DataFrame = {
    require(logRatios.length == buckets,
      s"score: table of ${logRatios.length} entries for $buckets buckets")
    raw.select(col(idCol), DsirExpressions.ngramBuckets(
        TextFunctions.tokens(col(textCol)), buckets).as("__bk"))
      .select(col(idCol),
        size(col("__bk")).cast("long").as("n_grams"),
        DsirExpressions.bucketTableSum(col("__bk"), logRatios).as("__raw_logw"))
  }

  /** Full DSIR verdict over the raw pool: idCol, n_grams, logw (4dp),
    * sel_key (4dp Gumbel key), sel_rank, selected (rank ≤ k).
    */
  def select(target: DataFrame, raw: DataFrame, idCol: String, textCol: String,
      k: Long, buckets: Int = DefaultBuckets): DataFrame = {
    require(k >= 0, s"select: k must be >= 0, got $k")
    val ratios = fitLogRatios(target, raw, textCol, buckets)
    val u = (DsirExpressions.hash61(col(idCol).cast("string")).cast("double")
      + lit(0.5)) / lit(Mod61.P.toDouble)
    val keyed = score(raw, idCol, textCol, ratios, buckets)
      .withColumn("logw", round(col("__raw_logw") + lit(1e-9), 4))
      .withColumn("sel_key", round(col("__raw_logw") - log(-log(u)) + lit(1e-9), 4))
      .select(col(idCol), col("n_grams"), col("logw"), col("sel_key"))
    GlobalOrder.rank(keyed, Seq(col("sel_key").desc, col(idCol).asc), "sel_rank")
      .withColumn("selected", col("sel_rank") <= k)
  }
}
