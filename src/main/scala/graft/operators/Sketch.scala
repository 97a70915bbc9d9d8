package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-accelerated exact operators — the 100 TB pattern where a
  * fixed-size probabilistic summary (CountMinSketch / BloomFilter, both
  * from Spark's public `org.apache.spark.util.sketch`) PREFILTERS the
  * shuffle and an exact pass over the survivors repairs the sketch's
  * one-sided error. The output is therefore EXACT (oracle-checkable
  * against plain SQL); only the intermediate volume is approximate.
  *
  * Why this beats the naive plan at scale: a global heavy-hitters
  * `groupBy(term)` shuffles EVERY distinct term of the corpus — at 100 TB
  * that exchange is corpus-vocabulary-sized (billions of keys, the long
  * Zipf tail all shuffling to lose). The sketch pass costs one scan with
  * a `width×depth`-long fixed-size merge to the driver (the same
  * aggregate-to-driver shape as a broadcast-join build), after which the
  * tail is dropped BEFORE the exchange: only plausible-heavy tokens —
  * sketch guarantees a superset of the true heavy set — are shuffled and
  * exactly counted. Shuffle payload goes from |vocabulary| to
  * ~|heavy| + ε·|tokens| rows.
  *
  * The reference has no sketch surface (its corpus fits in STM memory —
  * cdsmith/edgy Operations.hs holds whole node sets in maps); this is
  * part of the mandated beyond-the-reference scale extension.
  */
object Sketch {

  /** Exact heavy hitters over an exploded key column: every key whose
    * exact count is >= `threshold`, computed with a CountMinSketch
    * prefilter.
    *
    * Correctness argument (the law SketchSpec pins):
    *   1. CMS estimates NEVER undercount (one-sided error: collisions
    *      only add), so `estimate(k) >= count(k)` — every true heavy
    *      hitter passes the prefilter. No false negatives.
    *   2. False positives (tail keys whose estimate collided upward) are
    *      removed by the exact `HAVING count >= threshold` after the
    *      exact aggregation of survivors.
    *   Hence output ≡ the naive global groupBy + filter, exactly.
    *
    * `eps` bounds the over-estimate (≤ eps·N with prob. `confidence`,
    * N = total key instances): the expected false-positive volume — the
    * wasted shuffle — is the mass of keys within eps·N of the threshold.
    * Sketch memory is `ceil(e/eps) × ceil(ln(1/(1-confidence)))` longs
    * (~54 KB at the defaults), independent of corpus size.
    */
  def heavyHitters(keyed: DataFrame, keyCol: String, threshold: Long,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    requireStringKey(keyed, keyCol, "heavyHitters")
    // pass 1: fixed-size sketch, merged executor-side, collected once
    val cms = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)
    filteredExact(keyed, keyCol, threshold, cms)
  }

  private def filteredExact(keyed: DataFrame, keyCol: String,
      threshold: Long,
      cms: org.apache.spark.util.sketch.CountMinSketch): DataFrame = {
    val bc = keyed.sparkSession.sparkContext.broadcast(cms)
    val plausiblyHeavy = udf { k: String =>
      k != null && bc.value.estimateCount(k) >= threshold
    }
    // pass 2: survivors only reach the exchange; exact count repairs FPs
    keyed.where(plausiblyHeavy(col(keyCol)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }

  /** [[heavyHitters]] with the threshold given as a SHARE of total key
    * instances (e.g. 0.002 = "at least 0.2% of all tokens") — the
    * scale-free form: the same call means the same thing at sf0.01 and at
    * 100 TB. N comes from the sketch itself (`totalCount` = non-null key
    * instances, exact — CMS totals are not estimates), so the share form
    * costs no extra pass over the data. Returns (key, cnt, share).
    */
  def heavyHittersByShare(keyed: DataFrame, keyCol: String, minShare: Double,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0, 1), got $minShare")
    requireStringKey(keyed, keyCol, "heavyHittersByShare")
    val cms = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)
    val total = cms.totalCount()
    val threshold = math.max(1L, math.ceil(total * minShare).toLong)
    filteredExact(keyed, keyCol, threshold, cms)
      .withColumn("share",
        round(col("cnt").cast("double") / lit(total.toDouble) + lit(1e-9), 6))
  }

  /** Exact anti-join / semi-join with a BloomFilter prefilter on the big
    * side — the decontamination shape at 100 TB: `big` (the training
    * corpus) never shuffles its misses; a fixed-size Bloom filter of the
    * small side's keys drops the non-matching majority AT THE SCAN, and
    * the exact join over the survivors repairs the Bloom false positives.
    *
    * One-sided error does all the work, mirrored per join type:
    *   - `semi`: Bloom has NO false negatives, so every true match
    *     survives the prefilter; the exact semi join removes the FPs.
    *     Output ≡ plain LEFT SEMI.
    *   - `anti`: a Bloom MISS proves non-membership, so prefilter misses
    *     are emitted directly without ever reaching the join; only the
    *     Bloom HITS (true matches + FPs) go through the exact anti join,
    *     which re-admits the FPs. Output ≡ plain LEFT ANTI.
    *
    * `expectedKeys`/`fpp` size the filter (n·ln(1/fpp)/ln²2 bits —
    * ~1.2 MB per 1M keys at 1%); the filter rides the closure as a
    * broadcast, the same cost class as the broadcast hash join it guards.
    * At gate scale Catalyst would broadcast the small side anyway — the
    * Bloom pass earns its keep when the small side exceeds broadcast
    * limits but its KEY SET still fits a filter, the regime where the
    * naive plan degrades to a full shuffle of the big side.
    */
  def bloomJoin(big: DataFrame, small: DataFrame, keyCol: String,
      joinType: String, expectedKeys: Long = 1000000L, fpp: Double = 0.01,
      seed: Int = 42): DataFrame = {
    requireStringKey(big, keyCol, "bloomJoin")
    requireStringKey(small, keyCol, "bloomJoin")
    val spark = big.sparkSession
    val bf = small.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val mightMatch = udf { k: String => k != null && bc.value.mightContain(k) }
    joinType.toLowerCase match {
      case "semi" =>
        big.where(mightMatch(col(keyCol)))
          .join(small.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      case "anti" =>
        val hits = big.where(mightMatch(col(keyCol)))
          .join(small.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        big.where(!mightMatch(col(keyCol))).unionByName(hits)
      case other => throw new IllegalArgumentException(
        s"bloomJoin supports 'semi' or 'anti', got '$other'")
    }
  }

  // the sketch probe UDFs are String-typed; a numeric key would hash
  // differently sketch-side vs probe-side and silently break the
  // no-false-negative guarantee — fail at plan time instead
  private def requireStringKey(df: DataFrame, keyCol: String,
      op: String): Unit = {
    val dt = df.schema(keyCol).dataType
    require(dt == org.apache.spark.sql.types.StringType,
      s"$op requires a STRING key column, got $keyCol: ${dt.simpleString} — " +
        "cast explicitly so sketch and probe agree on the hashed bytes")
  }
}
