package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: exactly k rows per stratum, chosen by
  * ranking an md5 content hash of the id — a seedless, engine-portable
  * "random" order, so the same corpus yields the same sample on every run,
  * every engine, and every partitioning (the property a training-data
  * pipeline needs for reproducible eval splits; md5 rather than xxhash64
  * precisely so the DuckDB oracle can replay it).
  *
  * Scale shape: the naive form is one shuffle on the strata key plus a
  * per-stratum window — correct, but a 100 TB stratum funnels through one
  * task's sort. `prefilterTopFrac` fixes that: rows whose hash prefix falls
  * outside the smallest `frac` of hash space are dropped BEFORE the
  * exchange (a zero-shuffle row filter), so the window sorts ~frac·|stratum|
  * rows. Because ranking and prefilter use the SAME hash order, any frac
  * that keeps ≥ k rows per stratum yields the identical sample; size frac
  * ≈ (k / min-stratum-size) · safety-margin. An undersized frac fails loud
  * (fewer than k rows out), never silently skews.
  */
object Sampling {

  /** md5-hex of the id — the portable sort key. */
  private def hashKey(idCol: String): Column = md5(col(idCol).cast("string"))

  def stratified(df: DataFrame, strata: Seq[String], k: Int, idCol: String,
      prefilterTopFrac: Option[Double] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pre = prefilterTopFrac match {
      case Some(frac) =>
        require(frac > 0 && frac <= 1, s"prefilterTopFrac out of (0,1]: $frac")
        // first 8 hex chars as a uniform 32-bit integer; strictly-below
        // cutoff keeps the hash-smallest ~frac of rows
        val prefix32 = conv(substring(hashKey(idCol), 1, 8), 16, 10).cast("long")
        df.filter(prefix32 < (frac * 4294967296.0).toLong)
      case None => df
    }
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashKey(idCol), col(idCol))
    pre.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
