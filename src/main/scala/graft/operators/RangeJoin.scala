package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large×large range joins without a cross product.
  *
  * Spark plans a non-equi join as broadcast-nested-loop (fine when one side
  * broadcasts, like q27's three bands) or a cartesian product — quadratic
  * when BOTH sides are large. This operator turns point-in-interval joins
  * into an equi-join on fixed-width BINS: each point lands in exactly one
  * bin, each interval explodes to the bins it covers, the bin equi-join
  * shuffles hash-partitioned like any other join (AQE skew-split applies),
  * and the exact predicate filters bin-mates. Results are identical to the
  * theta join; no dedup is needed because a point's single bin meets a
  * given interval at most once.
  *
  * `binSize` tunes the explosion factor: intervals emit
  * ceil(length/binSize)+1 rows, points emit 1. Pick binSize ≈ median
  * interval length so the blow-up stays ~2× while bins stay selective.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` whose [lo, hi) contains the
    * point, optionally also matching equality `keys` (present on both
    * sides). Output = point columns + interval columns (names must not
    * collide; alias beforehand if they do).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binSize: Double,
      keys: Seq[String] = Nil): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val p = points.withColumn("__graft_bin",
      floor(col(pointCol) / binSize).cast("long"))
    val i = intervals.withColumn("__graft_bin",
      explode(sequence(
        floor(col(loCol) / binSize).cast("long"),
        // hi is exclusive, but an interval ending exactly on a bin edge
        // still covers that edge's bin trivially — the exact predicate
        // prunes it; sequence is inclusive so no +1 needed
        floor(col(hiCol) / binSize).cast("long"))))
    p.join(i, keys :+ "__graft_bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__graft_bin")
  }
}
