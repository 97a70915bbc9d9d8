package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of (nearest-event) join — the time-series operator Spark has
  * no built-in verb for (reference surface: the e05 events query; pandas'
  * merge_asof is the common API shape).
  *
  * Scale design: the naive formulation is a range theta-join (left.ts >=
  * right.ts AND per-key max) which Spark plans as a cross join + filter —
  * quadratic per key. This operator instead UNIONS both sides, sorts within
  * each key partition, and carries the most recent right row forward (or the
  * next one backward, for `forward` direction) with last/first(ignoreNulls)
  * over a running frame: ONE hash shuffle on the key columns, linear in
  * rows, and the window sort is the same sort a merge join would need
  * anyway. Left-join semantics: unmatched (or out-of-tolerance) left rows
  * keep null right columns.
  */
object AsOf {

  /** @param on        equality key columns (must exist on both sides)
    * @param ts        event-time column name (both sides, same type)
    * @param rightCols right columns to carry into the output, as
    *                  (right name → output name); output names must not
    *                  collide with left columns
    * @param direction "backward": latest right with right.ts <= left.ts
    *                  (ties match); "forward": earliest right with
    *                  right.ts >= left.ts (ties match)
    * @param toleranceSec match only within |left.ts - right.ts| <= tolerance
    * @param tieBreak  RIGHT-side columns ordering right rows that share a
    *                  timestamp; the LAST in this order wins for backward,
    *                  the FIRST for forward (left rows sort as nulls-first,
    *                  which is irrelevant: their order among themselves
    *                  never affects the carried value)
    */
  def join(
      left: DataFrame, right: DataFrame,
      on: Seq[String], ts: String,
      rightCols: Map[String, String],
      direction: String = "backward",
      toleranceSec: Option[Long] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"

    val leftFields = left.columns.toSeq
    val rStruct = struct(rightCols.keys.toSeq.map(col): _*)
    val lStruct = struct(leftFields.map(col): _*)
    // side rank puts the right side AT-or-before the left row in the carry
    // direction, so an exactly-simultaneous right row matches (the <= / >=
    // convention of ASOF)
    val rightRank = if (backward) 0 else 1
    val l2 = left.select(
      (on.map(col) :+ col(ts).as("__graft_ts") :+ lStruct.as("__graft_l")
        :+ lit(1 - rightRank).as("__graft_side"))
        ++ tieBreak.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r2 = right.select(
      (on.map(col) :+ col(ts).as("__graft_ts") :+ rStruct.as("__graft_r")
        :+ lit(rightRank).as("__graft_side"))
        ++ tieBreak.map(col): _*)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    val order = (col("__graft_ts") +: col("__graft_side") +: tieBreak.map(col)).map(_.asc)
    val w0 = Window.partitionBy(on.map(col): _*).orderBy(order: _*)
    val w = if (backward) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def carry(c: org.apache.spark.sql.Column) =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)

    val isRight = col("__graft_side") === rightRank
    val matched = unioned
      .withColumn("__graft_match", carry(when(isRight, col("__graft_r"))))
      .withColumn("__graft_match_ts", carry(when(isRight, col("__graft_ts"))))
      .where(!isRight)
    val inTolerance = toleranceSec match {
      case None => lit(true)
      case Some(tol) =>
        // cast-to-double works for TimestampType (epoch seconds WITH
        // sub-second fraction) and for numeric event-time columns alike;
        // unix_timestamp would null out numerics and truncate sub-second
        // gaps on timestamps
        abs(col("__graft_ts").cast("double")
          - col("__graft_match_ts").cast("double")) <= tol
    }
    val valid = when(col("__graft_match_ts").isNotNull && inTolerance, col("__graft_match"))
    matched.select(
      leftFields.map(f => col(s"__graft_l.$f").as(f)) ++
        rightCols.map { case (r, out) => valid.getField(r).as(out) }: _*)
  }
}
