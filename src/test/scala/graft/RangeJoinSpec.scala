package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The binned range join must produce exactly the theta-join result while
  * planning as an equi-join (no nested-loop/cartesian operator).
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random fixture: 500 points, 80 intervals of
  // varying width, one shared equi-key with 2 values
  private lazy val points = (0 until 500).map { n =>
    (n.toLong, n % 2, (n * 37 % 1000).toDouble)
  }.toDF("pid", "k", "x")

  private lazy val intervals = (0 until 80).map { n =>
    val lo = (n * 61 % 900).toDouble
    (n.toLong, n % 2, lo, lo + 5.0 + (n % 7) * 20.0)
  }.toDF("iid", "k", "lo", "hi")

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned join equals the naive theta join, across bin sizes") {
    val naive = resultSet(points.join(intervals, Seq("k"))
      .where(col("x") >= col("lo") && col("x") < col("hi")))
    assert(naive.nonEmpty, "fixture must produce matches")
    for (bin <- Seq(1.0, 10.0, 33.3, 250.0)) {
      val binned = resultSet(RangeJoin.pointInInterval(
        points, intervals, "x", "lo", "hi", binSize = bin, keys = Seq("k")))
      assert(binned === naive, s"binSize=$bin diverges")
    }
  }

  test("binned join emits no duplicate pairs") {
    val out = RangeJoin.pointInInterval(
      points, intervals, "x", "lo", "hi", binSize = 10.0, keys = Seq("k"))
      .groupBy("pid", "iid").count().where(col("count") > 1)
    assert(out.isEmpty, "each (point, interval) pair must appear once")
  }

  test("binned join plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(
      points, intervals, "x", "lo", "hi", binSize = 10.0, keys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated:\n$plan")
  }
}
