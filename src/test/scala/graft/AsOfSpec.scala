package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Semantics of the reusable as-of operator on a hand-checkable fixture.
  * (The sf-scale path is oracle-checked via e05.)
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // quotes: key A at t=10,20,30; key B at t=15
  private lazy val quotes = Seq(
    ("A", ts(10), 100.0), ("A", ts(20), 200.0), ("A", ts(30), 300.0),
    ("B", ts(15), 150.0)
  ).toDF("sym", "ts", "px")

  // trades: A@t=25 (→ quote 20 backward, 30 forward), A@t=20 (tie → 20),
  // A@t=5 (no backward match), B@t=100, C@t=50 (no right rows at all)
  private lazy val trades = Seq(
    ("A", ts(25), 1L), ("A", ts(20), 2L), ("A", ts(5), 3L),
    ("B", ts(100), 4L), ("C", ts(50), 5L)
  ).toDF("sym", "ts", "trade_id")

  private def run(direction: String, tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsOf.join(trades, quotes, Seq("sym"), "ts",
      rightCols = Map("px" -> "quote_px"), direction = direction,
      toleranceSec = tol)
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("quote_px")).map(_.asInstanceOf[Double]))
      .toMap

  test("backward picks the latest quote at-or-before, null when none") {
    val m = run("backward")
    assert(m(1L) === Some(200.0)) // t=25 → quote at 20
    assert(m(2L) === Some(200.0)) // tie at t=20 matches (<= convention)
    assert(m(3L) === None)        // t=5 predates all quotes
    assert(m(4L) === Some(150.0)) // B's only quote at 15
    assert(m(5L) === None)        // no C quotes at all
  }

  test("forward picks the earliest quote at-or-after") {
    val m = run("forward")
    assert(m(1L) === Some(300.0)) // t=25 → quote at 30
    assert(m(2L) === Some(200.0)) // tie matches forward too
    assert(m(3L) === Some(100.0)) // t=5 → first quote at 10
    assert(m(4L) === None)        // no B quote after t=100
  }

  test("tolerance nulls out stale matches instead of dropping rows") {
    val m = run("backward", tol = Some(3L))
    assert(m(1L) === None)        // 25-20=5 > 3
    assert(m(2L) === Some(200.0)) // exact tie, distance 0
    assert(m(4L) === None)        // 100-15 way out
    assert(m.size === 5, "left-join semantics: every trade survives")
  }

  test("duplicate right timestamps resolve by tieBreak order") {
    val q2 = quotes.unionByName(Seq(("A", ts(20), 999.0)).toDF("sym", "ts", "px"))
      .withColumn("qid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("px"))))
    val out = AsOf.join(trades.where(col("trade_id") === 1L), q2,
      Seq("sym"), "ts", Map("px" -> "quote_px"), tieBreak = Seq("qid"))
      .collect()
    // backward takes the LAST right row in tieBreak order at t=20:
    // qid orders by px, so 999.0 (highest px ⇒ highest qid) wins
    assert(out.head.getAs[Double]("quote_px") === 999.0)
  }
}
