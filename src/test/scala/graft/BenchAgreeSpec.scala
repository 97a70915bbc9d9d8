package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The cross-run agreement gate, exercised on synthetic artifacts — the
  * scenario is round 11's four consecutive sentinel-flagged sf1 runs whose
  * totals agreed within ~3%, and the requirement is the round-10 verdict's
  * sanctioned protocol: two independent runs whose per-query medians
  * reproduce each other certify the flagged run clean; anything less
  * leaves the contamination flag up.
  */
class BenchAgreeSpec extends AnyFunSuite with Matchers {

  private def run(n: Int, f: Int => Double): Map[String, Double] =
    (1 to n).map(i => s"q$i" -> f(i)).toMap

  test("parseQueries extracts the flat queries object from a real artifact shape") {
    val artifact =
      """{"metric":"total","value":199.8,"unit":"sec","contaminated":true,
        |"queries":{"q01_agg":1.5,"t34_dsir_selection":5.6767,"g09":16.1095},
        |"sf":"/tmp/sf1","sentinel":{"name":"q06","times":[0.1,0.2],"rel_spread":0.54},
        |"heal":{"triggered":true,"raw_queries":{"q01_agg":9.9}}}""".stripMargin
    val qs = BenchAgree.parseQueries(artifact)
    qs shouldBe Map("q01_agg" -> 1.5, "t34_dsir_selection" -> 5.6767,
      "g09" -> 16.1095)
  }

  test("parseQueries of garbage yields empty (agreement then fails on shared count)") {
    BenchAgree.parseQueries("not json at all") shouldBe empty
    val a = BenchAgree.agreement(run(60, _.toDouble), Map.empty)
    a.pass shouldBe false
    a.shared shouldBe 0
  }

  test("two runs within a few percent certify each other") {
    val a = run(60, i => 1.0 + i * 0.1)
    val b = a.map { case (k, v) => k -> v * 1.03 } // uniform 3% drift
    val ag = BenchAgree.agreement(a, b)
    ag.pass shouldBe true
    ag.shared shouldBe 60
    ag.medianRelDiff should be <= 0.05
    ag.fracWithin shouldBe 1.0
  }

  test("a genuinely divergent run does not certify") {
    val a = run(60, i => 1.0 + i * 0.1)
    // half the queries 2x slower — a real regression or heavy pollution
    val b = a.map { case (k, v) =>
      k -> (if (k.drop(1).toInt % 2 == 0) v * 2.0 else v)
    }
    BenchAgree.agreement(a, b).pass shouldBe false
  }

  test("a good median cannot hide a large irreproducible minority") {
    val a = run(60, _ => 1.0)
    // 19 of 60 queries off by 60%: median is perfect, frac_within is not
    val b = a.map { case (k, v) =>
      k -> (if (k.drop(1).toInt <= 19) v * 1.6 else v)
    }
    val ag = BenchAgree.agreement(a, b)
    ag.medianRelDiff shouldBe 0.0
    ag.pass shouldBe false
  }

  test("sub-second jitter within the per-pair bound is tolerated") {
    val a = run(60, i => if (i <= 10) 0.3 else 5.0)
    // the ten sub-second queries jitter 20%, the rest reproduce exactly
    val b = a.map { case (k, v) =>
      k -> (if (k.drop(1).toInt <= 10) v * 1.2 else v)
    }
    BenchAgree.agreement(a, b).pass shouldBe true
  }

  test("a tiny overlap proves nothing") {
    val a = run(5, _ => 1.0)
    BenchAgree.agreement(a, a).pass shouldBe false
  }

  test("signedMedianRelDiff carries direction: slower positive, faster negative") {
    val prior = run(20, _ => 1.0)
    val slower = prior.map { case (k, v) => k -> v * 1.3 }
    val faster = prior.map { case (k, v) => k -> v * 0.7 }
    BenchAgree.signedMedianRelDiff(slower, prior) should be > 0.2
    BenchAgree.signedMedianRelDiff(faster, prior) should be < -0.2
    BenchAgree.signedMedianRelDiff(prior, prior) shouldBe 0.0
    BenchAgree.signedMedianRelDiff(Map("x" -> 1.0), Map("y" -> 1.0)) shouldBe 0.0
  }

  test("parseSf reads the artifact's scale factor; absent/garbage yields None") {
    // the anchor gate's cross-SF guard: an sf1 run must never grade
    // itself against an sf0.1 anchor
    val art = """{"metric":"total","value":1.0,"sf":"/root/testdata/sf0.1","queries":{"q1":1.0}}"""
    BenchAgree.parseSf(art) shouldBe Some("/root/testdata/sf0.1")
    BenchAgree.parseSf("""{"queries":{"q1":1.0}}""") shouldBe None
    BenchAgree.parseSf("not json") shouldBe None
  }

  test("tailOver counts only rows inflated past the catastrophe bound, slower side only") {
    val prior = run(20, _ => 1.0)
    // a 3.5x single-row swing (the honest same-code max observed in the
    // round-18 calibration) stays OUT of the tail; 5x+ rows are IN
    val honest = prior.updated("q1", 3.5)
    BenchAgree.tailOver(honest, prior) shouldBe empty
    val blown = prior.updated("q1", 37.0).updated("q2", 30.0).updated("q3", 5.5)
    BenchAgree.tailOver(blown, prior) shouldBe Seq("q1", "q2", "q3")
    // a row 37x FASTER is not contention and never counts
    BenchAgree.tailOver(prior.updated("q1", 1.0 / 37), prior) shouldBe empty
  }

  test("driftContaminated: tail rows or uniform near-2x slowdown, never a faster run") {
    // the round-17 driver catastrophe shape: modest median, 2+ tail rows
    BenchAgree.driftContaminated(signedMedian = 0.24, tailRows = 3) shouldBe true
    // honest window swing: median up to 0.41, no tail — NOT flagged
    BenchAgree.driftContaminated(signedMedian = 0.41, tailRows = 0) shouldBe false
    BenchAgree.driftContaminated(signedMedian = 0.41, tailRows = 1) shouldBe false
    // uniformly ~2x slower with no tail: flagged via the median arm
    BenchAgree.driftContaminated(signedMedian = 0.67, tailRows = 0) shouldBe true
    // a FASTER run is never contaminated whatever its tail looks like
    BenchAgree.driftContaminated(signedMedian = -0.4, tailRows = 5) shouldBe false
  }
}
