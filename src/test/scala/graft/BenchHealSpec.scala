package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench self-healing policy, exercised on synthetic sample arrays —
  * the scenario is round 6's polluted artifact (sentinel rel_spread 0.94
  * published as the round's number) and the requirement is the round-6
  * verdict's: a polluted run must converge to per-query numbers whose
  * final sentinel/spread fields pass the trust bound, and a quiet run's
  * output must be unchanged.
  */
class BenchHealSpec extends AnyFunSuite with Matchers {

  private val bound = 0.3

  test("baseline ignores the warmup-inflated first sentinel sample") {
    // first sample ~2x warm time is NORMAL and must not drag the baseline
    BenchHeal.baseline(Seq(2.1, 1.0, 1.05, 0.98)) shouldBe 0.98
  }

  test("quiet run: no rep is dirty, spread under bound") {
    val sentinel = Seq(2.0, 1.0, 1.05, 0.97, 1.02) // reps=3 + closing
    BenchHeal.relSpread(sentinel.drop(1)) should be <= bound
    BenchHeal.dirtyReps(sentinel, reps = 3, bound) shouldBe empty
  }

  test("a contention window dirties exactly the reps it brackets") {
    // contention lands during rep 2: inflates the sample after rep 2
    // (index 2), which also precedes rep 3 -> reps 2 AND 3 suspect
    val sentinel = Seq(2.0, 1.0, 3.0, 1.02, 1.0)
    BenchHeal.dirtyReps(sentinel, reps = 3, bound) shouldBe Set(2, 3)
  }

  test("rep 1 is never dirtied by the warmup-inflated leading sample") {
    val sentinel = Seq(5.0, 1.0, 1.02, 0.99, 1.01)
    BenchHeal.dirtyReps(sentinel, reps = 3, bound) shouldBe empty
  }

  test("sustained contention dirties everything") {
    val sentinel = Seq(2.0, 3.0, 2.9, 3.1, 1.0) // quiet only at the close
    BenchHeal.dirtyReps(sentinel, reps = 3, bound) shouldBe Set(1, 2, 3)
  }

  test("uniformly inflated original window flags once heal brackets reveal the floor") {
    // contention covered EVERY original rep (~2x), so the original window
    // alone looks internally consistent; the quiet heal-pass brackets
    // (0.6) expose the true floor and all three reps must grade dirty —
    // judging against the original window's own min (1.2) would pass them
    val sentinel = Seq(2.0, 1.2, 1.2, 1.2, 0.6, 0.6)
    BenchHeal.dirtyReps(sentinel, reps = 3, bound) shouldBe Set(1, 2, 3)
  }

  test("mergedSamples keeps clean originals and appends clean heal samples") {
    val orig = Seq(1.0, 9.0, 1.1) // rep 2 polluted
    BenchHeal.mergedSamples(orig, dirty = Set(2), healClean = Seq(1.05)) shouldBe
      Seq(1.0, 1.1, 1.05)
  }

  test("mergedSamples falls back to originals when healing is exhausted") {
    val orig = Seq(9.0, 8.5, 9.2)
    BenchHeal.mergedSamples(orig, dirty = Set(1, 2, 3), healClean = Seq.empty) shouldBe orig
  }

  test("round-6 scenario end-to-end: healed medians pass the trust bound") {
    // q40-style query: true warm time ~0.4s, rep 2 hit by the hog (7.5s).
    // Initial sentinel: quiet-hog-quiet, spread 3.0/1.0 - 1 >> bound.
    val initialSentinel = Seq(2.0, 1.0, 3.0, 1.02)
    val reps = 2
    val orig = Seq(0.4, 7.5)
    BenchHeal.relSpread(initialSentinel.drop(1)) should be > bound
    BenchHeal.relSpread(orig) should be > bound // query itself trips -> requeried

    // healing pass after the hog exits: bracketing sentinels quiet
    val healBrackets = Seq(0.99, 1.01)
    val allSentinel = initialSentinel ++ healBrackets
    val base = BenchHeal.baseline(allSentinel)
    healBrackets.forall(BenchHeal.isQuiet(_, base, bound)) shouldBe true

    val dirty = BenchHeal.dirtyReps(initialSentinel, reps, bound)
    dirty shouldBe Set(2)
    val healed = BenchHeal.mergedSamples(orig, dirty, healClean = Seq(0.42))
    healed shouldBe Seq(0.4, 0.42)
    BenchHeal.relSpread(healed) should be <= bound
    BenchHeal.median(healed) shouldBe 0.42 // the hog's 7.5s never graded

    // the published trust statement: spread over the quiet sentinels only
    val quiet = allSentinel.drop(1).filter(BenchHeal.isQuiet(_, base, bound))
    BenchHeal.relSpread(quiet) should be <= bound
  }

  test("individually-quiet samples have rel_spread <= bound by construction") {
    // isQuiet(s) = s <= base*(1+bound); any such set's (max-min)/median is
    // at most bound because median >= base = min
    val base = 1.0
    val samples = Seq(1.0, 1.29, 1.1, 1.3)
    samples.forall(BenchHeal.isQuiet(_, base, bound)) shouldBe true
    BenchHeal.relSpread(samples) should be <= bound
  }

  // --- BenchFormat: the compact final stdout line (round-8 verdict #1:
  // three rounds of `parsed: null` because the full JSON overflowed the
  // driver's 2000-char stdout tail capture)

  // realistic name length: the live headline's names average ~20 chars
  private def line(n: Int, maxLen: Int = 1900): String = {
    val results = (1 to n).map(i => f"q${i}%02d_synthetic_name" -> (i * 1.2345))
    BenchFormat.compactLine(results, results.map(_._2).sum, "/root/testdata/sf0.1",
      3, "BENCH_LATEST.json", "q06_scalar_agg", 0.21, healed = true,
      failedJson = "[]", maxLen = maxLen)
  }

  test("compact line fits the 2000-char tail for the current headline count") {
    val l = line(90) // headroom over today's 74 headline queries
    l.length should be <= 1900
    // every per-query median must be present (under its full or prefix
    // key) with FLOAT precision, and `queries` must be last
    (1 to 90).foreach(i => l should include(f""""q${i}%02d":"""))
    l should include("\"names\":\"prefix\"")
    l should include(":1.2345") // q01's median, full 4dp precision
    l should endWith("}}")
    l.indexOf("\"queries\":") should be > l.indexOf("\"sentinel\":")
  }

  test("compact line keeps full names while they fit") {
    val l = line(20)
    (1 to 20).foreach(i => l should include(f""""q${i}%02d_synthetic_name":"""))
    l should include("\"names\":\"full\"")
  }

  test("prefix keys that would collide fall back to full names") {
    BenchFormat.shortNames(Seq("q01_a", "q01_b")) shouldBe None
    BenchFormat.shortNames(Seq("q01_a", "q02_b")) shouldBe
      Some(Map("q01_a" -> "q01", "q02_b" -> "q02"))
  }

  test("compact line carries the top-level contaminated flag (round-9: exhausted heal was buried)") {
    val results = Seq("q01_pricing_summary" -> 1.5)
    def l(c: Boolean) = BenchFormat.compactLine(results, 1.5, "sf", 3,
      "BENCH_LATEST.json", "q06_scalar_agg", 0.9, healed = true,
      failedJson = "[]", contaminated = c)
    l(true) should include("\"contaminated\":true")
    l(false) should include("\"contaminated\":false")
  }

  test("compact line abbreviates names before surrendering float precision") {
    // 60 full names at 4dp don't fit 1500: the line must drop to prefix
    // keys while KEEPING 4dp floats (the consumer needs float times more
    // than self-describing keys — the full names live in the artifact)
    val tight = line(60, maxLen = 1500)
    tight should include("\"names\":\"prefix\"")
    tight should include(":1.2345")
    (1 to 60).foreach(i => tight should include(f""""q${i}%02d":"""))
    // only once even prefix keys overflow do decimals degrade — never
    // dropping a query
    val tighter = line(60, maxLen = 700)
    (1 to 60).foreach(i => tighter should include(f""""q${i}%02d":"""))
    tighter should not include ".2345"
  }

  test("compact line parses as one JSON object with expected keys") {
    val l = line(5)
    // structural smoke parse: balanced braces, key order, no trailing comma
    l.count(_ == '{') shouldBe l.count(_ == '}')
    l should startWith("""{"metric":"total","value":""")
    Seq("\"unit\":", "\"sf\":", "\"artifact\":", "\"sentinel\":", "\"healed\":true",
      "\"failed\":[]", "\"queries\":{").foreach(k => l should include(k))
  }
}
