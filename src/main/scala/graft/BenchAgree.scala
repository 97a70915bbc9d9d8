package graft

/** Cross-run agreement gate for the bench harness (pure — no Spark, no IO
  * beyond the caller handing in file contents — so the policy is
  * unit-testable).
  *
  * The sentinel/heal machinery ([[BenchHeal]]) detects host contention
  * WITHIN a run. At sf1 it has a blind spot of the opposite kind: the
  * 30 GB-working-set queries leave GC/page-cache debt that flaps the
  * sentinel even when every query's own reps are tight — round 11 saw four
  * consecutive sf1 runs self-flag with heal exhausted while their TOTALS
  * agreed within ~3%. The formal protocol for that regime (the round-10
  * review's sanctioned alternative): two INDEPENDENT runs certify each
  * other. Host contention is time-local — it cannot inflate the same
  * queries by the same factors in two runs minutes-to-hours apart — so a
  * sentinel-flagged run whose per-query medians reproduce a prior run's
  * within tight bounds publishes `contaminated: false` with the agreement
  * evidence attached (and `sentinel_flagged: true` kept for honesty). If
  * contention DID span both runs, the numbers are at worst consistently
  * inflated — a slower-but-real measurement, not garbage.
  */
object BenchAgree {

  /** The flat `"queries":{...}` object of a prior bench artifact. The
    * artifact is this harness's OWN writer format — a one-level
    * name→seconds map with no nested braces — so a regex parse is exact,
    * and anything unparseable simply yields an empty map (agreement then
    * fails on `shared < minShared`, never on an exception).
    */
  def parseQueries(artifactJson: String): Map[String, Double] = {
    val obj = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(artifactJson).map(_.group(1)).getOrElse("")
    """"([^"]+)"\s*:\s*([-0-9.eE]+)""".r.findAllMatchIn(obj).flatMap { m =>
      scala.util.Try(m.group(1) -> m.group(2).toDouble).toOption
    }.toMap
  }

  /** The artifact's own "sf" field — the drift anchor must never compare
    * runs across scale factors (an sf1 run against an sf0.1 anchor reads
    * a meaningless ~3× "drift"; observed live in round 16 before this
    * guard existed).
    */
  def parseSf(artifactJson: String): Option[String] =
    """"sf"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(artifactJson).map(_.group(1))

  final case class Agreement(
      shared: Int,
      medianRelDiff: Double,
      fracWithin: Double,
      pass: Boolean)

  /** Symmetric relative difference: |a-b| / mean(a,b). */
  private def relDiff(a: Double, b: Double): Double = {
    val m = (a + b) / 2
    if (m <= 0) 0.0 else math.abs(a - b) / m
  }

  /** SIGNED median relative difference of `current` vs `prior` over the
    * shared queries (positive = current is slower). The drift anchor
    * gates on this direction: host contention can only INFLATE a run,
    * so a divergence where the current run is systematically FASTER
    * than the anchor cannot be contention and must not be flagged
    * contaminated — it is a faster environment (or faster code), and
    * the numbers are real. 0.0 when nothing is shared.
    */
  def signedMedianRelDiff(current: Map[String, Double],
      prior: Map[String, Double]): Double = {
    val shared = current.keySet.intersect(prior.keySet).toSeq
    if (shared.isEmpty) return 0.0
    val diffs = shared.map { q =>
      val m = (current(q) + prior(q)) / 2
      if (m <= 0) 0.0 else (current(q) - prior(q)) / m
    }
    math.rint(BenchHeal.median(diffs) * 1e4) / 1e4
  }

  /** Rows where `current` is SLOWER than `prior` by at least `bound`
    * symmetric relative difference (1.35 ≈ a 5× ratio) — the drift
    * anchor's CATASTROPHE TAIL. Round-18 calibration, from three
    * same-code full headline runs in one session (committed
    * BENCH_r18_before/after + the logged mid-session probe) against the
    * round-17 driver catastrophe (BENCH_r17.json):
    *
    *   - honest same-code window swings move the MEDIAN by up to 0.41
    *     and single rows by up to 1.11 (v11: 3.39s vs 1.10s) — the
    *     median bounds `agreement()` uses for CERTIFICATION therefore
    *     cannot distinguish a normal window from the r17 catastrophe,
    *     whose median vs our clean runs was only 0.24;
    *   - what separates the catastrophe is its TAIL: t30 1.90, t28 1.89,
    *     t33 1.42+ (32-37× single-row inflations no window swing
    *     produces — the honest max ratio observed is ~3.5×).
    *
    * Hence the drift gate flags on >= 2 tail rows (margin on both
    * sides: honest max 1.11 < 1.35 < catastrophe 3rd-highest 1.42), or
    * on a uniform signed median above 0.6 (honest max 0.41; a run
    * uniformly ~2x slower has ~0.67+ with no tail at all).
    */
  def tailOver(current: Map[String, Double], prior: Map[String, Double],
      bound: Double = 1.35): Seq[String] =
    current.keySet.intersect(prior.keySet).toSeq.filter { q =>
      current(q) > prior(q) && relDiff(current(q), prior(q)) >= bound
    }.sorted

  /** The drift-anchor contamination verdict (see [[tailOver]] for the
    * calibration): directional (only a SLOWER run can be contention), and
    * tail-or-uniform — never the certification median, which round-18
    * measured to be window noise on this host.
    */
  def driftContaminated(signedMedian: Double, tailRows: Int): Boolean =
    signedMedian > 0 && (tailRows >= 2 || signedMedian > 0.6)

  /** Do two runs' per-query medians certify each other?
    *
    * Pass requires all three, over the queries PRESENT IN BOTH runs:
    *   - at least `minShared` shared queries (a 3-query overlap proves
    *     nothing about a 60-query artifact);
    *   - median per-query relative difference ≤ `medianBound` (the bulk of
    *     the surface reproduced);
    *   - ≥ `minFracWithin` of shared queries within `pairBound` (no large
    *     minority of irreproducible numbers hiding behind a good median —
    *     sub-second queries legitimately jitter more than the median's
    *     bound, hence the looser per-pair bound).
    */
  def agreement(current: Map[String, Double], prior: Map[String, Double],
      medianBound: Double = 0.10, pairBound: Double = 0.25,
      minFracWithin: Double = 0.8, minShared: Int = 10): Agreement = {
    val shared = current.keySet.intersect(prior.keySet).toSeq
    // -1 sentinel (not NaN): the agreement block is embedded in JSON,
    // where a bare NaN would make the whole artifact unparseable
    if (shared.size < minShared)
      return Agreement(shared.size, -1.0, 0.0, pass = false)
    val diffs = shared.map(q => relDiff(current(q), prior(q)))
    val medianDiff = BenchHeal.median(diffs)
    val fracWithin = diffs.count(_ <= pairBound).toDouble / diffs.size
    Agreement(shared.size,
      math.rint(medianDiff * 1e4) / 1e4,
      math.rint(fracWithin * 1e4) / 1e4,
      pass = medianDiff <= medianBound && fracWithin >= minFracWithin)
  }
}
