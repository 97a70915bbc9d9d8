package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Laws of the trained NB quality classifier: the score is an exact
  * integer sum of per-bucket weights (order-free), unseen buckets take
  * the smoothed default, and the verdict separates the planted classes.
  */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  // planted separable corpus: positives speak "good", negatives "spam"
  private lazy val labeled = ((0 until 40).map(i =>
    (i.toLong, s"good clean prose number $i", true)) ++
    (40 until 80).map(i =>
      (i.toLong, s"spam junk noise number $i", false)))
    .toDF("doc_id", "text", "pos")

  test("trained classifier separates the planted classes") {
    val model = QualityClassifier.train(labeled, "text", "pos", buckets = 512)
    val scored = QualityClassifier.score(model, labeled, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0 until 40).foreach(i => assert(scored(i.toLong),
      s"positive doc $i rejected"))
    (40 until 80).foreach(i => assert(!scored(i.toLong),
      s"negative doc $i kept"))
  }

  test("score is the exact integer sum of per-bucket weights") {
    val model = QualityClassifier.train(labeled, "text", "pos", buckets = 512)
    val w = model.weights.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = QualityClassifier.score(model, labeled, "doc_id", "text")
      .where(col("doc_id") === 0L).head()
    // recompute doc 0's score by hand through the same hash
    val toks = "good clean prose number 0".split("\\s+")
    val expected = toks.map { t =>
      val h = graft.functions.Mod61.hash61(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      w.getOrElse(h % 512L, model.defaultPpm)
    }.sum
    assert(scored.getAs[Long]("score_ppm") === expected)
    assert(scored.getAs[Long]("n_tokens") === toks.length.toLong)
  }

  test("tokens hashing to unseen buckets take the smoothed default") {
    val model = QualityClassifier.train(labeled, "text", "pos", buckets = 512)
    // a vocabulary disjoint from training: with 512 buckets and a tiny
    // training vocab most buckets are unseen; every unseen one must score
    // defaultPpm, so a doc of one novel token scores exactly the default
    // (if it happens to collide into a seen bucket, its weight is that
    // bucket's — assert via the same hash the operator uses)
    val novel = Seq((999L, "zzzzqqqq")).toDF("doc_id", "text")
    val got = QualityClassifier.score(model, novel, "doc_id", "text").head()
    val h = graft.functions.Mod61.hash61(
      org.apache.spark.unsafe.types.UTF8String.fromString("zzzzqqqq")) % 512L
    val seen = model.weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.getAs[Long]("score_ppm") === seen.getOrElse(h, model.defaultPpm))
  }

  test("default weight is the smoothed prior ratio, exactly") {
    // unseen-bucket llr = ln(1/(pt+B)) - ln(1/(nt+B)) = ln((nt+B)/(pt+B)):
    // the SMALLER class gets more smoothing mass per unseen feature, so
    // with negative-heavy totals an unseen token leans POSITIVE
    val skewed = ((0 until 10).map(i => (i.toLong, "good text", true)) ++
      (10 until 90).map(i => (i.toLong, "bad text filler words", false)))
      .toDF("doc_id", "text", "pos")
    val m = QualityClassifier.train(skewed, "text", "pos", buckets = 128)
    val (pt, nt) = (10L * 2, 80L * 4) // token totals per class
    val expected = math.floor((math.log(1.0 / (pt + 128)) -
      math.log(1.0 / (nt + 128)) + 1e-9) * 1e6 + 0.5).toLong
    assert(m.defaultPpm === expected)
    assert(m.defaultPpm > 0L) // ln((320+128)/(20+128)) > 0
  }
}
