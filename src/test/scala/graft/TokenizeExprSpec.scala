package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.WhitespaceTokens

/** Pins [[graft.functions.WhitespaceTokens]] bit-for-bit to the regex
  * chain it replaced: `split(trim(lower(text)), "\\s+")`. The whole text
  * family's oracle parity rides on this equivalence (the DuckDB side
  * replays the regex chain), so it is property-tested over adversarial
  * inputs — every Java `\s` byte, multi-byte UTF-8, uppercase Unicode,
  * NBSP (not `\s`, must not split), and the empty/all-whitespace edges
  * where Java's `split(re, -1)` semantics are at their strangest.
  */
class TokenizeExprSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private val VT = '' // vertical tab: in Java \s, has no escape in Scala

  private def bothWays(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val df = inputs.toDF("text")
    val got = df.select(WhitespaceTokens.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    val want = df.select(split(trim(lower(col("text"))), "\\s+").as("t"))
      .collect().map(_.getSeq[String](0))
    got.zip(want).zip(inputs).foreach { case ((g, w), in) =>
      assert(g === w,
        s"ws_tokens diverged from regex chain on ${in.map(_.toInt).mkString(",")}")
    }
  }

  test("edge cases match the regex chain exactly") {
    bothWays(Seq(
      "", " ", "  ", "\t", "\n", s"$VT", "\f", "\r",
      "a", " a", "a ", " a ", "\ta", "a\t", "\ta\t",
      "a b", "a  b", "a\t\tb", "a \t\r\n b", s"a${VT}b",
      "Hello World", "HELLO\tWORLD", "MiXeD CaSe",
      "café NAÏVE", // multi-byte lowercase targets
      "ÉCOLE 中文 Ж", // uppercase Unicode + CJK + Cyrillic
      "a b", // NBSP: not \s, must stay one token
      "  ", // Unicode line separators: not Java \s
      "word\r\nword", "  tab\tand space  "))
  }

  test("random strings over a whitespace-heavy alphabet match") {
    val alphabet =
      Gen.oneOf(' ', '\t', '\n', VT, '\f', '\r', 'a', 'B', 'z', '0',
        'é', 'É', '中', ' ', '.', '-')
    val strGen = Gen.listOf(alphabet).map(_.mkString)
    val batch = (0 until 300).flatMap(i =>
      strGen.apply(Gen.Parameters.default.withSize(1 + i % 40), Seed(i.toLong)))
    assert(batch.size === 300) // the generator never discards
    bothWays(batch)
  }

  test("null propagates") {
    import spark.implicits._
    val out = Seq[String](null, "a b").toDF("text")
      .select(WhitespaceTokens.tokens(col("text")).as("t")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[String](0) === Seq("a", "b"))
  }

  test("SQL registration ws_tokens works and matches") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT ws_tokens('  Foo\tBAR  ') AS t").collect().head
    assert(r.getSeq[String](0) === Seq("foo", "bar"))
  }
}
