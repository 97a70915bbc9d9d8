package graft

import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** The salted join must produce exactly the plain equi-join's multiset —
  * every skewed-side row matches the replicated side on exactly one salt.
  */
class SaltedJoinSpec extends SparkSpec {

  import spark.implicits._

  // heavy planted skew: 90% of fact rows share key 7; dims are small
  private lazy val fact = (0 until 2000).map { n =>
    (n.toLong, if (n % 10 == 0) (n / 10).toLong % 20 else 7L, n * 1.5)
  }.toDF("fid", "k", "v")

  private lazy val dim = (0 until 20).map(n => (n.toLong, s"name_$n"))
    .toDF("k", "k_name")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
    df.select("fid", "k", "k_name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted

  test("salted join equals the plain join multiset, across salt counts") {
    val plain = rows(fact.join(dim, Seq("k")))
    for (salts <- Seq(1, 4, 16)) {
      assert(rows(SaltedJoin.join(fact, dim, Seq("k"), salts)) === plain,
        s"salts=$salts diverged from the plain join")
    }
  }

  test("duplicate fact rows keep bag semantics through the salt") {
    // whatever salts duplicates get, the join must still emit both copies
    // (salting dedups nothing)
    val dup = fact.unionAll(fact.where(col("fid") === 7))
    val plain = rows(dup.join(dim, Seq("k")))
    assert(rows(SaltedJoin.join(dup, dim, Seq("k"), 8)) === plain)
  }

  test("a hot key of byte-identical rows still spreads across salts") {
    // the degenerate skew shape: every row of the hot key is the SAME row
    // (key-only projection of a skewed fact). A content-only salt would
    // put all of them on one salt; the row-position component must spread
    // them across at least half the salt space.
    val salts = 16
    val identical = Seq.fill(4000)(7L).toDF("k").repartition(8)
    val distinctSalts = SaltedJoin.salted(identical, Seq("k"), salts)
      .select("__salt").distinct().count()
    assert(distinctSalts >= salts / 2,
      s"identical hot-key rows used only $distinctSalts of $salts salts")
    // and the joined multiset is still exact
    val plain = identical.join(dim, Seq("k")).count()
    assert(SaltedJoin.join(identical, dim, Seq("k"), salts).count() === plain)
  }

  test("content-salt mode is replay-deterministic and still exact") {
    val plain = rows(fact.join(dim, Seq("k")))
    assert(rows(SaltedJoin.join(fact, dim, Seq("k"), 8, positionSalt = false))
      === plain)
    // pure content hash: the same row always gets the same salt
    val s1 = SaltedJoin.salted(fact, Seq("k"), 8, positionSalt = false)
      .select("fid", "__salt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = SaltedJoin.salted(fact, Seq("k"), 8, positionSalt = false)
      .select("fid", "__salt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
  }
}
