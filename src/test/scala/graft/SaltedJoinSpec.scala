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
      // forceSalt pins the salted plan — these tiny dims would otherwise
      // (correctly) dispatch to a plain broadcast join and test nothing
      assert(rows(SaltedJoin.join(fact, dim, Seq("k"), salts,
        forceSalt = true)) === plain,
        s"salts=$salts diverged from the plain join")
    }
  }

  test("duplicate fact rows keep bag semantics through the salt") {
    // whatever salts duplicates get, the join must still emit both copies
    // (salting dedups nothing)
    val dup = fact.unionAll(fact.where(col("fid") === 7))
    val plain = rows(dup.join(dim, Seq("k")))
    assert(rows(SaltedJoin.join(dup, dim, Seq("k"), 8, forceSalt = true))
      === plain)
  }

  test("dispatch guard: a broadcastable dim skips salting entirely") {
    // the operator's own cost model: salting a broadcastable join is pure
    // overhead — the dispatcher must plan a broadcast join with no salt
    // replication, and still produce the identical multiset
    val auto = SaltedJoin.join(fact, dim, Seq("k"))
    val phys = auto.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"small dim should broadcast, got:\n$phys")
    assert(!phys.contains("__salt"), "broadcast dispatch must not salt")
    assert(rows(auto) === rows(fact.join(dim, Seq("k"))))
    // and the guard itself reads the session threshold: disabling
    // broadcast re-enables salting
    val sess = fact.sparkSession
    val saved = sess.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!SaltedJoin.broadcastable(dim))
      val forced = SaltedJoin.join(fact, dim, Seq("k"))
      assert(forced.queryExecution.optimizedPlan.toString.contains("__salt"),
        "with broadcast disabled the dispatcher must salt")
    } finally sess.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
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
    assert(SaltedJoin.join(identical, dim, Seq("k"), salts,
      forceSalt = true).count() === plain)
  }

  test("content-salt mode is replay-deterministic and still exact") {
    val plain = rows(fact.join(dim, Seq("k")))
    assert(rows(SaltedJoin.join(fact, dim, Seq("k"), 8, positionSalt = false,
      forceSalt = true)) === plain)
    // pure content hash: the same row always gets the same salt
    val s1 = SaltedJoin.salted(fact, Seq("k"), 8, positionSalt = false)
      .select("fid", "__salt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = SaltedJoin.salted(fact, Seq("k"), 8, positionSalt = false)
      .select("fid", "__salt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
  }
}
