package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSignature, SignBucketHash}
import graft.functions.VectorFunctions._

/** The SQL-surface contract: every custom Catalyst expression is callable
  * from pure SQL, through BOTH installation paths —
  * `spark.sql.extensions=graft.GraftExtensions` at session construction and
  * `GraftExtensions.register` on a live session — and is bit-identical to
  * its Column facade (same expression class, so anything else would be a
  * registration bug, which is exactly what this guards).
  */
class GraftExtensionsSpec extends SparkSpec {

  /** A second session on the shared context, built THROUGH the extensions
    * installer — `withExtensions(new GraftExtensions)`, the same
    * `SparkSessionExtensions => Unit` contract `spark.sql.extensions=
    * graft.GraftExtensions` invokes reflectively at spark-submit (that
    * conf is STATIC: it only applies when the SparkContext itself is
    * built with it, which a test JVM sharing one context cannot redo —
    * so the class-as-installer is what's exercisable, and is the whole
    * surface the conf adds). `create()` (not getOrCreate) forces a fresh
    * session so the injection actually runs.
    */
  private lazy val extSession: SparkSession = {
    // force the SHARED session into existence first: if this extensions
    // session is the JVM's first, getOrCreate elsewhere would silently
    // adopt it as the default — and the no-extensions control sessions
    // below would resolve the catalog they must not see
    locally(spark)
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .create()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("the SparkSessionExtensions installer provides the full SQL catalog") {
    val row = extSession.sql(
      """SELECT vec_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
                        CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d,
                vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>),
                           CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>)) AS c,
                vec_norm(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS n,
                length(vec_quantize_int8(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>))) AS qlen,
                simhash64(array('a', 'b')) AS sh,
                size(minhash_signature(array('a', 'b', 'c'), 4, 2)) AS mh,
                sign_bucket(CAST(array(1.0, -1.0) AS ARRAY<DOUBLE>), 8, 42L, 2) AS sb,
                size(cdc_chunks(array('a', 'b', 'c', 'd'), 2)) AS cc
      """).collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getDouble(2) == 5.0)
    assert(row.getInt(3) == 2)
    assert(row.getInt(5) == 4)
    assert(row.getInt(7) >= 1) // cdc_chunks: every non-empty input chunks
    // catalog metadata is queryable too (DESCRIBE names the impl class)
    val desc = extSession.sql("DESCRIBE FUNCTION vec_cosine")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("CosineSimilarity"), desc)
  }

  test("SQL calls are bit-identical to the Column facade on fixture data") {
    val emb = extSession.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = extSession.sql(
      """SELECT vec_id, vec_norm(embedding) AS n,
                vec_dot(embedding, embedding) AS d,
                vec_quantize_int8(embedding) AS q,
                sign_bucket(embedding, 8, 42L, 64) AS sb
         FROM ext_emb""").collect()
    val viaCol = emb.select(col("vec_id"), vec_norm(col("embedding")).as("n"),
        vec_dot(col("embedding"), col("embedding")).as("d"),
        vec_quantize_int8(col("embedding")).as("q"),
        SignBucketHash.signBucket(col("embedding"), 8, 42L, 64).as("sb"))
      .collect()
    val sqlById = viaSql.map(r => r.getLong(0) -> r).toMap
    assert(viaCol.nonEmpty && viaCol.length == viaSql.length)
    viaCol.foreach { r =>
      val s = sqlById(r.getLong(0))
      // == on doubles: bit-identical, not approximately-equal — same
      // expression class must produce the same bits
      assert(r.getDouble(1) == s.getDouble(1) && r.getDouble(2) == s.getDouble(2))
      assert(r.getAs[Array[Byte]](3).sameElements(s.getAs[Array[Byte]](3)))
      assert(r.getLong(4) == s.getLong(4))
    }

    val docs = extSession.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(50).select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    docs.createOrReplaceTempView("ext_docs")
    val mhSql = extSession.sql(
      """SELECT doc_id, minhash_signature(toks, 16, 3) AS mh,
                simhash64(toks) AS sh
         FROM ext_docs""").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    docs.select(col("doc_id"),
        MinHashSignature.minhashSig(col("toks"), 16, 3).as("mh"),
        graft.functions.VectorFunctions.simhash64(col("toks")).as("sh"))
      .collect().foreach { r =>
        val (mh, sh) = mhSql(r.getLong(0))
        assert(r.getSeq[Long](1) == mh && r.getLong(2) == sh)
      }
  }

  test("register() installs into a live session; sibling sessions are untouched") {
    val live = spark.newSession()
    // not registered yet → unresolved function at analysis
    intercept[AnalysisException] {
      live.sql("SELECT vec_norm(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>))").collect()
    }
    GraftExtensions.register(live)
    assert(live.sql("SELECT vec_norm(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS n")
      .collect()(0).getDouble(0) == 5.0)
    // registration is SESSION state: a sibling built afterwards has no catalog
    val sibling = spark.newSession()
    intercept[AnalysisException] {
      sibling.sql("SELECT vec_norm(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>))").collect()
    }
  }

  test("wrong arity and non-literal hyper-parameters fail with the signature") {
    val e1 = intercept[Exception] {
      extSession.sql("SELECT vec_dot(CAST(array(1.0) AS ARRAY<DOUBLE>))").collect()
    }
    assert(e1.getMessage.contains("vec_dot expects 2 arguments"), e1.getMessage)
    val e2 = intercept[Exception] {
      extSession.sql(
        """SELECT minhash_signature(array('a'), CAST(id AS INT), 2)
           FROM range(1)""").collect()
    }
    assert(e2.getMessage.contains("must be an integer literal"), e2.getMessage)
  }
}
