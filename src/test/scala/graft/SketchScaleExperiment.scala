package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** The measured scale step for the CMS-prefiltered heavy-hitters operator
  * (t30): does dropping the tail BEFORE the aggregation actually beat the
  * naive global groupBy once the vocabulary is large?
  *
  * Synthetic keyed rows with a planted head/tail split: 20% of rows draw
  * one of 100 head keys (~n/500 occurrences each), 80% draw from a
  * 5M-key tail (~8 occurrences each at n=50M). The threshold (0.1% of
  * rows) admits exactly the head. The naive plan's partial aggregation
  * must hash every tail key per partition and shuffle |vocab|-ish partial
  * rows; the sketched plan's prefilter discards tail rows at the scan, so
  * both the map-side hash table and the exchange only ever see
  * head + CMS-false-positive rows.
  *
  * Both paths must return IDENTICAL results (asserted) — the experiment
  * grades cost, never answers.
  *
  * Run: sbt -batch "Test/runMain graft.SketchScaleExperiment [5000000,50000000]"
  * Prints `[scale] <label>: <sec>` lines; numbers recorded in SURVEY §8.
  * Not a ScalaTest suite — wall-clock assertions flake; the grading is
  * the recorded ratio.
  */
object SketchScaleExperiment {

  /** Deterministic skewed keys: row i is head key `h<hash mod 100>` with
    * probability 1/5, else tail key `t<hash mod 5M>`.
    */
  private def syn(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      when(pmod(hash(col("id"), lit(7)), lit(5)) === 0,
        concat(lit("h"), pmod(hash(col("id")), lit(100)).cast("string")))
        .otherwise(
          concat(lit("t"), pmod(hash(col("id"), lit(13)), lit(5000000)).cast("string")))
        .as("term"))

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(f"[scale] $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(5000000L, 50000000L))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "target/spark-tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      val keyed = syn(spark, n).repartition(32).localCheckpoint(true)
      val threshold = n / 1000 // 0.1% of rows: admits the ~n/500 head keys
      println(s"[scale] --- n=$n threshold=$threshold ---")

      val naive = time(s"naive_groupby n=$n")(
        keyed.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= threshold)
          .localCheckpoint(true))

      val sketched = time(s"cms_prefiltered n=$n")(
        Sketch.heavyHitters(keyed, "term", threshold)
          .localCheckpoint(true))

      val nv = naive.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val sk = sketched.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      require(nv == sk, s"sketched != naive at n=$n: " +
        s"only-naive=${(nv -- sk).take(3)} only-sketched=${(sk -- nv).take(3)}")
      println(s"[scale] heavy keys: ${nv.size} (identical across paths)")
    }
    spark.stop()
  }
}
