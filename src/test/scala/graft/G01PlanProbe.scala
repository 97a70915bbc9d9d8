package graft

import org.apache.spark.sql.SparkSession

/** One-off: dump g01's formatted plan at a given SF dir and time reps.
  * Run: sbt -batch "Test/runMain graft.G01PlanProbe /tmp/sf1"
  */
object G01PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("g01_two_hop_traversal")(spark, dir)
    df.collect()
    df.explain("formatted") // post-execution: final adaptive plan
    (1 to 4).foreach { rep =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] g01 rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
