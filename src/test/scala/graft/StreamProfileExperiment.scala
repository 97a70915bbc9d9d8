package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Attribution profile for the s05 builtin session_window drain at a
  * given SF dir: batch session_window (no streaming machinery), the
  * streaming drain at several state-store widths, and the memory-sink
  * copy — the numbers behind the round-13 s05 gate work.
  *
  * Run: sbt -batch "Test/runMain graft.StreamProfileExperiment /tmp/sf1"
  */
object StreamProfileExperiment {

  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.streams.resetTerminated()
    }

    // batch form of the same aggregation: no state store, no micro-batch
    def batchAgg: DataFrame =
      graft.queries.Tables.normalizeEventTs(
          spark.read.parquet(s"$dir/events.parquet"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("session_value"))

    noop(batchAgg) // warm
    (1 to 2).foreach(rep => time(s"batch session_window (rep $rep)")(noop(batchAgg)))
    println(s"[prof] session rows: ${batchAgg.count()}")

    def drain(stores: Int, label: String): Unit = {
      val sw = Streams.eventsStream(spark, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("session_value"))
      val name = s"sprof_${System.nanoTime()}"
      val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", stores.toString)
      time(label) {
        val q = sw.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          val d = p.durationMs
          println(s"[prof]   batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durations=$d stateRows=${p.stateOperators.headOption.map(_.numRowsTotal)} " +
            s"commitMs=${p.stateOperators.headOption.map(_.commitTimeMs)}")
        }
        val out = spark.table(name)
        time(s"$label memory-sink copy") {
          noop(out.localCheckpoint(true))
        }
        spark.catalog.dropTempView(name)
      }
      prev.foreach(spark.conf.set("spark.sql.shuffle.partitions", _))
      cleanup()
    }

    drain(32, "drain warmup (32 stores)")
    Seq(8, 32).foreach { k =>
      drain(k, s"drain $k stores")
    }

    // A/B: parquet file sink (distributed write, no driver collect)
    def drainFile(stores: Int, label: String): Unit = {
      val sw = Streams.eventsStream(spark, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("session_value"))
      val out = s"/tmp/sprof_file_${System.nanoTime()}"
      val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", stores.toString)
      time(label) {
        val q = sw.writeStream.format("parquet")
          .option("path", s"$out/data")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        time(s"$label read-back") {
          noop(spark.read.parquet(s"$out/data"))
        }
      }
      prev.foreach(spark.conf.set("spark.sql.shuffle.partitions", _))
      cleanup()
    }
    drainFile(32, "file-sink drain warmup (32 stores)")
    Seq(8, 32).foreach(k => drainFile(k, s"file-sink drain $k stores"))
    spark.stop()
  }
}
