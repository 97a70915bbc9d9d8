package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Phase attribution for the s09 chained-agg drain (and s08 timers) at a
  * given SF dir — which part of the micro-batch machinery costs what:
  * source probe, query start, per-batch execution (from the streaming
  * progress log), sink copy. Run:
  *   sbt -batch "Test/runMain graft.S09ProfileExperiment /tmp/sf1"
  */
object S09ProfileExperiment {

  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

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

    val progress = new scala.collection.mutable.ArrayBuffer[String]
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        progress += f"batch=${p.batchId} rows=${p.numInputRows} " +
          f"total=${p.batchDuration}ms add=${p.durationMs.get("addBatch")} " +
          f"getBatch=${p.durationMs.get("getBatch")} latestOffset=${p.durationMs.get("latestOffset")} " +
          f"queryPlanning=${p.durationMs.get("queryPlanning")} walCommit=${p.durationMs.get("walCommit")} " +
          f"commitOffsets=${p.durationMs.get("commitOffsets")} triggerExecution=${p.durationMs.get("triggerExecution")}"
      }
    })

    def runS09(label: String, stores: Int, provider: Option[String]): Unit = {
      progress.clear()
      time(label) {
        val out = Streams.runToMemory(spark,
          Streams.hourlyActiveUsers(Streams.eventsStream(spark, dir)),
          s"s09prof_${System.nanoTime()}", mode = "append",
          stateStoreProvider = provider,
          statePartitions = Some(stores))
        out.write.format("noop").mode("overwrite").save()
      }
      Thread.sleep(300) // let async listener drain
      progress.foreach(p => println(s"[prof]   $p"))
      cleanup()
    }

    def runS08(label: String, stores: Int): Unit = {
      import spark.implicits._
      progress.clear()
      time(label) {
        val events = Streams.eventsStream(spark, dir)
          .withWatermark("ts", "10 minutes")
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[Streams.EventRow]
        val out = Streams.withRocksDBStateStore(spark) {
          Streams.runToMemory(spark, Streams.inactiveUsers(events, gapSec = 3600).toDF(),
            s"s08prof_${System.nanoTime()}", mode = "append",
            statePartitions = Some(stores),
            resultSink = Streams.resultSinkForSource(spark, s"$dir/events.parquet"))
        }
        out.write.format("noop").mode("overwrite").save()
      }
      Thread.sleep(300)
      progress.foreach(p => println(s"[prof]   $p"))
      cleanup()
    }

    // sub-phases of the setup path
    time("eventsStream construction (probe + assert)") {
      Streams.eventsStream(spark, dir)
    }
    time("storesForSource") {
      Streams.storesForSource(spark, s"$dir/events.parquet")
    }
    time("backendForSource") {
      Streams.backendForSource(spark, s"$dir/events.parquet")
    }

    def runS07(label: String, stores: Int): Unit = {
      import spark.implicits._
      progress.clear()
      time(label) {
        val events = Streams.eventsStream(spark, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[Streams.EventRow]
        val out = Streams.withRocksDBStateStore(spark) {
          Streams.runToMemory(spark, Streams.runningTotals(events).toDF(),
            s"s07prof_${System.nanoTime()}", mode = "update",
            statePartitions = Some(stores))
        }
        out.write.format("noop").mode("overwrite").save()
      }
      cleanup()
    }
    def runS05(label: String, stores: Int): Unit = {
      progress.clear()
      time(label) {
        val sw = Streams.eventsStream(spark, dir)
          .withWatermark("ts", "10 minutes")
          .groupBy(col("user_id"), org.apache.spark.sql.functions.session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("session_value"))
          .select(col("user_id"),
            date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
            col("n_events"), col("session_value"))
        val out = Streams.runToMemory(spark, sw,
          s"s05prof_${System.nanoTime()}", mode = "append",
          stateStoreProvider = Streams.backendForSource(spark, s"$dir/events.parquet"),
          statePartitions = Some(stores),
          resultSink = Streams.resultSinkForSource(spark, s"$dir/events.parquet"))
        out.write.format("noop").mode("overwrite").save()
      }
      cleanup()
    }
    def withMpb[A](bytes: Long)(body: => A): A = {
      val key = "spark.sql.files.maxPartitionBytes"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, bytes.toString)
      try body finally prev match {
        case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key)
      }
    }
    runS09("s09 warm-0", 32, None)
    runS09("s09 8-mem", 8, None)
    withMpb(2L << 20)(runS09("s09 8-mem mpb2M", 8, None))
    withMpb(1L << 20)(runS09("s09 8-mem mpb1M", 8, None))
    withMpb(2L << 20)(runS09("s09 8-mem mpb2M rep2", 8, None))
    runS08("s08 warm-0", 32)
    runS08("s08 8", 8)
    withMpb(2L << 20)(runS08("s08 8 mpb2M", 8))
    withMpb(2L << 20)(runS08("s08 8 mpb2M rep2", 8))
    runS07("s07 8", 8)
    withMpb(2L << 20)(runS07("s07 8 mpb2M", 8))
    runS05("s05 8", 8)
    withMpb(2L << 20)(runS05("s05 8 mpb2M", 8))
    spark.stop()
  }
}
