package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Round-16 follow-up to S09ProfileExperiment: after the 32→8 store fix,
  * the drain floor at sf0.1 is per-batch machinery (s09's no-data
  * watermark batch alone profiles ~0.99s). This sweeps the remaining
  * store-count ladder (2/4/8) at sf0.1 for s07/s08/s09 to decide the
  * sub-4MB floor, and separates query start + sink copy from batch time.
  * Run: sbt -batch "Test/runMain graft.S07FloorExperiment /root/testdata/sf0.1"
  */
object S07FloorExperiment {

  private def time[A](label: String)(body: => A): Unit = {
    val t0 = System.nanoTime()
    body
    println(f"[floor] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.streams.resetTerminated()
    }

    def s09(stores: Int): Unit = {
      time(s"s09 stores=$stores") {
        Streams.runToMemory(spark,
          Streams.hourlyActiveUsers(Streams.eventsStream(spark, dir)),
          s"s09f_${System.nanoTime()}", mode = "append",
          statePartitions = Some(stores))
      }
      cleanup()
    }
    def s07(stores: Int): Unit = {
      time(s"s07 stores=$stores") {
        val events = Streams.eventsStream(spark, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[Streams.EventRow]
        Streams.withRocksDBStateStore(spark) {
          Streams.runToMemory(spark, Streams.runningTotals(events).toDF(),
            s"s07f_${System.nanoTime()}", mode = "update",
            statePartitions = Some(stores))
        }
      }
      cleanup()
    }
    def s08(stores: Int): Unit = {
      time(s"s08 stores=$stores") {
        val events = Streams.eventsStream(spark, dir)
          .withWatermark("ts", "10 minutes")
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[Streams.EventRow]
        Streams.withRocksDBStateStore(spark) {
          Streams.runToMemory(spark,
            Streams.inactiveUsers(events, gapSec = 3600).toDF(),
            s"s08f_${System.nanoTime()}", mode = "append",
            statePartitions = Some(stores))
        }
      }
      cleanup()
    }

    def withConf[A](key: String, v: String)(body: => A): A = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, v)
      try body
      finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None    => spark.conf.unset(key)
      }
    }
    val Changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

    // warm the session + codegen once per shape, untimed
    s09(8); s07(8); s08(8)
    for (rep <- 1 to 3; st <- Seq(2, 4, 8)) {
      s09(st); s07(st); s08(st)
      locally(rep)
    }
    // RocksDB commit shape: full-snapshot (default) vs changelog append
    for (_ <- 1 to 4) {
      print("[floor] default  : "); s07(8); print("[floor] default  : "); s08(8)
      withConf(Changelog, "true") {
        print("[floor] changelog: "); s07(8)
        print("[floor] changelog: "); s08(8)
      }
    }
    spark.stop()
  }
}
