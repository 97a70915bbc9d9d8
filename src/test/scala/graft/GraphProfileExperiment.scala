package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Primitive-cost profile for the g10 frontier Bellman-Ford at a given SF
  * dir: times (warm) the bare edge scan, the cache populate, a cached
  * re-scan, an isin-filtered re-scan, and the full current
  * weightedDistanceLong — the attribution numbers the round-13 rework of
  * the small-frontier regime is designed against.
  *
  * Run: sbt -batch "Test/runMain graft.GraphProfileExperiment /tmp/sf1"
  * Not a ScalaTest suite — wall-clock assertions flake; numbers land in
  * scaladoc/SURVEY.
  */
object GraphProfileExperiment {

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def time[A](label: String)(body: => A): A = {
    val g0 = gcMillis
    val t0 = System.nanoTime()
    val r = body
    val el = (System.nanoTime() - t0) / 1e9
    println(f"[prof] $label: $el%.3f s (gc ${(gcMillis - g0) / 1e3}%.2f s)")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges: DataFrame = {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      orders.select((col("o_custkey") * 4).as("src"),
          (col("o_orderkey") * 4 + 1).as("dst"), lit(1.0).as("weight"))
        .unionByName(li.select((col("l_orderkey") * 4 + 1).as("src"),
          (col("l_partkey") * 4 + 2).as("dst"),
          col("l_quantity").cast("double").as("weight")))
    }
    def undirected: DataFrame = {
      val f = edges
      f.unionByName(f.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    }

    def undirectedExplode: DataFrame = {
      val f = edges
      f.select(explode(array(
          struct(col("src"), col("dst"), col("weight")),
          struct(col("dst").as("src"), col("src").as("dst"), col("weight")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.weight").as("weight"))
    }

    // warm the page cache / JIT
    noop(undirected)
    noop(undirectedExplode)
    (1 to 2).foreach { rep =>
      time(s"explode undirected scan (rep $rep)")(noop(undirectedExplode))
    }
    (1 to 2).foreach { rep =>
      time(s"explode undirected + bhj probe (rep $rep)") {
        import spark.implicits._
        val fr = Seq((1L, 0.0)).toDF("src", "fdist")
        noop(undirectedExplode.join(broadcast(fr), Seq("src"))
          .select(col("dst").as("vid"), (col("fdist") + col("weight")).as("cand"))
          .groupBy(col("vid")).agg(min(col("cand")).as("cand")))
      }
      time(s"union undirected + bhj probe (rep $rep)") {
        import spark.implicits._
        val fr = Seq((1L, 0.0)).toDF("src", "fdist")
        noop(undirected.join(broadcast(fr), Seq("src"))
          .select(col("dst").as("vid"), (col("fdist") + col("weight")).as("cand"))
          .groupBy(col("vid")).agg(min(col("cand")).as("cand")))
      }
    }
    (1 to 2).foreach { rep =>
      time(s"bare undirected scan (rep $rep)")(noop(undirected))
    }
    time("isin-filtered parquet scan (40 ids)") {
      noop(undirected.where(col("src").isin((0L until 40L).map(_ * 4 + 1): _*)))
    }
    val cached = undirected.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    time("cache populate (count)")(cached.count())
    (1 to 2).foreach { rep =>
      time(s"cached re-scan (rep $rep)")(noop(cached))
    }
    time("cached isin re-scan (40 ids)") {
      noop(cached.where(col("src").isin((0L until 40L).map(_ * 4 + 1): _*)))
    }
    cached.unpersist(blocking = true)
    (1 to 3).foreach { rep =>
      time(s"weightedDistanceLong current (rep $rep)") {
        noop(graft.graph.GraphAlgos.weightedDistanceLong(edges, 0L, 3))
      }
    }
    (1 to 3).foreach { rep =>
      time(s"full g10 query via SparkEntry (rep $rep)") {
        noop(SparkEntry.queries("g10_weighted_sssp")(spark, dir))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // bench-context replica: sentinel q06 twice + cleanup between reps
    (1 to 3).foreach { rep =>
      (1 to 2).foreach { _ =>
        noop(SparkEntry.queries("q06_scalar_agg")(spark, dir))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      time(s"g10 after sentinel (rep $rep)") {
        noop(SparkEntry.queries("g10_weighted_sssp")(spark, dir))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    // inline replica of the round-13 algorithm with per-phase timing
    {
      import spark.implicits._
      val seed = Seq((0L, 0.0)).toDF("vid", "dist")
      var improveds = List.empty[DataFrame]
      def distSoFar: DataFrame = improveds
        .foldLeft(seed)(_ unionByName _)
        .groupBy(col("vid")).agg(min(col("dist")).as("dist"))
      var frontier = seed
      var i = 0
      time("inline total") {
        while (i < 3) {
          val fr = frontier.select(col("vid").as("src"), col("dist").as("fdist"))
          val joined = undirected.join(broadcast(fr), Seq("src"))
          val msgs = joined
            .select(col("dst").as("vid"), (col("fdist") + col("weight")).as("cand"))
            .groupBy(col("vid")).agg(min(col("cand")).as("cand"))
          val improved = time(s"round $i improved ckpt") {
            msgs.join(distSoFar.withColumnRenamed("dist", "old"), Seq("vid"), "left")
              .where(col("old").isNull || col("cand") < col("old"))
              .select(col("vid"), col("cand").as("dist"))
              .localCheckpoint(true)
          }
          val n = time(s"round $i count")(improved.count())
          println(s"[prof] round $i frontier rows: $n")
          improveds ::= improved
          frontier = improved
          i += 1
        }
        val result = time("final collapse ckpt")(distSoFar.localCheckpoint(true))
        time("final output noop")(noop(result))
      }
    }
    spark.stop()
  }
}
