package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Retrieval

/** Phase attribution for the s14 streaming BM25 ingest gate — the
  * numbers behind the round-14 "trim the fixed part" task. Replays
  * [[graft.streaming.Streams.bm25Ingest]]'s exact phases with timers:
  *
  *   1. base-index stage (NOT in the gate's timed path — the query
  *      wrapper stages once per sf dir and caches),
  *   2. input staging (ordered parquet for the file-stream source),
  *   3. the drain: 2 ticks × (stageBm25Index + 3 gen writes),
  *   4. layered read (base + overlay union),
  *   5. the serving query (bm25TopKStaged + result materialization).
  *
  * Run: sbt -batch "Test/runMain graft.S14ProfileExperiment /root/testdata/sf0.1"
  */
object S14ProfileExperiment {

  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
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

    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val split = docs.agg(max(col("doc_id"))).head().getLong(0) - 249L
    val queries = docs.where(col("doc_id") % 100 === 0)

    val baseDir = java.nio.file.Files.createTempDirectory("s14prof_base_").toString
    time("base stage (outside the gate's timed path)") {
      Retrieval.stageBm25Index(docs.where(col("doc_id") < split), "doc_id", "text")
        .write(baseDir)
    }

    (1 to 3).foreach { rep =>
      val batch = docs.where(col("doc_id") >= split)
      val work = java.nio.file.Files.createTempDirectory("s14prof_").toString
      val overlay = s"$work/overlay"
      time(s"rep $rep TOTAL") {
        time(s"rep $rep  meta check") {
          val tokVer = spark.read.parquet(s"$baseDir/meta")
            .select(col("tokenizer_version")).head().getInt(0)
          require(tokVer == graft.dedup.Dedup.TokenizerVersion)
        }
        val inputDir = time(s"rep $rep  input staging") {
          graft.streaming.Streams.stageOrderedInput(batch, "doc_id", work, 2)
        }
        time(s"rep $rep  drain (2 ticks)") {
          val q = spark.readStream
            .schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inputDir.toString)
            .writeStream
            .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
              if (!mb.isEmpty) time(s"rep $rep    tick $batchId fold") {
                val delta = Retrieval.stageBm25Index(mb.toDF(), "doc_id", "text")
                Retrieval.StagedBm25Index.writeGen(
                  delta.postings, s"$overlay/postings", batchId + 1)
                Retrieval.StagedBm25Index.writeGen(
                  delta.termDf, s"$overlay/term_df", batchId + 1)
                Retrieval.StagedBm25Index.writeGen(
                  delta.stats, s"$overlay/stats", batchId + 1)
                graft.Pinned.free(delta.postings)
              }
            }
            .option("checkpointLocation", s"$work/ckpt")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        val idx = time(s"rep $rep  layered read") {
          val base = Retrieval.StagedBm25Index.read(spark, baseDir)
          Retrieval.StagedBm25Index(
            base.postings.unionByName(
              Retrieval.StagedBm25Index.readGens(spark, s"$overlay/postings")),
            base.termDf.unionByName(
              Retrieval.StagedBm25Index.readGens(spark, s"$overlay/term_df")),
            base.stats.unionByName(
              Retrieval.StagedBm25Index.readGens(spark, s"$overlay/stats")),
            base.meta)
        }
        // serve sub-pieces, then the real thing
        val qT = queries.select(col("doc_id").as("query_id"),
          explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("term"))
        val vocab = time(s"rep $rep    serve: vocab collect") {
          qT.select(col("term")).distinct().limit(1001).collect().map(_.getString(0))
        }
        time(s"rep $rep    serve: pruned postings scan") {
          idx.postings.where(col("term").between(vocab.min, vocab.max) &&
            col("term").isin(vocab.toSeq: _*)).count()
        }
        time(s"rep $rep    serve: dfq agg") {
          idx.termDf.where(col("term").isin(vocab.toSeq: _*))
            .groupBy(col("term")).agg(sum(col("df"))).count()
        }
        time(s"rep $rep    serve: stats agg") {
          idx.stats.agg(sum(col("n_docs")), sum(col("sum_dl"))).collect()
        }
        time(s"rep $rep  serve (bm25TopKStaged + materialize)") {
          val out = Retrieval.bm25TopKStaged(idx, queries, "doc_id", "text",
            k = 10).localCheckpoint(true)
          println(s"[prof] rep $rep rows: ${out.count()}")
          graft.Pinned.free(out)
        }
      }
    }
  }
}
