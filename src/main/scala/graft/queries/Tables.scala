package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver-generated parquet tables.
  *
  * The only quirk: `events.ts` is written as parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We
  * flip `spark.sql.legacy.parquet.nanosAsLong` (runtime-settable) so nanos
  * arrive as LongType, then rebuild a proper TimestampType column by
  * truncating to micros — exactly what DuckDB does when it reads ns into its
  * us-precision TIMESTAMP, so the two engines agree on every derived value.
  * All other tables carry ms-precision timestamps that read natively as
  * TIMESTAMP_NTZ.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
