package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access — one parquet per table under the sf dir
  * (/root/repo/TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects (PARQUET_TYPE_ILLEGAL). We read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild the µs timestamp
  * with integer `div` (double division would lose precision above 2^53).
  * The testdata has no sub-µs components, so this is lossless and matches
  * what DuckDB sees.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
