package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access — one parquet per table under the sf dir
  * (/root/repo/TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
