package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.{LoadMode, TableRef}
import graft.io.ParquetWarehouse

/** Structured Streaming restatement of the reference's incremental-arrival
  * model (SURVEY.md §2.1 S4, §7.2 M5): the reference starts an S3 upload
  * per `addFile` and loads everything present at `insert()` time; here a
  * file-source stream picks up files as they land and
  * `Trigger.AvailableNow` makes one load pass over everything available —
  * files arriving after the trigger boundary wait for the next run (the
  * reference's `_started` latch warn-and-drop becomes "picked up next
  * run": strictly better, nothing is lost).
  *
  * Scale notes: `maxFilesPerTrigger` is the backpressure control (the
  * reference's generator backpressure, utils.ts:53-55); foreachBatch
  * executes the merge as a normal distributed job per micro-batch.
  */
object StreamingLoad {

  /** Stream NDJSON files from `srcDir` into `table` with upsert semantics
    * per micro-batch. Runs until no more files are available, then stops
    * (AvailableNow). */
  def fileStreamUpsert(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      warehouse: ParquetWarehouse,
      table: TableRef,
      idField: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).json(srcDir)
    src.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        warehouse.load(LoadMode.Upsert, table, batch, idField)
      }
      .start()
  }

  /** Event-time windowed aggregation with a watermark — the streaming
    * form of [[graft.operators.AnalyticOps.tumblingAgg]] (same expression
    * tree; late rows beyond the watermark are dropped instead of
    * recomputed). */
  def windowedCounts(
      stream: DataFrame, ts: String, width: String, watermark: String): DataFrame =
    stream
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Continuous (non-AvailableNow) variant for long-running ingest: same
    * upsert semantics on a processing-time cadence. */
  def fileStreamUpsertContinuous(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      warehouse: ParquetWarehouse,
      table: TableRef,
      idField: String,
      checkpointDir: String,
      intervalMs: Long): StreamingQuery = {
    spark.readStream.schema(schema).json(srcDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        warehouse.load(LoadMode.Upsert, table, batch, idField)
      }
      .start()
  }
}
