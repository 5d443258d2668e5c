package graft.exec

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core._
import graft.io.{ParquetWarehouse, StagedUpload, StagingWriter}
import graft.sql.{CopyCredentials, CopySqlBuilder}

/** Load-lifecycle events (reference EventEmitter surface, SURVEY.md §2.6 O1:
  * `progress` / `error` / `done`). */
trait LoadListener {
  def onProgress(task: String, info: Map[String, String]): Unit = ()
  def onError(e: Throwable): Unit = ()
  def onDone(): Unit = ()
}
object LoadListener { object Silent extends LoadListener }

/** One load job — the Spark restatement of the reference's `RedshiftLoader`
  * lifecycle (SURVEY.md §3):
  *
  *   1. `addBody` stages each body to the staging FS immediately (the
  *      reference starts its S3 multipart upload at `addFile` time,
  *      RedshiftLoader.ts:135-193). Single-shot: bodies added after the load
  *      starts are warned and dropped (`_started` latch, :137-142, X5).
  *   2. `insert()` / `truncInsert()` / `upsert()` → manifest emission (L5),
  *      COPY/merge SQL assembly (L6) for external-warehouse deployments, and
  *      the NATIVE Spark execution of the load semantics against the
  *      warehouse (our engine's value-add; the reference delegates this to
  *      Redshift).
  *   3. Wrap-up: staging cleanup per policy (C1), listener events (O1).
  *      On failure: abort + policy-aware cleanup + `error` event (C2-C4).
  */
final class Loader(
    spark: SparkSession,
    cfg: LoaderConfig,
    warehouse: ParquetWarehouse,
    stagingRoot: String,
    executor: Option[SqlExecutor] = None,
    creds: CopyCredentials = CopyCredentials.None,
    listener: LoadListener = LoadListener.Silent,
    txnRunner: RetryingTxnRunner = new RetryingTxnRunner(),
    initialBodies: Seq[DataFrame] = Nil) {

  val jobTime: String = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd_HHmmss")
    .withZone(java.time.ZoneOffset.UTC)
    .format(java.time.Instant.now()) // reference's luxon jobTime, RedshiftLoader.ts:10-12
  val uuid: String = java.util.UUID.randomUUID().toString.take(8)

  private val staging = new StagingWriter(stagingRoot, cfg, jobTime, uuid)
  private val uploads = mutable.Buffer.empty[StagedUpload]
  private val bodies = mutable.Buffer.empty[DataFrame]
  private var started = false

  private def debug(msg: => String): Unit = if (cfg.debug) println(s"[graft] $msg")

  /** Stage one body now (upload-at-add, S4). Returns the staged file set, or
    * None if the job already started (warn-and-drop, X5).
    *
    * Progress granularity (O3): the reference streams byte-level
    * `managedUpload.on('progress')` events per upload (README.md:310-311,
    * RedshiftLoader.ts:147-151). Spark equivalent: a SparkListener
    * registered for the duration of this body's write job bridges each
    * task's output metrics into `uploadProgress` events as partitions
    * commit (task-level = one event per written part), and the
    * `uploadedFile` completion event carries exact per-file byte counts
    * from the committed files. The bridge sees task-ends of any job that
    * overlaps this write on the same SparkContext — Loader stages bodies
    * sequentially, so in practice that is this write. */
  def addBody(df: DataFrame, format: String = "json"): Option[StagedUpload] =
    if (started) {
      debug(s"addBody after start ignored")
      None
    } else {
      val idx = uploads.size
      val bridge = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val om = if (t.taskMetrics != null) t.taskMetrics.outputMetrics else null
          if (om != null && (om.bytesWritten > 0 || om.recordsWritten > 0))
            listener.onProgress("uploadProgress", Map(
              "index" -> idx.toString,
              "bytes" -> om.bytesWritten.toString,
              "records" -> om.recordsWritten.toString))
        }
      }
      spark.sparkContext.addSparkListener(bridge)
      val up =
        try staging.writeBody(df, idx, format, cfg.copySettings.gzip)
        finally {
          // Async bus: drain before deregistering or trailing task-end
          // events are dropped nondeterministically.
          org.apache.spark.graftshim.GraftScheduler.drainListenerBus(spark.sparkContext)
          spark.sparkContext.removeSparkListener(bridge)
        }
      uploads += up
      bodies += df
      val conf = spark.sparkContext.hadoopConfiguration
      val sizes = up.files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getName -> p.getFileSystem(conf).getFileStatus(p).getLen
      }
      listener.onProgress("uploadedFile", Map(
        "index" -> up.index.toString,
        "files" -> up.files.size.toString,
        "bytes" -> sizes.map(_._2).sum.toString) ++
        sizes.map { case (name, len) => s"bytes.$name" -> len.toString })
      Some(up)
    }

  def addBodies(dfs: Seq[DataFrame], format: String = "json"): Seq[StagedUpload] =
    dfs.flatMap(addBody(_, format))

  def insert(): String = start(LoadMode.Insert)
  def truncInsert(): String = start(LoadMode.TruncateInsert)
  def upsert(): String = start(LoadMode.Upsert)

  /** Cancel + immediate staging cleanup (C2/C3). */
  def abort(): Unit = {
    spark.sparkContext.cancelJobGroup(s"graft-load-$uuid")
    staging.deleteAll(sampleDf)
    listener.onProgress("aborted", Map.empty)
  }

  private def sampleDf: DataFrame =
    bodies.headOption.getOrElse(spark.range(0).toDF())

  private def start(mode: LoadMode): String = {
    require(uploads.nonEmpty, "no files added") // X6 assert, :277
    started = true
    try {
      spark.sparkContext.setJobGroup(s"graft-load-$uuid", s"graft load ${cfg.table}")
      // Manifest: atomic multi-file visibility (L5). Failure propagates
      // (quirk C6 intentionally not replicated).
      val manifestPath = staging.writeManifest(sampleDf, uploads.toSeq)
      listener.onProgress("uploadedManifest", Map("path" -> manifestPath))

      // External-warehouse SQL (the reference's whole job): assembled always,
      // executed only when an executor is configured.
      val q = CopySqlBuilder.makeQueries(cfg, mode, manifestPath, creds, jobTime, uuid)
      executor.foreach(e => txnRunner.run(e, q.q, q.cleanUp))

      // Native Spark execution of the load semantics (our engine).
      // `observe` piggybacks row/byte counters on the load job itself —
      // the reference's per-task progress events (O1) without a second
      // pass over the data.
      val observation = new org.apache.spark.sql.Observation(s"load-$uuid")
      val stagedDf = bodies.map(b => b.select(bodies.head.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*))
        .reduce(_ unionByName _)
        .observe(observation,
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows_loaded"))
      // X2 end-to-end: a lost concurrent-writer race (retryable
      // ConcurrentWriteException) re-runs the whole native load against
      // the new current version on the reference's 1 s·3ⁿ schedule —
      // two racing Loaders both land (core.ts:49-53 parity).
      warehouse.loadWithRetry(mode, cfg.table, stagedDf, cfg.idField)
      observation.getAsJava.forEach((k, v) =>
        listener.onProgress("loadedMetrics", Map(k -> String.valueOf(v))))

      wrapUp(success = true)
      listener.onProgress("done", Map.empty)
      listener.onDone()
      "SUCCESS"
    } catch {
      case e: Throwable =>
        listener.onError(e)
        wrapUp(success = false)
        throw e
    } finally spark.sparkContext.clearJobGroup()
  }

  // Constructor-time bodies (reference parity: `new RedshiftLoader(options)`
  // stages `options.body`/`options.bodies` immediately —
  // RedshiftLoader.ts:122): staged here exactly as explicit addBody calls,
  // same upload-at-add semantics and events.
  initialBodies.foreach(addBody(_))

  /** Staging cleanup per policy (C1: ALWAYS / SUCCESS / NEVER), then the
    * optional auto-compaction hook: after a SUCCESSFUL load leaves the
    * live version fragmented past `maxFiles`, rewrite it to
    * `targetFiles` (z-order-clustered when configured) — small
    * incremental appends are the normal ingest shape, and without this
    * the file count grows per load until scan planning degrades. Same
    * atomic version swap as the load itself. */
  private def wrapUp(success: Boolean): Unit = {
    val doClean = cfg.cleanup match {
      case CleanupPolicy.Always    => true
      case CleanupPolicy.OnSuccess => success
      case CleanupPolicy.Never     => false
    }
    if (doClean) {
      staging.deleteAll(sampleDf)
      listener.onProgress("deleteObjects", Map("dir" -> staging.jobDir))
    }
    if (success) cfg.autoCompact.foreach { ac =>
      val before = warehouse.dataFiles(cfg.table).size
      if (before > ac.maxFiles) {
        ac.zorderBy match {
          case Some((x, y)) => warehouse.compactZorder(cfg.table, x, y, ac.targetFiles)
          case None         => warehouse.compact(cfg.table, ac.targetFiles)
        }
        listener.onProgress("compacted", Map(
          "table" -> cfg.table.qualified,
          "filesBefore" -> before.toString,
          "filesAfter" -> warehouse.dataFiles(cfg.table).size.toString))
      }
    }
  }
}
