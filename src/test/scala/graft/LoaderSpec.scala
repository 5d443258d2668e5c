package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.exec._
import graft.io.{Ingest, Manifest, ParquetWarehouse}

/** Loader lifecycle parity tests — mirrors RedshiftLoader.spec.ts
  * (SURVEY.md §5): the 6-row fixture delivered as two NDJSON bodies, upload
  * counts, manifest content, cleanup policies, single-shot latch, and the
  * native execution of all three load modes against a parquet warehouse.
  */
class LoaderSpec extends AnyFunSuite with SparkSuite {

  /** The reference's TEST_ROWS (RedshiftLoader.spec.ts:46-58): ids 1-6,
    * mixed int/float `number`, epoch-millis `created_at` stepping daily from
    * 2017-01-01 UTC; rows 3-6 carry text 'UPSERT' and arrive as the second
    * body (spec:95-105). */
  private val day0 = 1483228800000L
  private def row(id: Int, n: Double, text: String) =
    s"""{"id":$id,"number":$n,"text":"$text","created_at":${day0 + id * 86400000L}}"""
  private val body1 = (1 to 2).map(i => row(i, 56.8, "sample")).mkString("\n")
  private val body2 = (3 to 6).map(i => row(i, 45, "UPSERT")).mkString("\n")

  private def tmp() = Files.createTempDirectory("graft-test").toString

  private class Recorder extends LoadListener {
    var progress = Vector.empty[String]
    var infos = Vector.empty[(String, Map[String, String])]
    var errors = 0
    var done = 0
    override def onProgress(task: String, info: Map[String, String]): Unit = {
      progress :+= task
      infos :+= (task -> info)
    }
    override def onError(e: Throwable): Unit = errors += 1
    override def onDone(): Unit = done += 1
  }

  private def mkLoader(
      cfg: LoaderConfig,
      wh: ParquetWarehouse,
      staging: String,
      listener: LoadListener = LoadListener.Silent,
      executor: Option[SqlExecutor] = None) =
    new Loader(spark, cfg, wh, staging, executor = executor, listener = listener,
      txnRunner = new RetryingTxnRunner(sleeper = _ => ()))

  test("insert: 2 bodies staged + 1 manifest; events fired (spec:108-115)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val rec = new Recorder
    val cfg = LoaderConfig(table = TableRef("", "target"),
      cleanup = CleanupPolicy.Never)
    val loader = mkLoader(cfg, wh, stg, rec)
    val ups = loader.addBodies(Seq(
      Ingest.ndjsonString(spark, body1), Ingest.ndjsonString(spark, body2)))
    assert(ups.size == 2 && ups.forall(_.files.nonEmpty))
    assert(loader.insert() == "SUCCESS")
    assert(rec.progress.count(_ == "uploadedFile") == 2)
    assert(rec.progress.count(_ == "uploadedManifest") == 1)
    assert(rec.done == 1 && rec.errors == 0)
    assert(wh.table(TableRef("", "target")).count() == 6)
    // observe-based metrics rode along with the load job (no extra pass)
    assert(rec.infos.collect {
      case ("loadedMetrics", m) => m("rows_loaded")
    } == Vector("6"))
    // manifest lists every staged file, mandatory:true (L5)
    val mf = Files.readString(java.nio.file.Paths.get(
      ups.head.dir).getParent.resolve(s"manifest_${loader.uuid}.json"))
    assert(Manifest.parseUrls(mf).size == ups.flatMap(_.files).size)
    assert(mf.contains("\"mandatory\":true"))
  }

  test("per-upload progress carries byte counts: task-level events + per-file sizes (O3)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val rec = new Recorder
    val cfg = LoaderConfig(table = TableRef("", "target"),
      cleanup = CleanupPolicy.Never)
    val loader = mkLoader(cfg, wh, stg, rec)
    val up = loader.addBody(Ingest.ndjsonString(spark, body1)).get
    // Task-level streaming progress (the reference's managedUpload
    // 'progress' analogue): at least one event, with positive bytes and
    // the right body index.
    val streamed = rec.infos.collect { case ("uploadProgress", m) => m }
    assert(streamed.nonEmpty)
    assert(streamed.forall(m => m("index") == "0" && m("bytes").toLong > 0))
    // Completion event: exact per-file byte counts matching the staged
    // files on disk.
    val fileEv = rec.infos.collect { case ("uploadedFile", m) => m }.head
    assert(fileEv("bytes").toLong > 0)
    val perFile = up.files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getName -> p.getFileSystem(
        spark.sparkContext.hadoopConfiguration).getFileStatus(p).getLen
    }
    perFile.foreach { case (name, len) =>
      assert(fileEv(s"bytes.$name").toLong == len, s"wrong bytes for $name")
    }
    assert(fileEv("bytes").toLong == perFile.map(_._2).sum)
  }

  test("constructor-time bodies stage immediately: 2 bodies + manifest = 3 staged (spec:108-115)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val rec = new Recorder
    val cfg = LoaderConfig(table = TableRef("", "target"),
      cleanup = CleanupPolicy.Never)
    // Reference parity: new RedshiftLoader(options) stages options.bodies
    // at construction (RedshiftLoader.ts:122) — no explicit addBody calls.
    val loader = new Loader(spark, cfg, wh, stg, listener = rec,
      txnRunner = new RetryingTxnRunner(sleeper = _ => ()),
      initialBodies = Seq(
        Ingest.ndjsonString(spark, body1), Ingest.ndjsonString(spark, body2)))
    assert(rec.progress.count(_ == "uploadedFile") == 2)
    assert(loader.insert() == "SUCCESS")
    assert(rec.progress.count(_ == "uploadedManifest") == 1)
    assert(wh.table(TableRef("", "target")).count() == 6)
  }

  test("upsert merges on id; duplicate staged ids all land (L3 wart)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val t = TableRef("", "target")
    wh.create(t, Ingest.ndjsonString(spark, body1 + "\n" + body2)) // 6 rows
    val cfg = LoaderConfig(table = t)
    val loader = mkLoader(cfg, wh, stg)
    // staged: two rows for id 3 (dup), one for id 99 (new)
    val staged = Ingest.ndjsonString(spark,
      Seq(row(3, 1.0, "A"), row(3, 2.0, "B"), row(99, 3.0, "C")).mkString("\n"))
    loader.addBody(staged)
    assert(loader.upsert() == "SUCCESS")
    val out = wh.table(t)
    assert(out.count() == 8) // 6 - 1 deleted + 3 staged
    assert(out.filter("id = 3").count() == 2) // both dups land
    assert(out.filter("id = 99").count() == 1)
  }

  test("truncInsert replaces the table (L2)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val t = TableRef("", "target")
    wh.create(t, Ingest.ndjsonString(spark, body1 + "\n" + body2))
    val loader = mkLoader(LoaderConfig(table = t), wh, stg)
    loader.addBody(Ingest.ndjsonString(spark, row(7, 1.5, "only")))
    loader.truncInsert()
    val out = wh.table(t)
    assert(out.count() == 1 && out.filter("id = 7").count() == 1)
  }

  test("cleanup policy: staging deleted on SUCCESS, kept on NEVER (spec:131-142)") {
    def run(policy: CleanupPolicy): (Boolean, Recorder) = {
      val (whDir, stg) = (tmp(), tmp())
      val wh = new ParquetWarehouse(spark, whDir)
      val rec = new Recorder
      val loader = mkLoader(
        LoaderConfig(table = TableRef("", "t"), cleanup = policy), wh, stg, rec)
      loader.addBody(Ingest.ndjsonString(spark, body1))
      loader.insert()
      val anyLeft = Files.walk(java.nio.file.Paths.get(stg))
        .filter(p => Files.isRegularFile(p)).count() > 0
      (anyLeft, rec)
    }
    val (leftSuccess, recS) = run(CleanupPolicy.OnSuccess)
    assert(!leftSuccess)
    assert(recS.progress.count(_ == "deleteObjects") == 1)
    val (leftNever, recN) = run(CleanupPolicy.Never)
    assert(leftNever)
    assert(recN.progress.count(_ == "deleteObjects") == 0)
  }

  test("auto-compaction hook: fragmented table rewritten in wrapUp, rows intact") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val tbl = TableRef("", "t")
    val cfg = LoaderConfig(table = tbl,
      autoCompact = Some(graft.core.AutoCompact(maxFiles = 4, targetFiles = 2)))
    def loadOnce(rec: Recorder, i: Int): Unit = {
      val loader = mkLoader(cfg, wh, stg, rec)
      val lines = (1 to 3).map(j => s"""{"id":${i * 10 + j},"v":"x"}""")
        .mkString("\n")
      loader.addBody(Ingest.ndjsonString(spark, lines).repartition(3))
      loader.insert()
    }
    val rec = new Recorder
    loadOnce(rec, 1) // 3 files <= maxFiles: no compaction
    assert(!rec.progress.contains("compacted"))
    loadOnce(rec, 2) // 6 files > maxFiles: compacts to 2
    assert(rec.progress.count(_ == "compacted") == 1)
    assert(wh.dataFiles(tbl).size == 2)
    val rows = wh.table(tbl).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(11L, 12L, 13L, 21L, 22L, 23L),
      s"rows changed: ${rows.toSeq}")
    val info = rec.infos.find(_._1 == "compacted").get._2
    assert(info("filesBefore").toInt > 4 && info("filesAfter").toInt == 2)
    // A failed load never compacts (hook is success-only).
    val recF = new Recorder
    val bad = mkLoader(cfg, wh, stg, recF)
    intercept[IllegalArgumentException](bad.insert()) // no staged bodies
    assert(!recF.progress.contains("compacted"))
  }

  test("binary bodies stage under the job dir and ride the same cleanup") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stg = tmp()
    val writer = new graft.io.StagingWriter(stg,
      LoaderConfig(filePrefix = "graft/bin"), "jt", "uu")
    val bin = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4, 5)))
      .toDF("id", "payload")
    val up = writer.writeBinaryBody(bin, "id", "payload", 0, ".bin")
    assert(up.dir == s"${writer.jobDir}/bin_0")
    assert(up.files.map(_.split('/').last).sorted == Seq("1.bin", "2.bin"))
    // A row body and the binary body share the job dir -> one deleteAll
    // (the C1-C5 policies' primitive) reaps both.
    writer.writeBody(Ingest.ndjsonString(spark, body1), 1)
    assert(writer.deleteAll(bin))
    val left = Files.walk(java.nio.file.Paths.get(stg))
      .filter(p => Files.isRegularFile(p)).count()
    assert(left == 0, s"staging not cleaned: $left files left")
    // Duplicate ids fail loudly up front (unique-id precondition).
    val dup = Seq((1L, Array[Byte](1)), (1L, Array[Byte](2)))
      .toDF("id", "payload")
    val e = intercept[IllegalArgumentException](
      writer.writeBinaryBody(dup, "id", "payload", 2, ".bin"))
    assert(e.getMessage.contains("unique"))
  }

  test("single-shot latch: addBody after start is dropped (X5, spec:143-150)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val loader = mkLoader(
      LoaderConfig(table = TableRef("", "t"), cleanup = CleanupPolicy.Never), wh, stg)
    loader.addBody(Ingest.ndjsonString(spark, body1))
    loader.insert()
    assert(loader.addBody(Ingest.ndjsonString(spark, body2)).isEmpty)
    assert(wh.table(TableRef("", "t")).count() == 2) // second body never landed
  }

  test("external executor runs the upsert transaction SQL (X6 + L3)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val t = TableRef("pub", "tgt")
    val ex = new InMemorySqlExecutor()
    val loader = mkLoader(LoaderConfig(table = t, idField = "id"), wh, stg,
      executor = Some(ex))
    loader.addBody(Ingest.ndjsonString(spark, body1))
    loader.upsert()
    val sql = ex.executed.toSeq
    assert(sql.head == "BEGIN;" && sql.last == "COMMIT;")
    assert(sql.exists(_.startsWith("COPY pub.tgt_temp_")))
    assert(sql.exists(q => q.startsWith("DELETE FROM pub.tgt WHERE id IN")))
    assert(sql.size == 8)
  }

  test("failure wraps up with error event; ALWAYS policy still cleans (C4/C1)") {
    val (whDir, stg) = (tmp(), tmp())
    val wh = new ParquetWarehouse(spark, whDir)
    val rec = new Recorder
    val ex = new InMemorySqlExecutor({
      case q if q.startsWith("COPY") => Left(new RuntimeException("copy exploded"))
    })
    val loader = mkLoader(
      LoaderConfig(table = TableRef("", "t"), cleanup = CleanupPolicy.Always),
      wh, stg, rec, executor = Some(ex))
    loader.addBody(Ingest.ndjsonString(spark, body1))
    intercept[RuntimeException](loader.insert())
    assert(rec.errors == 1 && rec.done == 0)
    assert(rec.progress.count(_ == "deleteObjects") == 1) // ALWAYS cleans on failure
  }

  test("requires at least one staged body (X6 assert, :277)") {
    val (whDir, stg) = (tmp(), tmp())
    val loader = mkLoader(LoaderConfig(table = TableRef("", "t")),
      new ParquetWarehouse(spark, whDir), stg)
    intercept[IllegalArgumentException](loader.insert())
  }
}
