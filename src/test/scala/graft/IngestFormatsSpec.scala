package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Ingest

/** S5 coverage: every COPY file format the reference declares
  * (types.ts:47-49) that the zero-egress jar set can execute —
  * JSON/CSV/PARQUET/ORC round-trip through `Ingest.files`, plus gzip
  * NDJSON (the `gzip` CopySettings flag). AVRO is emitted as a COPY tag
  * by CopySqlBuilder but needs the external spark-avro package to scan —
  * documented, not silently skipped. */
class IngestFormatsSpec extends AnyFunSuite with SparkSuite {

  private def sample = {
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "name", "x")
  }

  private def roundTrip(format: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_$format").toString + "/data"
    val df = sample
    val w = opts.foldLeft(df.write.format(format)) { case (w, (k, v)) => w.option(k, v) }
    w.save(dir)
    val r = opts.foldLeft(spark.read.format(format)) { case (r, (k, v)) => r.option(k, v) }
    val schema = if (format == "csv" || format == "json") Some(df.schema) else None
    val back = schema.fold(r)(s => r.schema(s)).load(dir)
      .orderBy("id").collect().map(r0 => (r0.getLong(0), r0.getString(1), r0.getDouble(2))).toSeq
    assert(back == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)), s"format=$format")
  }

  test("json round-trips")(roundTrip("json"))
  test("csv round-trips")(roundTrip("csv", Map("header" -> "true")))
  test("parquet round-trips")(roundTrip("parquet"))
  test("orc round-trips")(roundTrip("orc"))

  test("xml round-trips (Spark 4 built-in source via Ingest.files)") {
    val dir = Files.createTempDirectory("graft_fmt_xml").toString + "/data"
    sample.write.format("xml").option("rowTag", "row").save(dir)
    val back = Ingest.files(spark, "xml", dir, Some(sample.schema),
        Map("rowTag" -> "row"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(back == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
  }

  test("gzip NDJSON round-trips (CopySettings.gzip)") {
    val dir = Files.createTempDirectory("graft_fmt_gz").toString + "/data"
    sample.write.option("compression", "gzip").json(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), s"expected gz parts: ${files.toSeq}")
    val back = Ingest.files(spark, "json", dir, Some(sample.schema))
      .orderBy("id").collect().map(r => r.getLong(0)).toSeq
    assert(back == Seq(1L, 2L, 3L))
  }

  test("binaryFiles ingests opaque payloads with metadata") {
    val dir = Files.createTempDirectory("graft_bin").toString
    val payload = Array[Byte](1, 2, 3, 4, 5)
    Files.write(java.nio.file.Paths.get(dir, "img.bin"), payload)
    Files.write(java.nio.file.Paths.get(dir, "skip.txt"), "nope".getBytes)
    val rows = Ingest.binaryFiles(spark, dir, Some("*.bin")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("length") == 5L)
    assert(r.getAs[Array[Byte]]("content").toSeq == payload.toSeq)
    assert(r.getAs[String]("path").endsWith("img.bin"))
  }

  test("writeBinaryFiles -> binaryFiles round-trips payloads one file per row") {
    import graft.operators.MultimodalOps
    val dir = Files.createTempDirectory("graft_binrt").toString + "/stage"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 10)
    val staged = MultimodalOps.withToyRaster(docs, "text")
    Ingest.writeBinaryFiles(staged, "doc_id", "payload", dir, ".grb")
    val back = Ingest.binaryFiles(spark, dir, Some("*.grb"))
      .select(
        regexp_extract(col("path"), "(\\d+)\\.grb$", 1).cast("long").as("doc_id"),
        col("content"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val direct = staged.select(col("doc_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back == direct, "bytes must survive the file round-trip exactly")
    assert(back.keySet == direct.keySet)
    // Decoding the round-tripped payloads works (magic survived).
    val dec = MultimodalOps.decodeFeatures(
      Ingest.binaryFiles(spark, dir, Some("*.grb")).select(
        regexp_extract(col("path"), "(\\d+)\\.grb$", 1).cast("long").as("doc_id"),
        col("content").as("payload")), "doc_id")
    assert(dec.count() == direct.size)
  }

  test("Ingest.files façade reads every jarred format") {
    for (fmt <- Seq("json", "csv", "parquet", "orc")) {
      val dir = Files.createTempDirectory(s"graft_facade_$fmt").toString + "/data"
      sample.write.format(fmt).option("header", "true").save(dir)
      val n = Ingest.files(spark, fmt, dir,
        if (fmt == "parquet" || fmt == "orc") None else Some(sample.schema),
        if (fmt == "csv") Map("header" -> "true") else Map.empty)
        .count()
      assert(n == 3, s"format=$fmt")
    }
  }
}
