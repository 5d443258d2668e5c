package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.sql._
import graft.io.Manifest

/** Pure-kernel tests (SURVEY.md §7.2 M1): TableRef round-trip, config
  * layering precedence, COPY SQL assembly, credential redaction, manifest
  * round-trip. Mirrors the reference's spec intent (utils/table-name tests
  * in RedshiftLoader.spec.ts:151-181) plus exhaustive sampled round-trips
  * the reference lacks (SURVEY.md §5). */
class KernelSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def ident(): String =
    ('a' + rnd.nextInt(26)).toChar.toString +
      Seq.fill(1 + rnd.nextInt(8))("abcdefghijklmnopqrstuvwxyz0123456789_"
        .charAt(rnd.nextInt(37))).mkString

  test("TableRef parse/render round-trip (T3/T4)") {
    (1 to 200).foreach { _ =>
      val (s, t) = (ident(), ident())
      assert(TableRef.parse(s"$s.$t") == TableRef(s, t))
      assert(TableRef.parse(t) == TableRef("", t))
      assert(TableRef(s, t).qualified == s"$s.$t")
      assert(TableRef("", t).qualified == t)
      assert(TableRef.parse(TableRef(s, t).qualified) == TableRef(s, t))
    }
  }

  test("TableRef rejects injection-shaped identifiers") {
    intercept[IllegalArgumentException](TableRef("", "x; DROP TABLE y"))
    intercept[IllegalArgumentException](TableRef("bad-schema", "t"))
    intercept[IllegalArgumentException](TableRef.parse("a.b.c"))
    intercept[IllegalArgumentException](TableRef("", "t'); --"))
  }

  test("config layering: hard defaults <- factory <- per-call (§1.3)") {
    val factory = new LoaderFactory(LoaderConfig.Patch(
      filePrefix = Some("factory/prefix"),
      copy = LoaderConfig.CopyPatch(gzip = Some(true), maxError = Some(5))))
    val cfg = factory.config(LoaderConfig.Patch(
      table = Some(TableRef("s", "t")),
      copy = LoaderConfig.CopyPatch(maxError = Some(9))))
    assert(cfg.filePrefix == "factory/prefix") // factory layer survives
    assert(cfg.copySettings.gzip)              // one-level-deep merge
    assert(cfg.copySettings.maxError == 9)     // per-call wins
    assert(cfg.copySettings.timeFormat == "auto") // hard default survives
    assert(cfg.idField == "id")
    assert(cfg.resolvedLoadingTable == TableRef("s", "t")) // defaults to target
  }

  test("copy settings defaults mirror the reference (utils.ts:100-116)") {
    val c = CopySettings()
    assert(c.format == CopyFormat.Json && c.columnMap == "auto" && !c.gzip &&
      c.timeFormat == "auto" && c.truncateCols && c.maxError == 0)
    val cfg = LoaderConfig()
    assert(cfg.removeTempTable && cfg.awaitCleanup &&
      cfg.cleanup == CleanupPolicy.OnSuccess)
  }

  test("COPY SQL: all live clauses present, dead config absent (L6)") {
    val sql = CopySqlBuilder.copySql(
      TableRef("pub", "tgt"), "s3://b/m.json",
      CopyCredentials.Keys("AK", "SK", Some("TOK")),
      CopySettings(gzip = true, timeFormat = "epochmillisecs", maxError = 7))
    assert(sql.startsWith("COPY pub.tgt FROM 's3://b/m.json'"))
    assert(sql.contains("CREDENTIALS AS 'aws_access_key_id=AK;aws_secret_access_key=SK;token=TOK'"))
    assert(sql.contains("MANIFEST"))
    assert(sql.contains("JSON 'auto'"))
    assert(sql.contains("GZIP"))
    assert(sql.contains("TIMEFORMAT 'epochmillisecs'"))
    assert(sql.contains("TRUNCATECOLUMNS"))
    assert(sql.endsWith("MAXERROR 7;"))
    assert(!sql.contains("ENCODING") && !sql.contains("IGNOREHEADER"))
  }

  test("COPY SQL: non-JSON format emits bare word; no TRUNCATECOLUMNS when off") {
    val sql = CopySqlBuilder.copySql(
      TableRef("", "t"), "s3://b/m", CopyCredentials.None,
      CopySettings(format = CopyFormat.Parquet, truncateCols = false))
    assert(sql.contains(" PARQUET ") && !sql.contains("JSON"))
    assert(!sql.contains("TRUNCATECOLUMNS"))
  }

  test("IAM role clause spelled correctly (reference typo fixed, T6)") {
    val c = CopySqlBuilder.credClause(CopyCredentials.IamRole("arn:aws:iam::1:role/r"))
    assert(c.contains("aws_iam_role=arn:aws:iam::1:role/r"))
  }

  test("upsert query list shape (L3: 8 statements + cleanUp)") {
    val cfg = LoaderConfig(
      table = TableRef("pub", "tgt"),
      loadingTable = Some(TableRef("stg", "tgt")))
    val LoadQueries(q, cleanUp) = CopySqlBuilder.makeQueries(
      cfg, LoadMode.Upsert, "s3://b/m", CopyCredentials.None, "20260101_000000", "u1")
    val tmp = "stg.tgt_temp_20260101_000000_u1"
    assert(q.head == "BEGIN;" && q.last == "COMMIT;")
    assert(q(1) == s"DROP TABLE IF EXISTS $tmp;")
    assert(q(2) == s"CREATE TABLE $tmp (LIKE pub.tgt);")
    assert(q(3).startsWith(s"COPY $tmp FROM"))
    assert(q(4) == s"DELETE FROM pub.tgt WHERE id IN (SELECT id FROM $tmp);")
    assert(q(5) == s"INSERT INTO pub.tgt SELECT * FROM $tmp;")
    assert(q(6) == s"DROP TABLE IF EXISTS $tmp;") // removeTempTable default
    assert(q.size == 8)
    assert(cleanUp.contains(s"DROP TABLE IF EXISTS $tmp;"))
  }

  test("upsert keeps temp table when removeTempTable=false (L3)") {
    val cfg = LoaderConfig(table = TableRef("", "t"), removeTempTable = false)
    val LoadQueries(q, cleanUp) = CopySqlBuilder.makeQueries(
      cfg, LoadMode.Upsert, "s3://b/m", CopyCredentials.None, "jt", "u")
    assert(q.size == 7)
    assert(q.count(_.startsWith("DROP TABLE IF EXISTS")) == 1) // only the pre-drop
    // Failed-load staging table survives for debugging: no cleanUp either
    // (reference RedshiftLoader.ts:370 + core.ts:35 empty-string skip).
    assert(cleanUp.isEmpty)
  }

  test("filePrefix as a function of the config (reference types.ts:55)") {
    val cfg = LoaderConfig(table = TableRef("pub", "tgt"),
      filePrefixFn = Some(c => s"loads/${c.table.table}"))
    assert(cfg.resolvedFilePrefix == "loads/tgt")
    // String form still wins when no function is set; patch layering
    // carries the function through.
    val patched = LoaderConfig().patched(LoaderConfig.Patch(
      filePrefixFn = Some(c => s"fn/${c.idField}")))
    assert(patched.resolvedFilePrefix == "fn/id")
    assert(LoaderConfig().resolvedFilePrefix == "graft/unnamed")
  }

  test("temp table name derives from the loading table's name (L4)") {
    val cfg = LoaderConfig(
      table = TableRef("pub", "tgt"),
      loadingTable = Some(TableRef("stg", "ld")))
    val tmp = CopySqlBuilder.tempTable(cfg, "jt", "u1")
    assert(tmp.qualified == "stg.ld_temp_jt_u1") // reference RedshiftLoader.ts:347
  }

  test("insert / truncate-insert query lists (L1/L2)") {
    val cfg = LoaderConfig(table = TableRef("", "t"))
    val ins = CopySqlBuilder.makeQueries(cfg, LoadMode.Insert, "s3://b/m",
      CopyCredentials.None, "jt", "u")
    assert(ins.q.size == 1 && ins.q.head.startsWith("COPY t ") && ins.cleanUp.isEmpty)
    val tr = CopySqlBuilder.makeQueries(cfg, LoadMode.TruncateInsert, "s3://b/m",
      CopyCredentials.None, "jt", "u")
    assert(tr.q == Seq("TRUNCATE t;", ins.q.head))
  }

  test("credential redaction in LoaderError (T7, utils.ts:91)") {
    val sql = "COPY t FROM 's3://b/m' CREDENTIALS AS " +
      "'aws_access_key_id=AK;aws_secret_access_key=SECRET' MANIFEST"
    val err = new LoaderError("RS_COPY_ERROR", "boom", query = Some(sql))
    assert(err.redactedQuery.get ==
      "COPY t FROM 's3://b/m' CREDENTIALS ='SECRET_XXXX' MANIFEST")
    assert(!err.redactedQuery.get.contains("aws_secret_access_key"))
  }

  test("cleanup policy normalization (C1, RedshiftLoader.ts:56-61)") {
    assert(CleanupPolicy.fromAny(true) == CleanupPolicy.Always)
    assert(CleanupPolicy.fromAny(false) == CleanupPolicy.Never)
    assert(CleanupPolicy.fromAny("SUCCESS") == CleanupPolicy.OnSuccess)
  }

  test("manifest JSON shape + round-trip (L5)") {
    val m = Manifest.of(Seq("s3://b/p_prt_0.txt", "s3://b/p_prt_1.txt"))
    assert(m.toJson ==
      """{"entries":[{"url":"s3://b/p_prt_0.txt","mandatory":true},""" +
      """{"url":"s3://b/p_prt_1.txt","mandatory":true}]}""")
    (1 to 100).foreach { _ =>
      val urls = Seq.fill(1 + rnd.nextInt(5))(
        s"s3://bucket/${ident()}/${ident()}_prt_${rnd.nextInt(100)}.txt")
      assert(Manifest.parseUrls(Manifest.of(urls).toJson) == urls)
    }
  }
}
