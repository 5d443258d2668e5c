package graft.sql

import graft.core._

/** AWS credentials for the generated COPY clause
  * (reference utils.ts:151-162 `createCopyCredString`). */
sealed trait CopyCredentials
object CopyCredentials {
  final case class Keys(
      accessKeyId: String,
      secretAccessKey: String,
      sessionToken: Option[String] = scala.None)
      extends CopyCredentials
  /** IAM-role variant. The reference emits `aws_iam_rol=` — a typo
    * (missing `e`, utils.ts:158); we emit the correct keyword
    * (SURVEY.md §2.2 T6: "fix T6 typo"). */
  final case class IamRole(arn: String) extends CopyCredentials
  case object None extends CopyCredentials
}

/** The queries a load runs, plus an optional failure-cleanup statement
  * (reference `makeQueries(): {q: string[]; cleanUp?: string}` —
  * RedshiftLoader.ts:337-386). */
final case class LoadQueries(q: Seq[String], cleanUp: Option[String] = scala.None)

/** Pure SQL assembly for the three load modes — the reference's only
  * "planner" (`makeQueries`, reference RedshiftLoader.ts:337-393). Identifier
  * inputs are validated `TableRef`s, closing the reference's documented
  * SQL-injection surface (reference README.md:36-38).
  *
  * The engine executes load *semantics* natively on Spark
  * ([[graft.operators.LoadOps]]); this builder exists for deployments that
  * additionally orchestrate an external warehouse COPY, exactly matching the
  * reference's generated SQL (modulo the fixed IAM-role typo).
  */
object CopySqlBuilder {

  def credClause(creds: CopyCredentials): String = creds match {
    case CopyCredentials.Keys(id, secret, token) =>
      val tok = token.map(t => s";token=$t").getOrElse("")
      s"CREDENTIALS AS 'aws_access_key_id=$id;aws_secret_access_key=$secret$tok'"
    case CopyCredentials.IamRole(arn) =>
      s"CREDENTIALS AS 'aws_iam_role=$arn'"
    case CopyCredentials.None => ""
  }

  /** `JSON '<columnMap>'` for JSON loads, else the bare format word
    * (reference `createFormat`, RedshiftLoader.ts:388-393). */
  def formatClause(s: CopySettings): String = s.format match {
    case CopyFormat.Json => s"JSON '${s.columnMap}'"
    case other           => other.sql
  }

  /** The shared COPY statement (reference RedshiftLoader.ts:353-363):
    * COPY t FROM 's3://…/manifest' CREDS MANIFEST FORMAT [GZIP]
    * [TIMEFORMAT '…'] [TRUNCATECOLUMNS] MAXERROR n. */
  def copySql(
      table: TableRef,
      manifestUrl: String,
      creds: CopyCredentials,
      s: CopySettings): String = {
    require(!manifestUrl.contains("'"), s"bad manifest url: $manifestUrl")
    require(!s.timeFormat.contains("'"), s"bad timeFormat: ${s.timeFormat}")
    require(s.columnMap == "auto" || s.columnMap == "auto ignorecase",
      s"bad columnMap: ${s.columnMap}")
    val parts = Seq(
      s"COPY ${table.qualified}",
      s"FROM '$manifestUrl'",
      credClause(creds),
      "MANIFEST",
      formatClause(s)) ++
      (if (s.gzip) Seq("GZIP") else Nil) ++
      Seq(s"TIMEFORMAT '${s.timeFormat}'") ++
      (if (s.truncateCols) Seq("TRUNCATECOLUMNS") else Nil) ++
      Seq(s"MAXERROR ${s.maxError}")
    parts.filter(_.nonEmpty).mkString(" ") + ";"
  }

  /** Staging table name `<loadingSchema>.<table>_temp_<jobTime>_<uuid>`
    * (reference RedshiftLoader.ts:343-350). `jobTime`/`uuid` are passed in so
    * builds are deterministic and testable. */
  def tempTable(cfg: LoaderConfig, jobTime: String, uuid: String): TableRef = {
    // Base name comes from the loading table (falling back to the target
    // only through resolvedLoadingTable) — reference RedshiftLoader.ts:347.
    val lt = cfg.resolvedLoadingTable
    TableRef(lt.schema, s"${lt.table}_temp_${jobTime}_$uuid")
  }

  /** Build the statement list for a load mode
    * (reference RedshiftLoader.ts:364-385). */
  def makeQueries(
      cfg: LoaderConfig,
      mode: LoadMode,
      manifestUrl: String,
      creds: CopyCredentials,
      jobTime: String,
      uuid: String): LoadQueries = {
    val target = cfg.table
    mode match {
      case LoadMode.Insert =>
        LoadQueries(Seq(copySql(target, manifestUrl, creds, cfg.copySettings)))
      case LoadMode.TruncateInsert =>
        LoadQueries(Seq(
          s"TRUNCATE ${target.qualified};",
          copySql(target, manifestUrl, creds, cfg.copySettings)))
      case LoadMode.Upsert =>
        val tmp = tempTable(cfg, jobTime, uuid)
        val id = cfg.idField
        require(TableRef.isValidIdent(id), s"invalid idField: '$id'")
        val drop = s"DROP TABLE IF EXISTS ${tmp.qualified};"
        val q = Seq(
          "BEGIN;",
          drop,
          s"CREATE TABLE ${tmp.qualified} (LIKE ${target.qualified});",
          copySql(tmp, manifestUrl, creds, cfg.copySettings),
          s"DELETE FROM ${target.qualified} WHERE $id IN " +
            s"(SELECT $id FROM ${tmp.qualified});",
          s"INSERT INTO ${target.qualified} SELECT * FROM ${tmp.qualified};") ++
          (if (cfg.removeTempTable) Seq(drop) else Nil) ++
          Seq("COMMIT;")
        // cleanUp only when removeTempTable — with it off, the staging
        // table intentionally survives a failed load for debugging
        // (reference RedshiftLoader.ts:370, empty cleanUp skipped by
        // core.ts:35).
        LoadQueries(q, if (cfg.removeTempTable) Some(drop) else scala.None)
    }
  }
}
