package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

import graft.core.LoaderConfig

/** One staged "upload": the files a single body write produced
  * (the reference's `UploadTask`, RedshiftLoader.ts:13-21). */
final case class StagedUpload(index: Int, dir: String, files: Seq[String])

/** Writes staged bodies to the staging filesystem and emits the
  * Redshift-format manifest — the Spark restatement of the reference's
  * concurrent S3 multipart uploads + `uploadManifest`
  * (RedshiftLoader.ts:135-193, 299-336).
  *
  * Naming mirrors the reference's object-key convention
  * `${filePrefix}${jobTime}_prt_${i}_${uuid}` (RedshiftLoader.ts:144-146):
  * each body lands under `<root>/<filePrefix>/<jobTime>_<uuid>/prt_<i>/`,
  * with Spark's commit protocol supplying the per-file uniqueness. The
  * manifest key fixes the reference's "manifiest" typo
  * (RedshiftLoader.ts:310) — recorded, not replicated.
  *
  * Scale note: one staged body = one distributed write job; parallelism
  * inside a body is its partition count (callers fragment big inputs across
  * partitions, not across bodies — SURVEY.md §4 "Parallel partitioned
  * load"). Nothing is ever collected to the driver.
  */
final class StagingWriter(root: String, cfg: LoaderConfig, jobTime: String, uuid: String) {

  val jobDir = s"$root/${cfg.resolvedFilePrefix}/${jobTime}_$uuid"
  def manifestPath = s"$jobDir/manifest_$uuid.json"

  private def fs(df: DataFrame): FileSystem =
    new Path(root).getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())

  /** Write one body. `format` is the staged wire format — NDJSON (`json`,
    * the reference's native encoding, utils.ts:27-29) or columnar
    * (`parquet`); `gzip` maps to the codec flag (types.ts:26). */
  def writeBody(
      df: DataFrame,
      index: Int,
      format: String = "json",
      gzip: Boolean = false): StagedUpload = {
    val dir = s"$jobDir/prt_$index"
    val w = df.write.mode("errorifexists")
    val writer = if (gzip && format == "json") w.option("compression", "gzip") else w
    writer.format(format).save(dir)
    StagedUpload(index, dir, listDataFiles(df, dir))
  }

  /** Data files under a written dir (committed parts only — no `_SUCCESS`,
    * no hidden files), sorted for determinism. */
  def listDataFiles(df: DataFrame, dir: String): Seq[String] = {
    val f = fs(df)
    f.listStatus(new Path(dir))
      .filter(_.isFile)
      .map(_.getPath.toString)
      .filterNot(p => p.split('/').last.startsWith("_") || p.split('/').last.startsWith("."))
      .sorted
      .toSeq
  }

  /** Stage one BINARY body: each row's payload as its own object
    * `<id><ext>` under `<jobDir>/bin_<index>/` — media assets ride the
    * same job-scoped staging layout (and therefore the same C1-C5
    * cleanup policies and abort path) as the row-oriented bodies,
    * instead of ad-hoc temp dirs the OS has to remember to reap.
    * Executor-side writes via [[Ingest.writeBinaryFiles]] (unique-id
    * precondition checked there; driver never touches payloads). */
  def writeBinaryBody(df: DataFrame, idCol: String, payloadCol: String,
      index: Int, ext: String): StagedUpload = {
    val dir = s"$jobDir/bin_$index"
    Ingest.writeBinaryFiles(df, idCol, payloadCol, dir, ext)
    StagedUpload(index, dir, listDataFiles(df, dir))
  }

  /** Emit the manifest listing every staged file, `mandatory:true` each —
    * the atomic-visibility contract (L5). Unlike the reference, a manifest
    * write failure propagates: quirk C6 (swallowed failure,
    * RedshiftLoader.ts:327-335) is deliberately NOT reproduced. */
  def writeManifest(df: DataFrame, uploads: Seq[StagedUpload]): String = {
    val m = Manifest.of(uploads.flatMap(_.files))
    val f = fs(df)
    val out = f.create(new Path(manifestPath), false)
    try out.write(m.toJson.getBytes("UTF-8"))
    finally out.close()
    manifestPath
  }

  /** Delete the whole staging job dir (cleanup policies C1-C5). */
  def deleteAll(df: DataFrame): Boolean =
    fs(df).delete(new Path(jobDir), true)

  def exists(df: DataFrame): Boolean = fs(df).exists(new Path(jobDir))
}
