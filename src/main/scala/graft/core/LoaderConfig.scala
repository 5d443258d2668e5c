package graft.core

/** Load semantics supported by the engine (reference types.ts:4-8). */
sealed trait LoadMode
object LoadMode {
  /** Append all staged rows (reference `INSERT`). */
  case object Insert extends LoadMode
  /** Empty the target, then load (reference `TRUNCATE_INSERT`). */
  case object TruncateInsert extends LoadMode
  /** Key-based delete-then-insert merge (reference `UPSERT`). */
  case object Upsert extends LoadMode
}

/** Staging-cleanup policy (reference types.ts:63; booleans normalized to the
  * three-valued policy at RedshiftLoader.ts:56-61). */
sealed trait CleanupPolicy
object CleanupPolicy {
  case object Always extends CleanupPolicy
  case object OnSuccess extends CleanupPolicy // the reference's default 'SUCCESS'
  case object Never extends CleanupPolicy

  def fromAny(v: Any): CleanupPolicy = v match {
    case b: Boolean        => if (b) Always else Never
    case p: CleanupPolicy  => p
    case "ALWAYS"          => Always
    case "SUCCESS"         => OnSuccess
    case "NEVER"           => Never
    case other => throw new IllegalArgumentException(s"bad cleanup policy: $other")
  }
}

/** File formats a load can declare (reference types.ts:24-50). */
sealed abstract class CopyFormat(val sql: String)
object CopyFormat {
  case object Json    extends CopyFormat("JSON")
  case object Avro    extends CopyFormat("AVRO")
  case object Csv     extends CopyFormat("CSV")
  case object Parquet extends CopyFormat("PARQUET")
  case object Orc     extends CopyFormat("ORC")
}

/** The live subset of the reference's `CopySettings` (types.ts:24-50).
  *
  * `encoding`, `ignoreHeader`, CSV `quote`/`delimiter` and `jsonpaths` are
  * declared in the reference but never emitted into SQL (makeQueries reads
  * only the fields below — reference RedshiftLoader.ts:340, 351-362,
  * 388-393), so they are deliberately NOT modelled (SURVEY.md §1.2
  * dead-config exclusions).
  *
  * Defaults mirror reference utils.ts:100-116.
  */
final case class CopySettings(
    format: CopyFormat = CopyFormat.Json,
    columnMap: String = "auto", // 'auto' | 'auto ignorecase' (types.ts:34)
    gzip: Boolean = false,
    timeFormat: String = "auto", // 'auto'|'epochsecs'|'epochmillisecs'|custom
    truncateCols: Boolean = true,
    maxError: Int = 0)

/** Auto-compaction policy for the load lifecycle (north-star extension —
  * the reference has no warehouse of its own): after a successful load
  * leaves the target's LIVE version with more than `maxFiles` data
  * files, `Loader.wrapUp` rewrites it to `targetFiles` (plain
  * repartition, or z-order-clustered when `zorderBy` names two
  * columns). Small incremental appends are the normal 100 TB ingest
  * shape; without a compaction hook the file count grows per load and
  * scan planning degrades. Same atomic version swap as any other
  * commit — readers never see a half-written layout. */
final case class AutoCompact(
    maxFiles: Int,
    targetFiles: Int,
    zorderBy: Option[(String, String)] = None) {
  require(maxFiles >= 1 && targetFiles >= 1 && targetFiles <= maxFiles,
    s"need 1 <= targetFiles <= maxFiles, got $targetFiles/$maxFiles")
}

/** Full loader configuration with the reference's three-layer merge:
  * hard defaults <- factory defaults <- per-call options
  * (reference utils.ts:119-138 `mergeOptions`, utils.ts:99-117
  * `createDefaults`, index.ts:4-12 `RedshiftLoaderFactory`).
  *
  * Scala restatement: `LoaderConfig()` is the hard-default layer; each
  * overlay is a partial `LoaderConfig.Patch` applied with `patched` —
  * `copySettings` merges one level deep, exactly like the reference.
  */
final case class LoaderConfig(
    table: TableRef = TableRef("", "unnamed"),
    loadingTable: Option[TableRef] = None, // defaults to target (RedshiftLoader.ts:68-74)
    idField: String = "id",                // utils.ts:101
    removeTempTable: Boolean = true,       // utils.ts:102
    awaitCleanup: Boolean = true,          // utils.ts:103 awaitS3Cleanup
    filePrefix: String = "graft/unnamed",  // utils.ts:104 (ours, same role)
    // The reference also accepts filePrefix as a FUNCTION of the loader
    // (types.ts:55, resolved at RedshiftLoader.ts:128-134); here it is a
    // function of the config, resolved once per job via
    // [[resolvedFilePrefix]].
    filePrefixFn: Option[LoaderConfig => String] = None,
    cleanup: CleanupPolicy = CleanupPolicy.OnSuccess, // utils.ts:105
    copySettings: CopySettings = CopySettings(),      // utils.ts:106-115
    autoCompact: Option[AutoCompact] = None,          // ours (no ref analog)
    debug: Boolean = false) {

  /** The staging ("loading") table: configured one, else the target itself
    * in the target's schema (reference RedshiftLoader.ts:68-74). */
  def resolvedLoadingTable: TableRef = loadingTable.getOrElse(table)

  /** Effective file prefix: the function form wins when present
    * (reference RedshiftLoader.ts:128-134). */
  def resolvedFilePrefix: String = filePrefixFn.map(_(this)).getOrElse(filePrefix)

  def patched(p: LoaderConfig.Patch): LoaderConfig = LoaderConfig(
    table = p.table.getOrElse(table),
    loadingTable = p.loadingTable.orElse(loadingTable),
    idField = p.idField.getOrElse(idField),
    removeTempTable = p.removeTempTable.getOrElse(removeTempTable),
    awaitCleanup = p.awaitCleanup.getOrElse(awaitCleanup),
    filePrefix = p.filePrefix.getOrElse(filePrefix),
    filePrefixFn = p.filePrefixFn.orElse(filePrefixFn),
    cleanup = p.cleanup.getOrElse(cleanup),
    copySettings = p.copy.applyTo(copySettings), // one-level-deep merge
    autoCompact = p.autoCompact.orElse(autoCompact),
    debug = p.debug.getOrElse(debug))
}

object LoaderConfig {
  /** A partial overlay; `None` = inherit. */
  final case class Patch(
      table: Option[TableRef] = None,
      loadingTable: Option[TableRef] = None,
      idField: Option[String] = None,
      removeTempTable: Option[Boolean] = None,
      awaitCleanup: Option[Boolean] = None,
      filePrefix: Option[String] = None,
      filePrefixFn: Option[LoaderConfig => String] = None,
      cleanup: Option[CleanupPolicy] = None,
      copy: CopyPatch = CopyPatch(),
      autoCompact: Option[AutoCompact] = None,
      debug: Option[Boolean] = None)

  final case class CopyPatch(
      format: Option[CopyFormat] = None,
      columnMap: Option[String] = None,
      gzip: Option[Boolean] = None,
      timeFormat: Option[String] = None,
      truncateCols: Option[Boolean] = None,
      maxError: Option[Int] = None) {
    def applyTo(c: CopySettings): CopySettings = CopySettings(
      format = format.getOrElse(c.format),
      columnMap = columnMap.getOrElse(c.columnMap),
      gzip = gzip.getOrElse(c.gzip),
      timeFormat = timeFormat.getOrElse(c.timeFormat),
      truncateCols = truncateCols.getOrElse(c.truncateCols),
      maxError = maxError.getOrElse(c.maxError))
  }
}

/** Factory holding a defaults layer, handing out per-call configs — the
  * reference's `RedshiftLoaderFactory` (index.ts:4-12). */
final class LoaderFactory(defaults: LoaderConfig.Patch) {
  def config(overrides: LoaderConfig.Patch): LoaderConfig =
    LoaderConfig().patched(defaults).patched(overrides)
}
