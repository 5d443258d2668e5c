package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three load semantics restated as pure
  * `DataFrame => DataFrame` relational ops (SURVEY.md §2.3 L1-L3).
  *
  * Scale notes (100 TB discipline):
  *   - [[merge]] anti-joins the target against the *distinct staged keys*
  *     only — at typical load ratios (staged << target) Catalyst broadcasts
  *     the key set, so the target is scanned once with NO shuffle of the
  *     100 TB side. If staged keys exceed the broadcast threshold, AQE falls
  *     back to a shuffled hash join on the key column alone (narrow row).
  *   - [[append]]/[[overwrite]] are metadata-only at write time
  *     (`mode("append")`/`mode("overwrite")`) — no data movement beyond the
  *     staged side itself.
  */
object LoadOps {

  /** INSERT: append all staged rows to the target
    * (reference RedshiftLoader.ts:364-366). */
  def append(target: DataFrame, staged: DataFrame): DataFrame =
    target.unionByName(staged)

  /** TRUNCATE_INSERT: result is the staged data only
    * (reference RedshiftLoader.ts:367-368). Unlike the reference — where a
    * COPY failure leaves the table already truncated (non-transactional,
    * SURVEY.md §3.3) — a Spark `mode("overwrite")` write is job-atomic under
    * the commit protocol; an intentional improvement. */
  def overwrite(staged: DataFrame): DataFrame = staged

  /** UPSERT: delete target rows whose `idField` appears in the staged data,
    * then insert ALL staged rows (reference RedshiftLoader.ts:369-385:
    * `DELETE FROM target WHERE id IN (SELECT id FROM tmp); INSERT INTO
    * target SELECT * FROM tmp`).
    *
    * Faithful to the reference's wart: staged duplicates are NOT
    * deduplicated — N staged rows per id all land (SURVEY.md §7.4 "L3
    * duplicate semantics"). Use [[Dedup.exact]] first if last-write-wins is
    * wanted.
    */
  def merge(target: DataFrame, staged: DataFrame, idField: String): DataFrame =
    mergeKeys(target, staged, Seq(idField))

  /** Composite-key variant of [[merge]] (the reference only supports a
    * single `idField`; real warehouses routinely merge on compound keys). */
  def mergeKeys(target: DataFrame, staged: DataFrame, keyFields: Seq[String]): DataFrame = {
    // Distinct key set: tiny relative to the staged rows, maximizing the
    // chance of a broadcast anti-join against the big target.
    val keys = staged.select(keyFields.map(col): _*).distinct()
    target.join(keys, keyFields, "left_anti").unionByName(staged)
  }

  /** Snapshot diff (CDC derivation): classify every key across two
    * versions of a table as insert / delete / update / same via one full
    * outer join on the key. `cmpCols` define row equality for the
    * update-vs-same split (null-safe compare). The shape a
    * change-capture export or incremental-sync audit runs; one shuffle
    * on the key on each side. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idField: String,
      cmpCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(idField).as("__ok"),
      struct(cmpCols.map(col): _*).as("__ov"))
    val n = newDf.select(col(idField).as("__nk"),
      struct(cmpCols.map(col): _*).as("__nv"))
    o.join(n, col("__ok") === col("__nk"), "full_outer")
      .select(coalesce(col("__ok"), col("__nk")).as(idField),
        when(col("__ok").isNull, "insert")
          .when(col("__nk").isNull, "delete")
          .when(col("__ov") <=> col("__nv"), "same")
          .otherwise("update").as("change_type"))
  }

  /** Apply a CDC batch with tombstones: rows whose `opCol` is "D" delete
    * their key from the target; every other row upserts (last staged
    * version wins is the CALLER's concern, as in [[merge]]). One anti-
    * join against the distinct changed-key set + one union — the merge
    * plan plus delete semantics the reference never had. */
  def applyCdc(target: DataFrame, changes: DataFrame, idField: String,
      opCol: String): DataFrame = {
    val changedKeys = changes.select(col(idField)).distinct()
    target.join(changedKeys, Seq(idField), "left_anti")
      .unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** SCD2 (slowly-changing-dimension type 2) merge: the history-keeping
    * upsert. Where [[merge]] deletes replaced rows (the reference's L3
    * semantics), this closes their validity interval instead:
    *
    *   - target rows are versioned by `valid_from` / `valid_to`
    *     (null `valid_to` = current);
    *   - current rows whose key appears in the staged batch get
    *     `valid_to = effective`;
    *   - every staged row lands as the new current version
    *     (`valid_from = effective`, `valid_to = null`);
    *   - history rows and untouched current rows pass through.
    *
    * `effective` is an explicit parameter (not wall-clock) so loads are
    * deterministic and replayable. Same scale shape as [[merge]]: the
    * big target is only semi/anti-joined against the distinct staged
    * key set (broadcast at typical load ratios). */
  def scd2Merge(target: DataFrame, staged: DataFrame, idField: String,
      effective: Column): DataFrame = {
    val keys = staged.select(col(idField)).distinct()
    val current = target.filter(col("valid_to").isNull)
    val history = target.filter(col("valid_to").isNotNull)
    val closed = current.join(keys, Seq(idField), "left_semi")
      .withColumn("valid_to", effective.cast("timestamp"))
    val untouched = current.join(keys, Seq(idField), "left_anti")
    val incoming = staged
      .withColumn("valid_from", effective.cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    history.unionByName(untouched).unionByName(closed).unionByName(incoming)
  }

  /** MAXERROR-style bounded-error ingest (reference RedshiftLoader.ts:362,
    * default 0 — utils.ts:107): given a PERMISSIVE-parsed frame with a
    * corrupt-record column, fail if the corrupt count exceeds `maxError`,
    * else return the clean rows (SURVEY.md §4 "Error-bounded load"). */
  def boundErrors(
      parsed: DataFrame,
      corruptCol: String,
      maxError: Long): DataFrame = {
    val bad = parsed.filter(col(corruptCol).isNotNull).count()
    if (bad > maxError)
      throw new graft.core.LoaderError(
        "RS_COPY_ERROR",
        s"$bad corrupt records exceed MAXERROR $maxError",
        details = Some(Map("count" -> bad.toString)))
    parsed.filter(col(corruptCol).isNull).drop(corruptCol)
  }

  /** TRUNCATECOLUMNS analogue: clip declared-width string columns instead of
    * failing (reference types.ts:30, RedshiftLoader.ts:361). */
  def truncateColumns(df: DataFrame, widths: Map[String, Int]): DataFrame =
    widths.foldLeft(df) { case (d, (c, w)) =>
      d.withColumn(c, substring(col(c), 1, w))
    }

  /** Declarative load expectations (the DLT-expectations shape; the
    * generalization of [[boundErrors]] from parse errors to arbitrary
    * predicates): each rule is a boolean Column that must hold per row.
    * Returns (clean rows, violations tagged with the names of every
    * failed rule) in ONE pass — the split is two filters over the same
    * scan, no row is evaluated twice per rule. Callers route violations
    * to a quarantine sink and fail the load if their count exceeds the
    * configured tolerance (maxError). */
  def expectations(df: DataFrame, rules: Map[String, Column])
      : (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "no expectation rules given")
    val ordered = rules.toSeq.sortBy(_._1)
    val failedArr = array_compact(array(ordered.map { case (name, cond) =>
      when(!coalesce(cond, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("__failed", failedArr)
    (tagged.filter(size(col("__failed")) === 0).drop("__failed"),
      tagged.filter(size(col("__failed")) > 0)
        .withColumn("failed_rules", array_join(col("__failed"), ","))
        .drop("__failed"))
  }
}
