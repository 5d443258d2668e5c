package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning at scale.
  *
  * A 100 TB table is read through file-level min/max statistics: a filter
  * prunes a file only if the filtered column is *clustered* within files.
  * Sorting clusters one column perfectly and leaves the others scattered;
  * Z-ordering (Morton-code interleaving) trades a little locality on each
  * dimension for locality on ALL of them, so `WHERE user_id = ? AND day
  * BETWEEN ? AND ?` prunes on both predicates. (Same layout idea as
  * Delta/Iceberg `ZORDER BY` / sort-order rewrites; implemented here as a
  * plain range-repartition + sort on the interleaved key, so it composes
  * with any parquet writer.)
  *
  * The reference has no layout surface at all (it ships bytes to Redshift
  * and delegates physical layout to the warehouse — SURVEY.md §2); this is
  * a north-star extension.
  */
object LayoutOps {

  /** 2-D Morton (Z-order) code: interleaves the low `bits` bits of two
    * non-negative integer columns, x in the even positions, y in the odd.
    * Pure shift/mask integer arithmetic — stays inside whole-stage
    * codegen, no UDF. Inputs are masked to `bits` bits so out-of-range
    * values wrap instead of corrupting high bits. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching SQL text for [[zValue2]] (DuckDB dialect: `>>`/`<<`
    * on BIGINT are logical for non-negative values) — generated from the
    * same loop so the two sides cannot drift. */
  def zValue2Sql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val xm = s"(CAST($x AS BIGINT) & $mask)"
    val ym = s"(CAST($y AS BIGINT) & $mask)"
    (0 until bits).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) | ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
  }

  /** Rewrite `df` into Z-order on two dimensions: range-partition by the
    * Morton code into `numFiles` output partitions, then sort within each
    * so row groups inside a file are tiles too. Every output partition
    * covers a compact 2-D tile of (x, y) space, so file min/max stats
    * prune on either dimension. The z column is dropped before handing
    * back — layout is a side effect of partition order, not schema. */
  def zorder(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue2(x, y, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
