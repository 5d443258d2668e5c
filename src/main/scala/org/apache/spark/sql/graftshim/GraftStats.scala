package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Re-anchor the `Statistics` of a just-checkpointed DataFrame to a
  * MEASURED row count.
  *
  * Why this must exist: `Dataset.localCheckpoint` snapshots the origin
  * plan's ESTIMATED statistics into the resulting [[LogicalRDD]]
  * (`originStats`, a private constructor arg — hence the shim). In an
  * iterative operator that checkpoints every round (e.g. connected
  * components), round n+1's plan joins round n's LogicalRDD with
  * itself, and `SizeInBytesOnlyStatsPlanVisitor.visitJoin` estimates a
  * join as the PRODUCT of its children's `sizeInBytes` — so the carried
  * estimate SQUARES every round. The BigInt's digit count doubles per
  * iteration and by round ~20 the driver burns minutes of single-core
  * time in `BigInteger.multiplyToomCook3` inside stats estimation
  * (measured: `incrementalComponents` on a 16k-vertex graph ground
  * >240 s in Karatsuba/ToomCook before this fix; with it the whole
  * probe takes seconds). Rewrapping with `rowCount × per-row size`
  * gives Catalyst strictly better information than the blown-up
  * estimate AND caps the digit count, so per-round stats work is O(1).
  *
  * Partitioning/ordering survive: the rewrap copies the LogicalRDD's
  * `outputPartitioning`/`outputOrdering` fields verbatim, so loops that
  * rely on checkpoint-preserved layouts keep their one-shuffle plans.
  * Origin constraints are dropped (private to the node, not readable) —
  * harmless for the loop frames this is meant for. */
object GraftStats {

  /** `df` must be the direct result of `localCheckpoint`/`checkpoint`
    * (its analyzed plan is a [[LogicalRDD]]); any other frame is
    * returned unchanged. `rows` is the measured row count (from an
    * action the caller already ran). */
  def withRowCount(df: DataFrame, rows: Long): DataFrame = {
    val spark = df.sparkSession
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val bytes =
          EstimationUtils.getSizePerRow(lr.output) * BigInt(math.max(rows, 1L))
        val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(Statistics(sizeInBytes = bytes, rowCount = Some(BigInt(rows)))),
          None)
        GraftPlans.ofRows(spark, fresh)
      case _ => df
    }
  }

  /** The current `sizeInBytes` estimate of a frame's optimized plan —
    * diagnostic surface (lets a spec assert the estimate stays sane
    * across rounds instead of eyeballing driver CPU). */
  def sizeInBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
