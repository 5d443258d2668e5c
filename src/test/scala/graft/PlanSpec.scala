package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: lock in the scale properties the operators
  * were designed around (SURVEY.md §7.4 "100 TB design discipline"). A
  * regression that silently turns a broadcast into a shuffle or drops a
  * partial top-k should fail HERE, not in a cluster. */
class PlanSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("upsert merge anti-joins via broadcast (target never shuffled)") {
    val p = plan("load_upsert_merge")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(600))
    assert(!p.contains("SortMergeJoin"), "big-side shuffle crept into the merge")
  }

  test("top-k per group plans a partial WindowGroupLimit before the exchange") {
    val p = plan("topk_orders_by_priority")
    assert(p.contains("WindowGroupLimit"), p.take(600))
  }

  test("dedup_exact plans a partial WindowGroupLimit (rn=1 pushdown)") {
    val p = plan("dedup_exact_docs")
    assert(p.contains("WindowGroupLimit"), p.take(600))
  }

  test("kNN broadcasts the probe side (corpus scanned once, no corpus shuffle)") {
    val p = plan("knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("scans are column-pruned: q1_agg reads only the needed lineitem columns") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    // sparkPlan, not executedPlan: AQE wraps the tree and hides children
    // from collect().
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema
    }
    assert(scans.nonEmpty)
    val cols = scans.head.fieldNames.toSet
    assert(cols == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount"), s"read too much: $cols")
  }

  test("filter pushdown reaches the parquet scan (orders filter)") {
    val df = Tables(spark, sfDir, "orders").filter(col("o_orderkey") === 42L)
      .select("o_orderkey", "o_totalprice")
    val scan = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("EqualTo(o_orderkey,42)"),
      scan.metadata("PushedFilters"))
  }

  test("whole-stage codegen covers the scalar-function projection") {
    val df = SparkEntry.queries("scalar_functions")(spark, sfDir)
    // "*(n)" node prefixes mark whole-stage-codegen membership.
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(400))
  }

  test("bucketed warehouse tables join without an exchange (co-located merge)") {
    val wdir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    // Bucketing needs the session catalog; explicit per-table paths keep it
    // out of the (static) warehouse dir.
    val orders = Tables(spark, sfDir, "orders")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wdir/orders_b").mode("overwrite").saveAsTable("orders_b")
    orders.filter(col("o_orderkey") % 7 === 0)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wdir/staged_b").mode("overwrite").saveAsTable("staged_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = spark.table("orders_b").join(
        spark.table("staged_b").select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      val p = merged.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffled:\n${p.take(800)}")
      assert(merged.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS staged_b")
    }
  }
}
