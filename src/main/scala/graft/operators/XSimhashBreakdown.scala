package graft.operators

import org.apache.spark.sql.functions._

/** Scratch probe: stage-level wall breakdown of the simhash recall
  * contracts — times sig build, exact form, capped/escalated forms,
  * and the final intersect+agg separately (each stage is an eager
  * localCheckpoint in the committed query, so the split is real). */
object XSimhashBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ToolSession.local("32", logLevel = "ERROR")
    val cap = graft.SparkEntry.SimhashRecallCap
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"== rep $rep ==")
      val sig = t("sig ckpt") {
        DedupOps.simhash(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
          .localCheckpoint(true)
      }
      val exact = t("exact form ckpt") {
        DedupOps.simhashCandidatesFromSig(sig, "doc_id",
          graft.SparkEntry.SimhashMaxHamming, maxBucket = Int.MaxValue)
          .localCheckpoint(true)
      }
      val capped = t("capped form ckpt (recall)") {
        DedupOps.simhashCandidatesFromSig(sig, "doc_id",
          graft.SparkEntry.SimhashMaxHamming, maxBucket = cap)
          .localCheckpoint(true)
      }
      val escal = t("escalated form ckpt (auto)") {
        DedupOps.simhashCandidatesFromSig(sig, "doc_id",
          graft.SparkEntry.SimhashMaxHamming, maxBucket = cap,
          variantCap = cap).localCheckpoint(true)
      }
      val window = t("window form ckpt (window)") {
        DedupOps.simhashCandidatesFromSig(sig, "doc_id",
          graft.SparkEntry.SimhashMaxHamming, maxBucket = cap,
          variantCap = cap, escalateBudget = 0).localCheckpoint(true)
      }
      t("intersect+aggs (vs escal)") {
        val hits = exact.join(escal, exact.columns.toSeq, "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(escal.agg(count(lit(1)).as("n_capped")))
          .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
          .collect()
      }
      println(f"  rows: exact=${exact.count()} capped=${capped.count()} " +
        f"escal=${escal.count()} window=${window.count()}")
      graft.ToolSession.clearStorage(spark)
    }
    spark.stop()
  }
}
