package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe: the recall contracts' counting tail — current form
  * (count(exact) x count(capped) x count(left-semi intersect), three
  * aggregation legs crossJoined) vs a single-pass tagged-union form
  * (union with side flags, groupBy row, one final agg). Both run over
  * the SAME eagerly checkpointed candidate frames, alternating per
  * repeat in one JVM, min-of-5. */
object XContractCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ToolSession.local("32", logLevel = "ERROR")
    val cap = graft.SparkEntry.SimhashRecallCap

    val sig = DedupOps.simhash(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .localCheckpoint(true)
    val exact = DedupOps.simhashCandidatesFromSig(sig, "doc_id",
      graft.SparkEntry.SimhashMaxHamming, maxBucket = Int.MaxValue)
      .localCheckpoint(true)
    val capped = DedupOps.simhashCandidatesFromSig(sig, "doc_id",
      graft.SparkEntry.SimhashMaxHamming, maxBucket = cap,
      variantCap = cap).localCheckpoint(true)

    def current(): Array[org.apache.spark.sql.Row] = {
      val hits = exact.join(capped, exact.columns.toSeq, "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(capped.agg(count(lit(1)).as("n_capped")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .collect()
    }
    def tagged(): Array[org.apache.spark.sql.Row] = {
      val cols = exact.columns.toSeq.map(col)
      val u = exact.withColumn("__e", lit(1)).withColumn("__c", lit(0))
        .unionByName(capped.withColumn("__e", lit(0)).withColumn("__c", lit(1)))
      u.groupBy(cols: _*)
        .agg(max(col("__e")).as("__he"), max(col("__c")).as("__hc"))
        .agg(sum(col("__he")).as("n_exact"), sum(col("__hc")).as("n_capped"),
          sum(col("__he") * col("__hc")).as("n_hit"))
        .collect()
    }

    def t(f: () => Array[org.apache.spark.sql.Row]): (Double, String) = {
      val t0 = System.nanoTime()
      val r = f()
      ((System.nanoTime() - t0) / 1e9, r.mkString(","))
    }
    var minCur = Double.MaxValue
    var minTag = Double.MaxValue
    (1 to 5).foreach { rep =>
      val (tc, rc) = t(current _)
      val (tt, rt) = t(tagged _)
      require(rc == rt, s"forms disagree: $rc vs $rt")
      minCur = math.min(minCur, tc); minTag = math.min(minTag, tt)
      println(f"rep $rep: current $tc%6.3fs tagged $tt%6.3fs  ($rc)")
    }
    println(f"min: current $minCur%6.3fs tagged $minTag%6.3fs ratio ${minTag / minCur}%5.3f")
    spark.stop()
  }
}
