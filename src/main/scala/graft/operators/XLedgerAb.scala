package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch A/B probe (deleted before commit): attribute the
  * dedup_lsh_bucket_ledger regression vs the r20 composed form by
  * timing all four (sig form × band-key form) combinations over the
  * same ledger-shaped input, alternating execution order in ONE JVM
  * (min over repeats; ambient cancels in the alternation). */
object XLedgerAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ToolSession.local("32", logLevel = "ERROR")
    val docs0 = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // Ledger-shaped input: 10% sample union 10% truncated variants.
    val a = docs0.filter(col("doc_id") % 10 === 0)
    val b = docs0.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        expr("substring(text, 1, cast((length(text)*4) div 5 as int))")
          .as("text"))
    val docs = a.unionByName(b).localCheckpoint(true)

    import graft.functions.TextFunctions._
    val K = DedupOps.K
    val bands = DedupOps.Bands
    val r = DedupOps.R
    val P = DedupOps.P
    val coeffs = DedupOps.HashCoeffs

    def sigKernel(df: DataFrame): DataFrame =
      df.select(col("doc_id"), graft.expressions.GraftFunctions.minhashSigs(
        wordBigrams(col("text")), coeffs.map(_._1).toArray,
        coeffs.map(_._2).toArray, P).as("sig"))

    def sigComposed(df: DataFrame): DataFrame = {
      val harr = transform(array_distinct(wordBigrams(col("text"))),
        x => graft.expressions.GraftFunctions.md5PrefixLong(x, 15) % P)
      val sig = array(coeffs.map { case (ca, cb) =>
        array_min(transform(col("__harr"),
          x => (x * ca + cb) % P)) }: _*)
      df.select(col("doc_id"), harr.as("__harr"))
        .select(col("doc_id"), sig.as("sig"))
    }

    def bkKernel(sigArr: DataFrame): DataFrame =
      sigArr.select(posexplode(graft.expressions.GraftFunctions
        .lshBandKeys(col("sig"), bands, r)).as(Seq("band", "bkey")))

    def bkComposed(sigArr: DataFrame): DataFrame = {
      val bandStructs = array((0 until bands).map { bnd =>
        struct(lit(bnd).as("band"),
          xxhash64(array_join(transform(
            slice(col("sig"), bnd * r + 1, r), _.cast("string")), "_"))
            .as("bkey"))
      }: _*)
      sigArr.select(explode(bandStructs).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    }

    def ledger(bk: DataFrame): DataFrame =
      bk.groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_bucket"),
          count(when(col("n") > 256, 1)).as("n_over_cap"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "kSig+kBk  " -> (() => ledger(bkKernel(sigKernel(docs)))),
      "cSig+cBk  " -> (() => ledger(bkComposed(sigComposed(docs)))),
      "kSig+cBk  " -> (() => ledger(bkComposed(sigKernel(docs)))),
      "cSig+kBk  " -> (() => ledger(bkKernel(sigComposed(docs)))),
      "kSigOnly  " -> (() => sigKernel(docs)),
      "cSigOnly  " -> (() => sigComposed(docs))
    )
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    // warm all
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times.getOrElse(name, Nil)
      }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"$name min=${ts.min}%7.3f med=${ts.sorted.apply(ts.size / 2)}%7.3f all=${ts.reverse.map(t => f"$t%5.3f").mkString(",")}")
    }
    spark.stop()
  }
}
