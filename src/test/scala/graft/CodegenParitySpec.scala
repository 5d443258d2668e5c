package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.DedupOps

/** Bit-parity specs for the r21 codegen kernels: each replaced a
  * composed (interpreted higher-order-function) form whose values the
  * DuckDB oracle replays, so the kernel must reproduce the composed
  * form EXACTLY — including the null/empty edge semantics the composed
  * chain implies (`transform(null)` is null, `array_min` skips nulls,
  * `array_join` skips nulls, `xxhash64(null)` is the seed). Each test
  * evaluates both forms over the real corpus PLUS adversarial edge
  * rows and asserts row-for-row equality. */
class CodegenParitySpec extends AnyFunSuite with SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Gate corpus + the edge shapes the composed forms define behavior
    * for: null text, empty, whitespace-only, one token, repeated
    * tokens (multiplicity), unicode. */
  private def edgeDocs: DataFrame = {
    import spark.implicits._
    val edges = Seq(
      (9001L, null.asInstanceOf[String]),
      (9002L, ""),
      (9003L, "   \t  "),
      (9004L, "one"),
      (9005L, "dup dup dup dup"),
      (9006L, "a b a b a b c"),
      (9007L, "café naïve 你好")).toDF("doc_id", "text")
    Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
      .limit(200).unionByName(edges)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("MinhashSigArray ≡ composed transform/array_distinct/array_min chain") {
    val docs = edgeDocs
    // The pre-r21 composed form, verbatim.
    val withH = docs.select(col("doc_id"),
      transform(array_distinct(wordBigrams(col("text"))),
        s => hash60(s) % DedupOps.P).as("harr"))
    val mins = DedupOps.HashCoeffs.map { case (a, b) =>
      array_min(transform(col("harr"), h => (lit(a) * h + lit(b)) % DedupOps.P))
    }
    val composed = withH.select(col("doc_id"), array(mins: _*).as("sig"))
    val kernel = DedupOps.minhashSignatureArr(docs, "doc_id", "text")
    assert(rows(kernel) == rows(composed))
  }

  test("LshBandKeys ≡ composed slice/cast/array_join/xxhash64 per band") {
    val sig = DedupOps.minhashSignatureArr(edgeDocs, "doc_id", "text")
    val bands = DedupOps.Bands
    val r = DedupOps.K / bands
    val composed = sig.select(col("doc_id") +: (0 until bands).map { b =>
      xxhash64(array_join(transform(slice(col("sig"), b * r + 1, r),
        x => x.cast("string")), "_")).as(s"k$b")
    }: _*)
    val kernel = sig.select(col("doc_id") +: (0 until bands).map { b =>
      element_at(graft.expressions.GraftFunctions
        .lshBandKeys(col("sig"), bands, r), b + 1).as(s"k$b")
    }: _*)
    assert(rows(kernel) == rows(composed))
    // And the full-signature (bands = 1) key used for path ordering.
    val composed1 = sig.select(col("doc_id"),
      xxhash64(array_join(transform(col("sig"), x => x.cast("string")), "_"))
        .as("skey"))
    val kernel1 = sig.select(col("doc_id"),
      element_at(graft.expressions.GraftFunctions
        .lshBandKeys(col("sig"), 1, DedupOps.K), 1).as("skey"))
    assert(rows(kernel1) == rows(composed1))
  }

  test("SimhashLong projection ≡ explode + 48-bit-sum groupBy aggregation") {
    val docs = edgeDocs
    // The pre-r21 aggregation form, verbatim (drops docs whose token
    // array is null via the explode).
    val tok = docs.select(col("doc_id"),
      explode(tokens(normalized(col("text")))).as("t"))
      .select(col("doc_id"), hash48(col("t")).as("h"))
    val bitSums = (0 until DedupOps.SimBits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(1L) * 2 - 1).as(s"v$j")
    }
    val composed = tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until DedupOps.SimBits).map { j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
    val kernel = DedupOps.simhash(docs, "doc_id", "text")
    assert(rows(kernel) == rows(composed))
  }

  test("minShingleHash kernel ≡ composed array_min(transform(hash60))") {
    val docs = edgeDocs
    val composed = docs.select(col("doc_id"),
      array_min(transform(wordBigrams(col("text")), s => hash60(s)))
        .as("fp"))
    val kernel = docs.select(col("doc_id"),
      minShingleHash(col("text")).as("fp"))
    assert(rows(kernel) == rows(composed))
  }

  test("SortedShingleHashes ≡ composed sort_array(transform(array_distinct, xxhash64))") {
    val docs = edgeDocs
    val composed = docs.select(col("doc_id"),
      sort_array(transform(array_distinct(wordBigrams(col("text"))),
        s => xxhash64(s))).as("set"))
    val kernel = docs.select(col("doc_id"),
      graft.expressions.GraftFunctions.sortedShingleHashes(
        wordBigrams(col("text"))).as("set"))
    assert(rows(kernel) == rows(composed))
  }

  test("TermFreqArray ≡ composed size(filter(tokens, x === term)) per term") {
    val docs = edgeDocs
    val terms = Seq("the", "dup", "a", "zzz_absent")
    val composed = docs.select(col("doc_id") +: terms.zipWithIndex.map {
      case (t, i) =>
        size(filter(tokens(normalized(col("text"))), x => x === lit(t)))
          .as(s"tf$i")
    }: _*)
    val kernel = docs.select(col("doc_id") +: terms.indices.map { i =>
      element_at(graft.expressions.GraftFunctions.termFreqs(
        tokens(normalized(col("text"))), terms), i + 1).as(s"tf$i")
    }: _*)
    // The composed form yields null tf per term for a null token array;
    // the kernel yields a null ARRAY, so element_at is null too.
    assert(rows(kernel) == rows(composed))
  }

  test("unguarded simhashCandidatesFromSig (structural skip) ≡ guarded at a dormant cap") {
    // maxBucket = Int.MaxValue now PRUNES the population windows and the
    // variant stage from the plan; a finite cap larger than any bucket
    // runs the full guarded plan whose filters keep everything. The two
    // must agree pair-for-pair (the dormancy contract the recall rows'
    // truth sides rest on).
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(300)
    val sig = DedupOps.simhash(docs, "doc_id", "text").localCheckpoint(true)
    val pruned = DedupOps.simhashCandidatesFromSig(sig, "doc_id", 8,
      maxBucket = Int.MaxValue)
    val guarded = DedupOps.simhashCandidatesFromSig(sig, "doc_id", 8,
      maxBucket = Int.MaxValue - 1)
    assert(rows(pruned) == rows(guarded))
  }

  test("topKOverlapsPerSession candM = MaxValue (window skipped) ≡ huge finite candM") {
    val sess = graft.operators.AnalyticOps.sessionize(
      Tables(spark, sf, "events"), 30).localCheckpoint(true)
    def form(m: Int) = graft.operators.AnalyticOps.topKOverlapsPerSession(
      sess, "user_id", "session_start", "session_end",
      k = 3, bucketSec = 1800L, candM = m)
    assert(rows(form(Int.MaxValue)) == rows(form(Int.MaxValue - 1)))
  }
}
