package graft.expressions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.GraftColumns

/** Session extension registering graft's custom expressions for SQL use:
  *
  * {{{
  *   spark.sql.extensions=graft.expressions.GraftExtensions
  *   SELECT graft_dot(a, b) FROM ...
  * }}}
  *
  * DataFrame-API callers don't need the extension — [[GraftFunctions]]
  * builds Columns directly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductFloat(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))
  }
}

/** Column-API entry points for the custom expressions. */
object GraftFunctions {
  /** Codegen'd float-array dot product (see [[DotProductFloat]]). */
  def dotF(a: Column, b: Column): Column =
    GraftColumns.column(DotProductFloat(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Codegen'd sorted-long-array intersection count
    * (see [[SortedIntersectCount]]). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumns.column(SortedIntersectCount(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Codegen'd squared L2 distance, vector (float/double) vs centroid
    * (double) — the k-means assignment kernel (see [[L2DistSq]]). */
  def l2DistSq(x: Column, c: Column): Column =
    GraftColumns.column(L2DistSq(
      GraftColumns.expression(x), GraftColumns.expression(c)))

  /** Distinct ≤2-deletion neighborhood of a string — symmetric-delete
    * blocking keys (see [[DeletionNeighborhood]]). */
  def delNeighborhood(s: Column): Column =
    GraftColumns.column(DeletionNeighborhood(GraftColumns.expression(s)))

  /** Optimizer barrier: identity on `c`, but filters over it won't be
    * pushed below the projection (see [[Opaque]]). */
  def opaque(c: Column): Column =
    GraftColumns.column(Opaque(GraftColumns.expression(c)))

  /** Codegen'd token-array → n-gram-hash-array (see [[NgramHashes]]). */
  def ngramHashes(tokens: Column, n: Int): Column =
    GraftColumns.column(NgramHashes(GraftColumns.expression(tokens), n))

  /** Codegen'd count of tokens in a static word set
    * (see [[StringSetHitCount]]). */
  def hitCount(tokens: Column, words: Seq[String]): Column =
    GraftColumns.column(StringSetHitCount(
      GraftColumns.expression(tokens), words))

  /** Codegen'd count of non-overlapping matches of a static regex
    * (see [[RegexpCountAll]]). */
  def regexpCount(text: Column, regex: String): Column =
    GraftColumns.column(RegexpCountAll(GraftColumns.expression(text), regex))

  /** Codegen'd token array → word-bigram strings
    * (see [[WordBigramStrings]]). */
  def wordBigramStrings(tokens: Column): Column =
    GraftColumns.column(WordBigramStrings(GraftColumns.expression(tokens)))

  /** Codegen'd md5-prefix long hash (see [[Md5PrefixLong]]). */
  def md5PrefixLong(s: Column, hexDigits: Int): Column =
    GraftColumns.column(Md5PrefixLong(GraftColumns.expression(s), hexDigits))

  /** Codegen'd shingle array → MinHash signature array
    * (see [[MinhashSigArray]]). */
  def minhashSigs(shingles: Column, coeffA: Array[Long], coeffB: Array[Long],
      modulus: Long): Column =
    GraftColumns.column(MinhashSigArray(
      GraftColumns.expression(shingles), coeffA, coeffB, modulus))

  /** Codegen'd signature array → LSH band-key array
    * (see [[LshBandKeys]]). */
  def lshBandKeys(sig: Column, bands: Int, r: Int): Column =
    GraftColumns.column(LshBandKeys(GraftColumns.expression(sig), bands, r))

  /** Codegen'd token array → 48-bit SimHash (see [[SimhashLong]]). */
  def simhashLong(tokens: Column): Column =
    GraftColumns.column(SimhashLong(GraftColumns.expression(tokens)))

  /** Codegen'd shingle array → sorted distinct xxhash64 set
    * (see [[SortedShingleHashes]]). */
  def sortedShingleHashes(shingles: Column): Column =
    GraftColumns.column(SortedShingleHashes(GraftColumns.expression(shingles)))

  /** Codegen'd token array → per-query-term frequency array
    * (see [[TermFreqArray]]). */
  def termFreqs(tokens: Column, terms: Seq[String]): Column =
    GraftColumns.column(TermFreqArray(GraftColumns.expression(tokens), terms))

  /** Codegen'd hashed bag-of-grams bucket counts
    * (see [[BucketCountsMd5]]). */
  def bucketCounts(grams: Column, numBuckets: Int): Column =
    GraftColumns.column(BucketCountsMd5(
      GraftColumns.expression(grams), numBuckets))

  /** Codegen'd dictionary-probe tile filter
    * (see [[ArrayDropByMd5Prefix]]). */
  def dropByMd5Prefix(arr: Column, hashes: Array[Long], hexDigits: Int): Column =
    GraftColumns.column(ArrayDropByMd5Prefix(
      GraftColumns.expression(arr), hashes, hexDigits))

  /** Register graft's SQL functions on a live session (the
    * `spark.sql.extensions` path only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftColumns.functionRegistry(spark).createOrReplaceTempFunction(
      "graft_dot",
      (children: Seq[Expression]) => DotProductFloat(children(0), children(1)),
      "scala_udf")
}
