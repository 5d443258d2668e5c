package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd hashed bag-of-grams: occurrence counts of the input grams
  * over `numBuckets` md5-hash buckets, as a dense `array<long>` of
  * length `numBuckets` — the feature kernel of
  * [[graft.operators.QualityModelOps]].
  *
  * Why an expression: the composed form explodes every gram occurrence
  * into a row and aggregates twice ((doc, gram) count, then (doc,
  * bucket) sum) — the gram-level explode is the single biggest shuffle
  * of the quality pipeline. Here the whole bag collapses per document
  * BEFORE any shuffle: one pass over the gram array, one long[] of
  * bucket counts, and the downstream exchange carries at most
  * `numBuckets` rows per document.
  *
  * Semantics contract (oracle determinism): bucket is
  * `pmod(`[[Md5PrefixLong.hashPrefix]]`(gram, 15), numBuckets)` —
  * bit-identical to the composed `pmod(hash60(g), numBuckets)` — and
  * counts are per-OCCURRENCE (the composed form's two-level aggregation
  * sums occurrence counts into buckets). Null elements are skipped, as
  * `explode`+`groupBy` drops null grams; null array yields null. */
case class BucketCountsMd5(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets >= 1 && numBuckets <= (1 << 20),
    s"need 1 <= numBuckets <= 2^20, got $numBuckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BucketCountsMd5.counts(input.asInstanceOf[ArrayData], numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BucketCountsMd5.counts($a, $numBuckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket_counts"
}

object BucketCountsMd5 {
  /** Shared by eval and generated code. */
  def counts(grams: ArrayData, numBuckets: Int): ArrayData = {
    val out = new Array[Long](numBuckets)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val h = Md5PrefixLong.hashPrefix(grams.getUTF8String(i), 15)
        // pmod: hashPrefix is a 60-bit non-negative value, but keep the
        // floor-mod form so the contract matches pmod() verbatim.
        val m = h % numBuckets
        out((if (m < 0) m + numBuckets else m).toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
