package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd shingle array → ASCENDING-sorted array of seed-42 xxhash64
  * values over the DISTINCT shingles — the per-document "shingle set"
  * of the dense exact-Jaccard family in one compiled pass. Replaces
  * `sort_array(transform(array_distinct(bigrams), s => xxhash64(s)))`,
  * whose `transform` runs an interpreted lambda per element.
  *
  * Bit-parity contract with the composed form:
  *   - dedup is on the shingle STRING (`array_distinct`'s key); two
  *     distinct strings hashing to the same 64-bit value keep both
  *     (equal) values in the output, exactly like the composed chain;
  *   - null elements: `array_distinct` keeps one null, `xxhash64(null)`
  *     yields the seed (42) — mirrored here (cannot occur from `split`,
  *     kept for parity);
  *   - null input array → null (transform(null) is null). */
case class SortedShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SortedShingleHashes.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SortedShingleHashes.hashes($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_sorted_shingle_hashes"
}

object SortedShingleHashes {
  private val Seed = 42L

  /** Shared by eval and generated code. */
  def hashes(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    val out = new Array[Long](n)
    var m = 0
    var sawNull = false
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) {
        if (!sawNull) { sawNull = true; out(m) = Seed; m += 1 }
      } else {
        val s = shingles.getUTF8String(i)
        if (seen.add(s)) {
          out(m) = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
          m += 1
        }
      }
      i += 1
    }
    val trimmed = if (m == n) out else java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(trimmed)
  }
}
