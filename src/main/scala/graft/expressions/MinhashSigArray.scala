package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd shingle array → full MinHash signature array: for each of
  * the K affine permutations h_k(x) = (a_k·x + b_k) mod P, the minimum
  * over the DISTINCT shingles' base hashes (md5-prefix-15 mod P). One
  * compiled pass replaces the composed
  * `transform(array_distinct(...), hash60 % P)` + K ×
  * `array_min(transform(harr, affine))` pipeline, whose K+1
  * higher-order functions each run an interpreted lambda per element
  * (measured: the interpreted HOF chain is the dominant CPU cost of
  * every MinHash signature pass — see OPTIMIZATION_r21.md).
  *
  * Semantics contract (bit-parity with the composed form, which the
  * DuckDB oracle replays):
  *   - null input array → array of K nulls (`transform(null)` is null,
  *     so every `array_min` leg is null — NOT a null array);
  *   - null elements are skipped (array_min skips nulls; distinct would
  *     keep one null, which then hashes to null);
  *   - no non-null element (empty array) → array of K nulls;
  *   - duplicates cannot change a minimum, so set-vs-multiset is
  *     value-identical; the dedup here (a hash set over the shingle
  *     strings, exactly `array_distinct`'s key) only saves md5 calls.
  *   - arithmetic: base = md5-prefix-15(s) mod P (base < P ≤ 2^60), then
  *     (a·base + b) mod P with a, b < P — a·base < 2^61·2^30 never
  *     overflows a long (P ≈ 2^30, so a·base < 2^60).
  */
case class MinhashSigArray(child: Expression, coeffA: Array[Long],
    coeffB: Array[Long], modulus: Long) extends UnaryExpression {
  require(coeffA.length == coeffB.length && coeffA.nonEmpty,
    "coefficient arrays must be non-empty and same length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  // The composed form maps a NULL input to an array of K nulls (the
  // array() constructor of K null array_min legs), so this expression
  // never returns null and must see null inputs.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    // NOTE: no instance member may shadow the companion's `kNulls` —
    // it would suppress the static forwarder the generated Java calls.
    if (v == null) MinhashSigArray.kNulls(coeffA.length)
    else MinhashSigArray.sigs(v.asInstanceOf[ArrayData], coeffA, coeffB,
      modulus)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coeffA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("coeffB", coeffB, "long[]")
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.expressions.MinhashSigArray.kNulls($aRef.length)
            : graft.expressions.MinhashSigArray.sigs(
                ${childGen.value}, $aRef, $bRef, ${modulus}L);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sigs"
}

object MinhashSigArray {
  def kNulls(k: Int): ArrayData = new GenericArrayData(new Array[AnyRef](k))

  /** Shared by eval and generated code. */
  def sigs(shingles: ArrayData, coeffA: Array[Long], coeffB: Array[Long],
      modulus: Long): ArrayData = {
    val k = coeffA.length
    val n = shingles.numElements()
    // Dedup on the shingle STRING (array_distinct's key) so each
    // distinct shingle pays one md5.
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var found = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        if (seen.add(s)) {
          found = true
          val base = Md5PrefixLong.hashPrefix(s, 15) % modulus
          var j = 0
          while (j < k) {
            val v = (coeffA(j) * base + coeffB(j)) % modulus
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
      }
      i += 1
    }
    if (!found) kNulls(k)
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }
}
