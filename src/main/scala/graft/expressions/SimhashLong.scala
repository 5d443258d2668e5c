package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd token array → 48-bit SimHash: bit j of the result is set
  * iff Σ_tokens (2·bit_j(md5-prefix-12(token)) − 1) > 0 — the whole
  * explode → hash48 → 48-column bit-sum groupBy → sign-pack pipeline
  * of [[graft.operators.DedupOps.simhash]] collapsed into one per-row
  * loop (documents are rows, so the per-document aggregation needs no
  * grouping at all — the explode multiplied every row by its token
  * count and the groupBy paid a full shuffle to reassemble what was
  * already assembled).
  *
  * Bit-parity contract with the aggregation form: identical integer
  * arithmetic per token (multiplicity preserved — NO dedup), identical
  * sign rule (strictly positive sum sets the bit). Null tokens cannot
  * occur from `split`; they are skipped like the aggregation skips
  * null hash rows. Callers handle the null/empty token array (the
  * aggregation form DROPS such documents via explode). */
case class SimhashLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimhashLong.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimhashLong.simhash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimhashLong {
  val Bits = 48

  /** Shared by eval and generated code. */
  def simhash(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = Md5PrefixLong.hashPrefix(toks.getUTF8String(i), 12)
        var j = 0
        while (j < Bits) {
          // +1 when bit j set, −1 when clear — same ±1 sum the
          // aggregation form computes.
          counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) v |= 1L << j
      j += 1
    }
    v
  }
}
