package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token array → per-query-term frequency array: output[i] =
  * number of tokens exactly equal to `terms(i)` — the BM25 tf kernel in
  * ONE pass over the tokens. Replaces |Q| interpreted
  * `size(filter(tokens, x => x === term))` lambdas (one full pass per
  * query term per document).
  *
  * Bit-parity contract with the composed form: exact binary UTF8
  * equality (what `===` compiles to on strings); null tokens match
  * nothing (x === term is null → filter drops); null input array →
  * null (the composed chain's filter(null) is null). */
case class TermFreqArray(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "need at least one term")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  @transient private lazy val utf8Terms: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    TermFreqArray.freqs(input.asInstanceOf[ArrayData], utf8Terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms",
      terms.map(UTF8String.fromString).toArray,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TermFreqArray.freqs($a, $termsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_term_freqs"
}

object TermFreqArray {
  /** Shared by eval and generated code. Query-term lists are tiny
    * (single digits), so a linear probe per token beats map overhead. */
  def freqs(toks: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Int](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (terms(j).equals(t)) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
