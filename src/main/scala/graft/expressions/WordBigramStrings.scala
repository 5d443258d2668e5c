package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token array → word-bigram string array ("a b" per adjacent
  * pair; single-token arrays degrade to the array itself) — the shingle
  * kernel under [[graft.functions.TextFunctions.wordBigrams]]. The
  * composed `zip_with(slice(...), slice(...), concat)` form runs an
  * interpreted lambda per pair and materializes two slice copies;
  * measured 2.6x the cost of the tokenization it follows. One pass,
  * one output array.
  *
  * Semantics contract (oracle determinism): identical to the composed
  * form — n <= 1 returns the input tokens; a null token makes its
  * pair(s) null (`concat` null semantics); null array yields null. */
case class WordBigramStrings(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WordBigramStrings.bigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.expressions.WordBigramStrings.bigrams($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordBigramStrings {
  private val Space = UTF8String.fromString(" ")

  /** Shared by eval and generated code. */
  def bigrams(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n <= 1) return toks.copy()
    val out = new Array[AnyRef](n - 1)
    var prev: UTF8String = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      out(i - 1) =
        if (prev == null || cur == null) null
        else UTF8String.concat(prev, Space, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}
