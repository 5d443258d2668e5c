package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd "how many tokens are in this (small, static) word set" —
  * the stopword-hit kernel of [[graft.functions.TextFunctions]]'
  * quality score and language ID. The composed
  * `size(filter(toks, t -> array_contains(dict, t)))` form runs an
  * INTERPRETED lambda per token (ArrayFilter is CodegenFallback) and
  * scans the dict array linearly per token; this is one hash-set probe
  * per token inside whole-stage codegen.
  *
  * Semantics contract (oracle determinism): identical to the composed
  * form — null array yields null; null tokens are not counted (the
  * HOF's `array_contains(dict, null)` is null, which `filter` treats as
  * false). The set is baked at plan time from literal words. */
case class StringSetHitCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var hits = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("hitSet", set,
        "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hits = ctx.freshName("hits")
      s"""
         |final int $n = $a.numElements();
         |int $hits = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    $hits++;
         |  }
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
