package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd count of non-overlapping matches of a STATIC regex — the
  * token-counting kernel behind [[graft.functions.TextFunctions]]'
  * BPE-ish token count. The composed
  * `size(regexp_extract_all(text, re, 0))` form materializes every
  * match as a UTF8String array entry just to take its length; this
  * runs the same `Matcher.find()` loop and allocates nothing.
  *
  * Semantics contract (oracle determinism): the match count equals
  * `regexp_extract_all`'s group-0 list length exactly — same
  * `Pattern.compile(re)` (no flags), same find() advance over the
  * same `toString` of the input. Null text yields null. */
case class RegexpCountAll(child: Expression, regex: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)

  override protected def nullSafeEval(input: Any): Any =
    RegexpCountAll.countMatches(pattern, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val patRef = ctx.addReferenceObj("pattern", pattern,
        "java.util.regex.Pattern")
      s"${ev.value} = graft.expressions.RegexpCountAll.countMatches($patRef, $s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexpCountAll {
  /** Shared by eval and generated code: one compiled-pattern matcher
    * pass, counting group-0 matches the way RegExpExtractAll collects
    * them. */
  def countMatches(p: Pattern, s: UTF8String): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}
