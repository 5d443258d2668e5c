package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float arrays, accumulating in double from
  * left to right — the hot-path kernel of embedding similarity search.
  *
  * Why a custom Catalyst expression (prompt preference (b)): the composed
  * form `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`
  * materializes an intermediate ArrayData per row-pair and evaluates two
  * lambda closures per element; for brute-force kNN that's the inner loop
  * over |probes|·|corpus|·dim elements. This expression compiles to a tight
  * primitive loop (no allocation, no virtual calls) inside whole-stage
  * codegen.
  *
  * Semantics contract (oracle determinism): identical IEEE op sequence to
  * the composed form — each float is widened to double, multiplied, and
  * added left-to-right starting from +0.0. Arrays of different lengths or
  * containing nulls yield null (the composed form's null propagation).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // Nullable even over non-null children: length mismatch or a null
  // ELEMENT yields null. Without this, nullSafeCodeGen's non-nullable
  // branch drops the `boolean isNull_N` declaration the result code
  // assigns to, the generated class fails to COMPILE ("isNull_N is not
  // an rvalue"), and every projection containing the kernel silently
  // runs interpreted — the exact fallback this expression exists to
  // avoid.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var i = 0
      var acc = 0.0
      var sawNull = false
      while (i < n && !sawNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) sawNull = true
        else acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      if (sawNull) null else acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
