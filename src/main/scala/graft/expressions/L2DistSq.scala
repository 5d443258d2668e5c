package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd squared L2 distance between a vector column (float or
  * double elements) and a double-element centroid column — the
  * assignment kernel of [[graft.operators.ClusterOps]]' Lloyd
  * iterations, where the composed
  * `aggregate(zip_with(x, c, (a,b) -> (a-b)*(a-b)), 0d, (acc,v) -> acc+v)`
  * form allocates an intermediate array and runs two interpreted lambdas
  * per element for every (vector, centroid) pair.
  *
  * Semantics contract (oracle determinism): identical IEEE op sequence
  * to the composed form — widen the element to double, subtract,
  * square, accumulate left-to-right from +0.0. Length mismatch or a
  * null element yields null. */
case class L2DistSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val rightOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (leftOk && rightOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, array<double>, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // Length mismatch / null element yield null even over non-null
  // children — same codegen-compile rationale as [[DotProductFloat]].
  override def nullable: Boolean = true

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != c.numElements()) null
    else {
      val isF = leftIsFloat
      var i = 0
      var acc = 0.0
      var sawNull = false
      while (i < n && !sawNull) {
        if (x.isNullAt(i) || c.isNullAt(i)) sawNull = true
        else {
          val xi = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
          val d = xi - c.getDouble(i)
          acc += d * d
        }
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
      val d = ctx.freshName("d")
      val get = if (leftIsFloat) s"((double) $a.getFloat($i))"
                else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $get - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistSq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2_dist_sq"
}
