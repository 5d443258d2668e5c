package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Semantically the identity on `child`, but declared NON-deterministic —
  * an optimizer barrier. Use when a filter over an expensive projected
  * expression must NOT be pushed into a join condition: predicate
  * pushdown refuses to cross non-deterministic projections, so wrapping
  * the projection pins the filter above it and the expensive expression
  * is evaluated once per JOINED row instead of (twice) per CANDIDATE
  * pair inside the join predicate.
  *
  * The child itself must be genuinely deterministic — the flag is a
  * placement constraint, not a semantics change (same trade Spark's own
  * `AssertTrue`-style barriers make). */
case class Opaque(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)

  override def prettyName: String = "graft_opaque"
}
