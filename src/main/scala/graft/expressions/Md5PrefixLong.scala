package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd "first `hexDigits` hex digits of md5(s) as a long" — the
  * cross-engine hash kernel under [[graft.functions.TextFunctions
  * .hash60]]/`hash48` (DuckDB twin: `('0x' || substr(md5(s), 1, n))::
  * BIGINT`). The composed `conv(substring(md5(s), 1, n), 16, 10)` form
  * materializes the 32-char hex string, substrings it, and re-parses it
  * per row; this reads the digest BYTES directly — bit-identical by
  * construction (each hex digit is one nibble in digest order) and one
  * allocation (the digest) per row.
  *
  * `hexDigits` must be <= 15 so the value fits a non-negative long. */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15,
    s"need 1 <= hexDigits <= 15, got $hexDigits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Md5PrefixLong.hashPrefix(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.Md5PrefixLong.hashPrefix($s, $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First `hexDigits` nibbles of md5(utf8 bytes of s), big-endian. */
  def hashPrefix(s: UTF8String, hexDigits: Int): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = digest(i >> 1)
      val nibble = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
