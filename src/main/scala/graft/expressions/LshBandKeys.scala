package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd signature array → LSH band-key array: band b's key is
  * `xxhash64` (seed 42, Spark's string xxhash64) of the band's r
  * signature components rendered in decimal and joined with `_` — one
  * long key per band, exactly the composed
  * `xxhash64(array_join(transform(slice(sig, b·r+1, r), cast string), "_"))`
  * per band. The composed form runs `bands` interpreted `transform`
  * lambdas per row and materializes `bands` slice copies plus the
  * joined strings through the generic string codec; this renders the
  * digits into one reused byte buffer and hashes it in place.
  *
  * Bit-parity contract with the composed form (the DuckDB oracle
  * replays the same strings):
  *   - `cast(long as string)` is the decimal rendering `Long.toString`;
  *   - `array_join` SKIPS null elements and their separators
  *     ("a", null, "b" → "a_b"; all-null → "");
  *   - a NULL input array makes `array_join` null, and `xxhash64(null)`
  *     leaves the hash at its seed → every band key is 42;
  *   - `xxhash64("")` hashes zero bytes with seed 42 (NOT 42).
  */
case class LshBandKeys(child: Expression, bands: Int, r: Int)
    extends UnaryExpression {
  require(bands >= 1 && r >= 1, s"need bands >= 1 and r >= 1, got $bands/$r")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // xxhash64 of a null string is the seed, so the composed form yields
  // a key (42) per band even for a null signature array.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LshBandKeys.nullKeys(bands)
    else LshBandKeys.keys(v.asInstanceOf[ArrayData], bands, r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.expressions.LshBandKeys.nullKeys($bands)
            : graft.expressions.LshBandKeys.keys(
                ${childGen.value}, $bands, $r);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_band_keys"
}

object LshBandKeys {
  private val Seed = 42L

  /** xxhash64(null) folds nothing into the seed. */
  def nullKeys(bands: Int): ArrayData = {
    val out = new Array[Long](bands)
    java.util.Arrays.fill(out, Seed)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Shared by eval and generated code: decimal-render each band's
    * non-null components into one reused buffer, '_'-separated, and
    * xxhash64 the bytes (digits are ASCII, so bytes == UTF8 bytes of
    * the joined string). */
  def keys(sig: ArrayData, bands: Int, r: Int): ArrayData = {
    val n = sig.numElements()
    val out = new Array[Long](bands)
    // Worst case per band: r longs of <= 20 digits + (r-1) separators.
    val buf = new Array[Byte](r * 21)
    var b = 0
    while (b < bands) {
      var len = 0
      var first = true
      var i = b * r
      val end = Math.min(n, (b + 1) * r)
      while (i < end) {
        if (!sig.isNullAt(i)) {
          if (!first) { buf(len) = '_'; len += 1 }
          first = false
          val s = java.lang.Long.toString(sig.getLong(i))
          var j = 0
          val sl = s.length
          while (j < sl) { buf(len) = s.charAt(j).toByte; len += 1; j += 1 }
        }
        i += 1
      }
      out(b) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, Seed)
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
