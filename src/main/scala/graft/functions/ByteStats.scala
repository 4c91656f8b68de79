package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Single-pass byte statistics shared by interpreted eval and generated
  * code. The 8 features over a byte region `buf` (values read unsigned,
  * 0..255), all normalized into [0, 1]:
  *
  *   f0..f3  mean byte value of the 4 index strides
  *           `[0, n/4) [n/4, 2n/4) [2n/4, 3n/4) [3n/4, n)`
  *           (integer-division boundaries), each divided by
  *           `strideLen * 255.0`
  *   f4      min byte / 255.0
  *   f5      max byte / 255.0
  *   f6      global mean: sum / (n * 255.0)
  *   f7      entropy class: distinct byte values / 256.0
  *
  * Every feature is one exact-integer accumulation followed by exactly
  * one IEEE double division, so any engine computing the same integer
  * sums produces bit-identical doubles — the property the DuckDB
  * differential oracle relies on. The EXPRESSION returns null for
  * inputs shorter than [[ByteStatsUtil.MinBytes]] (an empty stride
  * would otherwise divide 0.0/0.0 to NaN), so SQL-registry callers
  * need no guard of their own; this util assumes `n >= MinBytes`.
  */
object ByteStatsUtil {
  final val NumFeatures = 8

  /** Shortest input with all four strides non-empty. */
  final val MinBytes = 4

  def byteStats(buf: Array[Byte]): ArrayData = {
    val n = buf.length
    val b1 = n / 4
    val b2 = (2 * n) / 4
    val b3 = (3 * n) / 4
    val sums = new Array[Long](4)
    var total = 0L
    var min = 255
    var max = 0
    val seen = new Array[Boolean](256)
    var distinct = 0
    var i = 0
    while (i < n) {
      val v = buf(i) & 0xff
      val k = if (i < b1) 0 else if (i < b2) 1 else if (i < b3) 2 else 3
      sums(k) += v
      total += v
      if (v < min) min = v
      if (v > max) max = v
      if (!seen(v)) { seen(v) = true; distinct += 1 }
      i += 1
    }
    val f = new Array[Double](NumFeatures)
    f(0) = sums(0).toDouble / (b1 * 255.0)
    f(1) = sums(1).toDouble / ((b2 - b1) * 255.0)
    f(2) = sums(2).toDouble / ((b3 - b2) * 255.0)
    f(3) = sums(3).toDouble / ((n - b3) * 255.0)
    f(4) = min / 255.0
    f(5) = max / 255.0
    f(6) = total.toDouble / (n * 255.0)
    f(7) = distinct / 256.0
    new GenericArrayData(f)
  }
}

/** `byte_stats(binary) -> array<double>`: the 8-feature byte-statistics
  * vector of [[ByteStatsUtil.byteStats]] in one codegen'd pass — the
  * pixel/sample feature kernel for the multimodal operators (the region
  * the caller passes is the payload's pixel data, so the features are
  * computed from the actual media bytes, not a digest). Null input
  * propagates (`nullIntolerant`); inputs shorter than
  * [[ByteStatsUtil.MinBytes]] yield null (never NaN), so the defined
  * contract holds for any caller, including SQL-registry ones.
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // short inputs yield null
  override def prettyName: String = "byte_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    if (buf.length < ByteStatsUtil.MinBytes) null
    else ByteStatsUtil.byteStats(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.length < graft.functions.ByteStatsUtil.MinBytes()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.ByteStatsUtil.byteStats($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}
