package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Single-pass high-nibble histogram shared by interpreted eval and
  * generated code: element `i` of the 16-long result counts the bytes
  * whose unsigned high nibble (`(b & 0xff) >> 4`) equals `i`. Exact
  * integer counts — nothing engine-variant anywhere.
  *
  * r18 optimization (guide §4 — keep the hot path in codegen): the
  * byte-histogram consumers (mm12's χ², mm14/st101's entropy verdict)
  * previously derived per-byte bins through a hex round-trip —
  * `hex(body)` then per byte `cast(conv(substr(hx, 2i+1, 2), 16, 10)
  * as bigint) div 16` inside a `transform` lambda, i.e. a two-char
  * string slice, a radix parse and a string→long cast per input byte,
  * then an `explode` shipping one row per BYTE into the per-(doc, bin)
  * aggregation. This kernel reads the binary buffer once, so the
  * explode that follows carries at most 16 rows per document instead
  * of `octet_length` rows, and the per-byte work is two ALU ops. The
  * (doc_id, bin, count) relation it yields is bit-identical to the old
  * formulation's aggregate (counts are exact integers; bins with zero
  * count are absent from both) — the DuckDB oracles are untouched.
  */
object NibbleHistUtil {
  final val NumBins = 16

  def nibbleHist(buf: Array[Byte]): ArrayData = {
    val counts = new Array[Long](NumBins)
    var i = 0
    while (i < buf.length) {
      counts((buf(i) & 0xff) >> 4) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** `nibble_hist(binary) -> array<long>`: 16 high-nibble byte counts in
  * one codegen'd pass (see [[NibbleHistUtil.nibbleHist]]). An empty
  * input yields the all-zero histogram; null propagates.
  */
case class NibbleHist(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nibble_hist"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NibbleHistUtil.nibbleHist(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NibbleHistUtil.nibbleHist($a);")

  override protected def withNewChildInternal(newChild: Expression): NibbleHist =
    copy(child = newChild)
}
