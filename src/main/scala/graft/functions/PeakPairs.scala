package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Constellation landmark pairs of a window-peak series in ONE
  * codegen'd loop — the mm13/st89 fingerprint geometry
  * ([[graft.operators.Multimodal.FpFanout]] forward targets per
  * anchor, hash = peak_a·2¹⁷ + peak_b·4 + d).
  *
  * r18 optimization (guide §4): the builtin formulation
  * `flatten(transform(peaks, (p, i) => filter(transform(sequence(1,
  * F), d => when(...)), notNull)))` is a four-deep higher-order
  * chain — CodegenFallback, one interpreted lambda frame PLUS a
  * nested sequence/transform/filter allocation per anchor element,
  * per document, and it runs over the FULL corpus on the index side
  * of both the batch matcher (mm13) and the ingest probe's standing
  * artifact (st89). This kernel emits the identical (f, hkey) structs
  * (same 0-based anchor index, same d-ascending order) in one pass.
  */
object PeakPairsUtil {

  def pairs(a: ArrayData, fanout: Int): ArrayData = {
    val len = a.numElements()
    if (len <= 1) return new GenericArrayData(new Array[Any](0))
    // exact count: Σ_i min(fanout, len-1-i)
    var n = 0
    var i = 0
    while (i < len) {
      val k = len - 1 - i
      n += (if (k > fanout) fanout else k)
      i += 1
    }
    val out = new Array[Any](n)
    var w = 0
    i = 0
    while (i < len - 1) {
      val p = a.getLong(i)
      val dMax = math.min(fanout, len - 1 - i)
      var d = 1
      while (d <= dMax) {
        out(w) = InternalRow(i.toLong, p * 131072L + a.getLong(i + d) * 4L + d.toLong)
        w += 1
        d += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `peak_pairs(array<long>, fanout) -> array<struct<f: bigint,
  * hkey: bigint>>`: [[PeakPairsUtil.pairs]] as a codegen'd expression;
  * fanout must be a positive int literal. Null input propagates.
  */
case class PeakPairs(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("f", LongType, nullable = false),
      StructField("hkey", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "peak_pairs"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      right match {
        case Literal(f: Int, _) if f >= 1 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a positive int literal fanout")
      }
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, int literal), got " +
        s"(${a.simpleString}, ${b.simpleString})")
  }

  override protected def nullSafeEval(arr: Any, f: Any): Any =
    PeakPairsUtil.pairs(arr.asInstanceOf[ArrayData], f.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, f) =>
      s"${ev.value} = graft.functions.PeakPairsUtil.pairs($a, $f);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PeakPairs =
    copy(left = newLeft, right = newRight)
}
