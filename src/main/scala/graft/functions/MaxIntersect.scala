package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** `max_intersect(array<array<long>>, array<long>) -> int`: the largest
  * per-item distinct-intersection size — exactly
  * `aggregate(ess, 0, (acc, es) -> greatest(acc, size(array_intersect(es, ds))))`
  * in one pass with ONE hash set over `ds` (r18, guide §4): the
  * builtin fold re-built an intersection hash set per eval item per
  * document (|eval| set constructions per row — st18's measured
  * contamination-gate share was ~4.4 s of 11.3 s at sf0.1); this
  * kernel builds the probe set once per row and streams every eval
  * item through it, counting each distinct member at most once.
  *
  * Semantics pinned to the builtin fold: per item, the count is
  * |distinct(es) ∩ distinct(ds)| (both sides deduped, exactly like
  * `array_intersect`); an empty outer array yields 0; null propagates.
  */
object MaxIntersectUtil {

  def maxIntersect(ess: ArrayData, ds: ArrayData): Int = {
    val dsSet = new java.util.HashSet[java.lang.Long](math.max(16, ds.numElements() * 2))
    var i = 0
    while (i < ds.numElements()) { dsSet.add(ds.getLong(i)); i += 1 }
    var best = 0
    var k = 0
    while (k < ess.numElements()) {
      val es = ess.getArray(k)
      val seen = new java.util.HashSet[java.lang.Long]()
      var c = 0
      var j = 0
      while (j < es.numElements()) {
        val v = es.getLong(j)
        if (dsSet.contains(v) && seen.add(v)) c += 1
        j += 1
      }
      if (c > best) best = c
      k += 1
    }
    best
  }
}

case class MaxIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "max_intersect"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(LongType, _), _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<bigint>>, array<bigint>), got " +
        s"(${a.simpleString}, ${b.simpleString})")
  }

  override protected def nullSafeEval(ess: Any, ds: Any): Any =
    MaxIntersectUtil.maxIntersect(
      ess.asInstanceOf[ArrayData], ds.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MaxIntersectUtil.maxIntersect($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxIntersect =
    copy(left = newLeft, right = newRight)
}
