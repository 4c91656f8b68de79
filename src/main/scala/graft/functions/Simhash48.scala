package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Static SimHash fold shared by interpreted eval and generated code:
  * per bit position k < 48, strict majority vote (`2·count > n`) of
  * the already-hashed token values. Bit-identical to the builtin
  * formulation (`aggregate`/`zip_with` over 48 per-bit counters) the
  * d03 operator previously used — that chain is interpreted
  * (higher-order functions are CodegenFallback) and allocates a
  * 48-element accumulator array per element; this is one primitive
  * loop, no allocation. The bit-identity claim holds for arrays
  * WITHOUT null elements (what every caller passes — `hash60_arr`
  * over `split` output, which has `containsNull = false`); on a null
  * element the builtin chain null-propagates the whole fingerprint,
  * whereas this fold counts it as a no-bits vote (still in `n`).
  */
object SimhashUtil {
  final val Bits = 48

  def simhash48(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      // null elements vote for no bits (same as h = 0), still count in n
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < Bits) {
          counts(k) += ((h >>> k) & 1L).toInt
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < Bits) {
      if (2 * counts(k) > n) fp |= 1L << k
      k += 1
    }
    fp
  }
}

/** `simhash48(array<long>) -> long`: 48-bit SimHash fingerprint of a
  * token-hash array in one codegen'd pass (see [[SimhashUtil]]).
  * Null input propagates (`nullIntolerant`).
  */
case class Simhash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimhashUtil.simhash48(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimhashUtil.simhash48($a);")

  override protected def withNewChildInternal(newChild: Expression): Simhash48 =
    copy(child = newChild)
}
