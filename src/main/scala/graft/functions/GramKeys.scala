package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** `gram_keys(array<long>, n) -> array<long>`: 60-bit keys of all
  * token n-grams, folded from pre-hashed token hashes with a 7-bit
  * rotate-xor chain, with the n-family tag packed into bits 60+ of
  * each key — ONE codegen'd loop, zero gram strings, zero structs.
  *
  * Key of the gram starting at i (0-based, token hashes `h`):
  * {{{
  *   acc = h(i); for o in 1..n-1: acc = rot7(acc) ^ h(i+o)
  *   key = acc | (n << 60)
  * }}}
  * with `rot7(x) = ((x & (2^53-1)) << 7) | (x >>> 53)` — a left
  * rotation within the 60-bit space whose intermediates never leave
  * [0, 2^63), so DuckDB's overflow-strict BIGINT arithmetic can
  * mirror it verbatim (`TextAnalysis.duckGramKey` — keep the two in
  * lockstep; the differential oracle depends on bit equality). The
  * rotation makes the key position-sensitive (plain xor would key
  * "a b" = "b a"); the tag lets callers explode several n-families
  * through one long column and recover n as `key >>> 60`.
  *
  * The builtin formulation (`transform(sequence(...), i -> fold of
  * shiftleft/xor)`) runs interpreted per element — higher-order
  * functions are CodegenFallback; this expression is the t21 hot
  * path, one fused loop per document.
  *
  * Output length is max(0, len-n+1) (empty when the doc has fewer
  * than n tokens). Null elements are not expected (token hashes are
  * never null) and propagate as null keys for the windows touching
  * them; null input propagates (`nullIntolerant`).
  */
case class GramKeys(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_keys"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      right match {
        case Literal(n: Int, _) if n >= 1 && n <= 7 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a literal n in [1, 7]")
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<long>, int literal), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(arr: Any, nv: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = nv.asInstanceOf[Int]
    GramKeys.fold(a, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      s"${ev.value} = graft.functions.GramKeys.fold($a, $n);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GramKeys =
    copy(left = newLeft, right = newRight)
}

object GramKeys {
  private final val Mask53 = (1L << 53) - 1

  /** The fused fold loop, shared by interpreted eval and generated
    * code (the HashUtil pattern).
    */
  def fold(a: ArrayData, n: Int): GenericArrayData = {
    val len = a.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val tag = n.toLong << 60
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      var nullHit = false
      var o = 0
      var acc = 0L
      while (o < n && !nullHit) {
        if (a.isNullAt(i + o)) nullHit = true
        else {
          val h = a.getLong(i + o)
          acc = if (o == 0) h else (((acc & Mask53) << 7) | (acc >>> 53)) ^ h
        }
        o += 1
      }
      if (!nullHit) out(i) = acc | tag
      i += 1
    }
    new GenericArrayData(out)
  }
}
