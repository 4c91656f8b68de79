package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static MinHash fold shared by interpreted eval and generated code:
  * for each seed, the minimum of `h ⊕ seed` over the hashed-shingle
  * array — all k minima in ONE traversal. Bit-identical to the builtin
  * formulation (k × `array_min(transform(hs, h -> h ⊕ seedᵢ))`), which
  * runs k interpreted passes and allocates k arrays per row.
  */
object MinHashUtil {
  def mins(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = h ^ seeds(j)
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k)) // all-null minima
    else new GenericArrayData(out.map(x => x: Any))
  }
}

/** `minhash_mins(array<long>, seedsCsv) -> array<long>`: the k MinHash
  * signature values of a hashed-shingle array, seeds given as a
  * foldable comma-joined long literal. Null input propagates.
  */
case class MinHashMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_mins"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, foldable seed csv)")
    }

  @transient private lazy val seeds: Array[Long] =
    right.eval(null).asInstanceOf[UTF8String].toString
      .split(',').map(_.trim.toLong)

  override protected def nullSafeEval(arr: Any, seedsCsv: Any): Any =
    MinHashUtil.mins(arr.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, (arr, _) =>
      s"${ev.value} = graft.functions.MinHashUtil.mins($arr, $seedsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashMins =
    copy(left = newLeft, right = newRight)
}
