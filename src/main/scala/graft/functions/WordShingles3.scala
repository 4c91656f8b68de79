package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static shingling shared by interpreted eval and generated code:
  * DISTINCT 3-gram word shingles of a space-separated text, first
  * occurrence order — bit-identical to the builtin formulation
  *
  * {{{
  *   array_distinct(transform(sequence(0, size(toks)-3),
  *     i -> concat_ws(" ", toks[i+1], toks[i+2], toks[i+3])))
  * }}}
  *
  * over `toks = split(text, " ")` (trailing empties kept, like Spark
  * `split` with limit −1), with the `size < 3 ⇒ empty` guard folded
  * in. The builtin chain is interpreted end-to-end (sequence,
  * transform, three element_at + concat_ws per window, array_distinct)
  * and is the hottest per-row cost in both near-dup index builds; this
  * is one pass over the token array with a dedup set.
  */
object ShingleUtil {
  def shingles3(text: UTF8String): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** `word_shingles3(string) -> array<string>`: distinct 3-gram word
  * shingles in first-occurrence order (see [[ShingleUtil]]). Null
  * input propagates.
  */
case class WordShingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleUtil.shingles3($t);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles3 =
    copy(child = newChild)
}
