package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static winnowing fold shared by interpreted eval and generated
  * code: the minimum [[HashUtil.hash60]] over every `width`-token
  * window joined with single spaces — bit-identical to the builtin
  * formulation (`array_min(hash60_arr(transform(sequence(...), i ->
  * concat_ws(" ", toks[i+1..i+width]))))`), which materializes every
  * window string through three interpreted HOFs. Returns
  * `Long.MinValue` as the none-sentinel (mapped to null by the
  * expression) when the array holds fewer than `width` tokens.
  */
object WinnowUtil {
  def winnowMin(arr: ArrayData, width: Int): Long = {
    val n = arr.numElements()
    if (n < width) return Long.MinValue
    val space = UTF8String.fromString(" ")
    var best = Long.MaxValue
    var i = 0
    while (i + width <= n) {
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val h = HashUtil.hash60(UTF8String.concatWs(space, parts: _*))
      if (h < best) best = h
      i += 1
    }
    best
  }
}

/** `winnow_min(array<string>, width) -> long`: minimum 60-bit window
  * hash (document fingerprint); null when fewer than `width` tokens.
  */
case class WinnowMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_min"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, false), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string> not null, foldable int width)")
    }

  @transient private lazy val width: Int =
    right.eval(null).asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) null
    else {
      val v = WinnowUtil.winnowMin(arr.asInstanceOf[ArrayData], width)
      if (v == Long.MinValue) null else v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val arrGen = left.genCode(ctx)
    val v = ctx.freshName("winnow")
    ev.copy(code =
      code"""
            |${arrGen.code}
            |boolean ${ev.isNull} = true;
            |long ${ev.value} = 0L;
            |if (!${arrGen.isNull}) {
            |  long $v = graft.functions.WinnowUtil.winnowMin(${arrGen.value}, $width);
            |  if ($v != Long.MIN_VALUE) { ${ev.isNull} = false; ${ev.value} = $v; }
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowMin =
    copy(left = newLeft, right = newRight)
}
