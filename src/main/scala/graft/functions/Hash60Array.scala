package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static md5→60-bit helper shared by interpreted eval and generated
  * code. Bit-identical to [[Portable.hash60]]'s
  * `conv(substr(md5(s),1,15),16,10)`: the first 15 hex chars of an md5
  * are bytes 0–6 plus the high nibble of byte 7.
  */
object HashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }
}

/** `hash60_arr(array<string>) -> array<long>`: the portable 60-bit
  * hash ([[Portable.hash60]]) over every element in ONE codegen'd
  * loop. The builtin formulation (`transform(arr, s ->
  * conv(substr(md5(s),1,15),16,10))`) runs interpreted per element —
  * higher-order functions are CodegenFallback — and round-trips each
  * hash through a hex *string* before re-parsing it; this expression
  * digests straight to the long. Null elements propagate as null
  * elements; null input propagates (`nullIntolerant`).
  */
case class Hash60Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60_arr"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = HashUtil.hash60(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = graft.functions.HashUtil.hash60($a.getUTF8String($i));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Hash60Array =
    copy(child = newChild)
}
