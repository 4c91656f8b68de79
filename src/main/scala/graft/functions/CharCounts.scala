package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-character frequency table shared by interpreted
  * eval and generated code: one `(ch, c)` struct per DISTINCT character
  * of the input, in first-occurrence order, where a "character" is one
  * UTF-8 code point sliced exactly as Spark's own `substring` slices it
  * (`UTF8String.numBytesForFirstByte` — so even malformed sequences
  * split identically to the builtin formulation this replaces).
  *
  * r18 optimization (guide §4 — keep the hot path in codegen): the
  * character-entropy consumers (t37 and its ingest twin st84)
  * previously exploded one row PER CHARACTER through
  * `transform(sequence(0, length-1), i -> substring(text, i+1, 1))` —
  * a per-char single-char-string allocation plus an O(chars)-row
  * explode into the (doc, ch) aggregation (~2.7 M rows at sf0.1). This
  * kernel folds the count into one pass over the document's bytes, so
  * the explode that follows carries one row per DISTINCT character
  * (alphabet-bounded) and the aggregation disappears entirely. The
  * (doc_id, ch, c) relation is bit-identical to the old formulation's
  * aggregate; the DuckDB oracles are untouched.
  */
object CharCountsUtil {

  def charCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < bytes.length) {
      val w0 = UTF8String.numBytesForFirstByte(bytes(i))
      val w = math.min(w0, bytes.length - i)
      val ch = UTF8String.fromBytes(bytes, i, w)
      val prev = counts.get(ch)
      counts.put(ch, if (prev == null) 1L else prev + 1L)
      i += w
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `char_counts(string) -> array<struct<ch: string, c: bigint>>`: the
  * distinct-character frequency table of [[CharCountsUtil.charCounts]]
  * in one codegen'd pass. Empty input yields an empty array; null
  * propagates.
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ch", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharCountsUtil.charCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharCountsUtil.charCounts($a);")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}
