package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Row-local Gopher repetition statistics over a pre-hashed token
  * array — the t21/st28 battery's per-document numbers in ONE pass,
  * with zero exploded rows and zero exchanges.
  *
  * r18 optimization (guide §2.4 "remove shuffles outright" + §4): the
  * repetition consumers (t21, the c02/c03/c05/c06 capstone stage-5
  * signal table, and the st28 ingest twin) exploded ≤3 gram rows per
  * token (n ∈ {2,3,5} tagged keys via [[GramKeys]]) into a
  * (doc, gram)-keyed aggregation and a (doc, family) rollup — two full
  * exchanges of corpus-sized row sets, plus (for st28) TWO windowed
  * stateful operators holding every open (window, doc, gram) row.
  * Every one of those statistics is DOCUMENT-LOCAL: all grams of a
  * document share its doc_id (batch) or its single event-time window
  * (st28), so the group-by never mixes documents. This kernel folds
  * the same tagged 60-bit keys ([[GramKeys.fold]] arithmetic, bit for
  * bit — including the documented within-doc collision merge, which
  * keys counts by the SAME folded longs) into a per-family
  * open-addressing count table and emits the aggregate the two
  * exchanges used to produce:
  *
  *   per family n: top  = max multiplicity of any n-gram key
  *                 npos = number of n-gram positions (len − n + 1)
  *                 dup  = Σ multiplicities > 1
  *
  * A family with npos = 0 (document shorter than n tokens) reports
  * zeros; callers derive the original NULL-fraction semantics as
  * `when(npos > 0, top/npos)` and drop documents with npos2 = 0
  * entirely (`n_tokens >= 2`), which is exactly the row set the
  * exploded formulation produced (a doc with no gram rows never
  * reached the aggregation). A null token hash (never produced by
  * `hash60_arr`, but handled for parity) voids the windows touching
  * it into a single NULL-key group, exactly as `explode` + group-by
  * counted them.
  */
object RepStatsUtil {

  private final val Mask53 = (1L << 53) - 1

  /** One family's (top, npos, dup) written into out[off..off+2]. */
  private def famStats(a: ArrayData, n: Int, out: Array[Long], off: Int): Unit = {
    val len = a.numElements()
    val m = len - n + 1
    if (m <= 0) {
      out(off) = 0L; out(off + 1) = 0L; out(off + 2) = 0L
      return
    }
    // open-addressing multiset: pow2 capacity ≥ 2m keeps load ≤ 0.5
    var cap = 4
    while (cap < (m << 1)) cap <<= 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    val mask = cap - 1
    val tag = n.toLong << 60
    var nullCnt = 0L
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
      if (nullHit) nullCnt += 1
      else {
        val key = acc | tag
        val hh = key ^ (key >>> 32)
        var idx = (hh ^ (hh >>> 16)).toInt & mask
        while (cnts(idx) != 0 && keys(idx) != key) idx = (idx + 1) & mask
        keys(idx) = key
        cnts(idx) += 1
      }
      i += 1
    }
    var top = nullCnt // the NULL-key group counts like any group
    var dup = if (nullCnt > 1L) nullCnt else 0L
    var j = 0
    while (j < cap) {
      val c = cnts(j)
      if (c > top) top = c.toLong
      if (c > 1) dup += c
      j += 1
    }
    out(off) = top; out(off + 1) = m.toLong; out(off + 2) = dup
  }

  def stats(a: ArrayData): InternalRow = {
    val b = new Array[Long](9)
    famStats(a, 2, b, 0)
    famStats(a, 3, b, 3)
    famStats(a, 5, b, 6)
    InternalRow(b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7), b(8))
  }
}

/** `rep_stats(array<long>) -> struct<top2,n2,dup2,top3,n3,dup3,top5,
  * n5,dup5: bigint>`: the per-document repetition battery of
  * [[RepStatsUtil.stats]] in one codegen'd pass. Null input propagates.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top2", LongType, nullable = false),
    StructField("n2", LongType, nullable = false),
    StructField("dup2", LongType, nullable = false),
    StructField("top3", LongType, nullable = false),
    StructField("n3", LongType, nullable = false),
    StructField("dup3", LongType, nullable = false),
    StructField("top5", LongType, nullable = false),
    StructField("n5", LongType, nullable = false),
    StructField("dup5", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rep_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepStatsUtil.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepStatsUtil.stats($a);")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}
