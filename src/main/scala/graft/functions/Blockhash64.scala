package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** One-pass 64-bit block-mean perceptual hash shared by interpreted
  * eval and generated code — the media-similarity signature of the
  * blockhash family (Yang et al., "Block Mean Value Based Image
  * Perceptual Hashing"): the byte region splits into 64 index strides
  * `[i·n/64, (i+1)·n/64)` (integer-division boundaries, the
  * [[ByteStatsUtil]] convention), and bit i is set iff stride i's mean
  * byte value exceeds the global mean. The compare is the EXACT
  * integer cross-multiplication `s_i · n > total · len_i` — no
  * float division anywhere, so any engine summing the same bytes
  * produces the identical signature.
  *
  * The signature is returned as FOUR 16-bit band values (bit k of
  * band j = stride 16·j + k), because the bands are simultaneously
  * the LSH keys of the hamming candidate join (pigeonhole: hamming
  * < 4 ⟹ at least one of 4 bands matches exactly) and sign-safe in
  * a BIGINT on every engine (a packed 64-bit value would overflow
  * DuckDB's checked `<<` at bit 63).
  */
object Blockhash64Util {
  final val NumStrides = 64
  final val NumBands = 4
  final val BandBits = 16

  /** Shortest input with every stride non-empty. */
  final val MinBytes = 64

  def blockhash(buf: Array[Byte]): ArrayData = {
    val n = buf.length
    val sums = new Array[Long](NumStrides)
    var total = 0L
    var i = 0
    while (i < n) {
      sums((i.toLong * NumStrides / n).toInt) += buf(i) & 0xff
      total += buf(i) & 0xff
      i += 1
    }
    val bands = new Array[Long](NumBands)
    var s = 0
    while (s < NumStrides) {
      // stride s holds bytes with floor(i·64/n) = s, i.e. indices
      // [ceil(s·n/64), ceil((s+1)·n/64)) — the same mapping the
      // assignment loop uses, restated as bounds for the length term
      val lo = (s.toLong * n + NumStrides - 1) / NumStrides
      val hi = ((s + 1).toLong * n + NumStrides - 1) / NumStrides
      if (sums(s) * n > total * (hi - lo))
        bands(s / BandBits) |= 1L << (s % BandBits)
      s += 1
    }
    new GenericArrayData(bands)
  }
}

/** `blockhash64(binary) -> array<bigint>` (4 × 16-bit bands): the
  * block-mean perceptual hash of [[Blockhash64Util]] in one codegen'd
  * pass. Inputs shorter than [[Blockhash64Util.MinBytes]] yield null
  * (an empty stride would make its bit undefined).
  */
case class Blockhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // short inputs yield null
  override def prettyName: String = "blockhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    if (buf.length < Blockhash64Util.MinBytes) null
    else Blockhash64Util.blockhash(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.length < graft.functions.Blockhash64Util.MinBytes()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.Blockhash64Util.blockhash($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Blockhash64 =
    copy(child = newChild)
}
