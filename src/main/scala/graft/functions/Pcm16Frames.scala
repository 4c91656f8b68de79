package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** One-pass 16-bit PCM frame statistics shared by interpreted eval and
  * generated code — the audio twin of [[ByteStatsUtil]].
  *
  * The input is a raw little-endian signed-int16 sample region (a WAV
  * data chunk); a trailing odd byte is ignored. Samples are framed
  * into [[Pcm16FramesUtil.FrameLen]]-sample windows (trailing partial
  * frame kept) and each frame accumulates EXACT integer statistics:
  *
  *   n_samples  samples in the frame (== FrameLen except the tail)
  *   sum_sq     Σ s², the RMS numerator (|s| ≤ 2¹⁵ so a frame's sum
  *              fits a Long with ~2⁴⁰ headroom)
  *   peak       max |s|
  *   n_cross    strict sign changes between CONSECUTIVE samples within
  *              the frame (s[i]·s[i+1] < 0 — zeros never cross)
  *
  * All four are integers, so any engine decoding the same bytes
  * produces identical values — the differential-oracle property; the
  * only derived double (RMS = sqrt(sum_sq/n)) is left to the caller as
  * one exact-rounded IEEE division + sqrt.
  */
object Pcm16FramesUtil {
  /** Samples per analysis frame. */
  final val FrameLen = 64

  /** Samples per peak window for [[Pcm16Peaks]] — much finer than
    * [[FrameLen]]: the constellation fingerprint (mm13) needs a dense
    * landmark series (tens of points per clip), where the analysis
    * frames give a corpus document only 2-5 points.
    */
  final val PeakWin = 8

  /** Per-[[PeakWin]]-sample-window peak |amplitude| series, one pass. */
  def pcm16Peaks(buf: Array[Byte]): ArrayData = {
    val nSamp = buf.length / 2
    val nWin = (nSamp + PeakWin - 1) / PeakWin
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * PeakWin
      val end = math.min(start + PeakWin, nSamp)
      var peak = 0L
      var i = start
      while (i < end) {
        val s = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        i += 1
      }
      out(w) = peak
      w += 1
    }
    new GenericArrayData(out)
  }

  def pcm16Frames(buf: Array[Byte]): ArrayData = {
    val nSamp = buf.length / 2
    val nFrames = (nSamp + FrameLen - 1) / FrameLen
    val rows = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * FrameLen
      val end = math.min(start + FrameLen, nSamp)
      var sumSq = 0L
      var peak = 0L
      var cross = 0L
      var prev = 0
      var i = start
      while (i < end) {
        // little-endian signed 16-bit
        val s = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
        val a = math.abs(s.toLong)
        sumSq += s.toLong * s
        if (a > peak) peak = a
        if (i > start && prev.toLong * s < 0) cross += 1
        prev = s
        i += 1
      }
      rows(f) = new GenericInternalRow(
        Array[Any](f.toLong, (end - start).toLong, sumSq, peak, cross))
      f += 1
    }
    new GenericArrayData(rows)
  }
}

/** `pcm16_frames(binary) -> array<struct<frame_id, n_samples, sum_sq,
  * peak, n_cross>>`: per-frame 16-bit PCM amplitude statistics in one
  * codegen'd byte pass ([[Pcm16FramesUtil]]). Inputs with fewer than
  * 2 bytes (no complete sample) yield null, so callers need no guard.
  */
case class Pcm16Frames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("n_cross", LongType, nullable = false))), containsNull = false)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // sample-less inputs yield null
  override def prettyName: String = "pcm16_frames"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    if (buf.length < 2) null
    else Pcm16FramesUtil.pcm16Frames(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.length < 2) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.Pcm16FramesUtil.pcm16Frames($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Pcm16Frames =
    copy(child = newChild)
}

/** `pcm16_peaks(binary) -> array<bigint>`: peak |amplitude| per
  * [[Pcm16FramesUtil.PeakWin]]-sample window in one codegen'd byte pass
  * — the dense landmark series the constellation fingerprint pairs
  * over. Inputs with fewer than 2 bytes yield null (the
  * [[Pcm16Frames]] contract).
  */
case class Pcm16Peaks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "pcm16_peaks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    if (buf.length < 2) null
    else Pcm16FramesUtil.pcm16Peaks(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.length < 2) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.Pcm16FramesUtil.pcm16Peaks($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Pcm16Peaks =
    copy(child = newChild)
}
