package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** One-pass 64-bit DIFFERENCE perceptual hash (the dHash of Krawetz's
  * "Kind of Like That" family, 1-D form) shared by interpreted eval and
  * generated code: the byte region splits into 65 index strides
  * `[i·n/65, (i+1)·n/65)` (integer-division boundaries, the
  * [[Blockhash64Util]] convention), and bit s (s ∈ [0, 64)) is set iff
  * stride s's mean byte value exceeds stride s+1's — ADJACENT-stride
  * comparisons, where [[Blockhash64Util]] (aHash) compares each stride
  * to the global mean. The compare is the exact integer
  * cross-multiplication `s_s · len_{s+1} > s_{s+1} · len_s` — no float
  * division anywhere, so any engine summing the same bytes produces
  * the identical signature.
  *
  * Why a SECOND perceptual hash: LOCALITY of bit damage. Both hashes
  * are exactly invariant under a UNIFORM brightness shift in this
  * cross-multiplied form (adding c to every byte adds the same
  * `c · len_s · len_{s+1}` — here — or `c · n · len_s` — aHash — to
  * both sides of the compare, which cancels; `DHash64Spec` locks the
  * identity). What separates them is a LOCAL edit: a contiguous
  * patch of L bytes touches only the ⌊L·65/n⌋+2 strides overlapping
  * it, and each dHash bit reads exactly two ADJACENT strides, so at
  * most stridesTouched+1 bits can move — hamming is a local
  * edit-distance proxy. Every aHash bit reads the GLOBAL total, so
  * one local patch moves the mean and flips bits signature-wide
  * (measured on the document corpus: a 10 %-of-length +50 patch
  * flips ≤ 4 dHash bits, avg 1.7, vs avg 23 / max 40 of aHash's 64).
  * A locally-edited copy — the watermark/logo-stamp/partial-re-encode
  * case that dominates real media dedup — stays inside a hamming-3
  * LSH threshold here and blows far past it under the block-mean
  * hash (`DHash64Spec` locks the separation on planted patched
  * copies).
  *
  * Returned as FOUR 16-bit band values (bit k of band j = difference
  * bit 16·j + k) — the same LSH-band layout as [[Blockhash64]]: the
  * bands are simultaneously the hamming candidate join's keys
  * (pigeonhole: hamming < 4 ⟹ ≥ 1 of 4 bands matches exactly) and
  * sign-safe in a BIGINT on every engine.
  */
object DHash64Util {
  final val NumStrides = 65
  final val NumBits = 64
  final val NumBands = 4
  final val BandBits = 16

  /** Shortest input with every stride non-empty. */
  final val MinBytes = 65

  def dhash(buf: Array[Byte]): ArrayData = {
    val n = buf.length
    val sums = new Array[Long](NumStrides)
    var i = 0
    while (i < n) {
      sums((i.toLong * NumStrides / n).toInt) += buf(i) & 0xff
      i += 1
    }
    // stride s spans indices [ceil(s·n/65), ceil((s+1)·n/65))
    def lo(s: Int): Long = (s.toLong * n + NumStrides - 1) / NumStrides
    val bands = new Array[Long](NumBands)
    var s = 0
    while (s < NumBits) {
      val lenS = lo(s + 1) - lo(s)
      val lenT = lo(s + 2) - lo(s + 1)
      if (sums(s) * lenT > sums(s + 1) * lenS)
        bands(s / BandBits) |= 1L << (s % BandBits)
      s += 1
    }
    new GenericArrayData(bands)
  }
}

/** `dhash64(binary) -> array<bigint>` (4 × 16-bit bands): the
  * difference perceptual hash of [[DHash64Util]] in one codegen'd
  * pass. Inputs shorter than [[DHash64Util.MinBytes]] yield null (an
  * empty stride would make its difference bit undefined).
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // short inputs yield null
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    if (buf.length < DHash64Util.MinBytes) null
    else DHash64Util.dhash(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.length < graft.functions.DHash64Util.MinBytes()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DHash64Util.dhash($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** `byte_shift(binary, shift) -> binary`: every byte plus a constant,
  * mod 256 — the deterministic stand-in for a brightness shift /
  * re-encode in the media-dedup fixtures (the container ships no image
  * codecs; the SURVEY multimodal contract). Codegen'd; the shift
  * operand must be a foldable int.
  */
object ByteShiftUtil {
  def shift(buf: Array[Byte], c: Int): Array[Byte] = {
    val out = new Array[Byte](buf.length)
    var i = 0
    while (i < buf.length) {
      out(i) = ((buf(i) & 0xff) + c).toByte
      i += 1
    }
    out
  }
}

case class ByteShift(child: Expression, shift: Int) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_shift"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ByteShiftUtil.shift(input.asInstanceOf[Array[Byte]], shift)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ByteShiftUtil.shift($a, $shift);")

  override protected def withNewChildInternal(newChild: Expression): ByteShift =
    copy(child = newChild)
}
