package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Shared Bloom-filter arithmetic for the aggregate ([[BloomAgg]]) and
  * the membership test ([[BloomMightContain]]): k = [[Bloom.K]] probe
  * positions per key via Kirsch-Mitzenmacher double hashing
  * (h₁ + i·h₂ mod m — two mixes give k independent-enough probes,
  * Kirsch & Mitzenmacher 2006), the mixes being the splitmix64
  * finalizer (Steele et al. 2014). The bit width m is carried by the
  * bits array itself (m = 64·words), so the test side needs no
  * out-of-band config — any filter the aggregate emits is testable
  * as-is.
  *
  * SIZING (the 100 TB contract): fpp ≈ (1 − e^(−kn/m))^k; at the
  * classic m/n = 10 bits per key, k = 5 gives fpp ≈ 0.9 %. The
  * summary is m/8 bytes REGARDLESS of n — 2²⁰ bits = 128 KB covers
  * ~100 K keys at <1 % fpp, and a billion-key build side still
  * broadcasts at 2³³ bits = 1 GB where the exact key set never could.
  */
object Bloom {
  /** Probe count, fixed across build and test sides. */
  val K = 5

  /** splitmix64 finalizer — a full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Second hash of the double-hashing family — decorrelated by a
    * pre-xor with the golden-ratio constant, forced odd so all k
    * probes stay distinct mod any power-of-two m.
    */
  def mix2(key: Long): Long = mix(key ^ 0x9E3779B97F4A7C15L) | 1L

  def set(bits: Array[Long], key: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix(key); val h2 = mix2(key)
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  def contains(bits: Array[Long], key: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix(key); val h2 = mix2(key)
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      if (((bits((pos >>> 6).toInt) >>> (pos & 63L)) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}

/** Aggregation buffer of [[BloomAgg]]: the bit words plus the exact
  * inserted-key count (n rides along so consumers can compute the
  * realized fpp ≈ (1 − e^(−kn/m))^k from the summary alone).
  */
case class BloomBuf(bits: Array[Long], n: Long)

/** j13's summary row: the filter bits and the exact build-side count. */
case class BloomSummary(bits: Array[Long], n_keys: Long)

/** MERGEABLE BLOOM FILTER as a typed [[Aggregator]] — the fourth
  * mergeable summary next to a07's HLL (distinct counts), a14's
  * KLL/MRL (quantiles) and a15's Misra-Gries (frequent items): the
  * set-membership summary that turns a too-big-to-broadcast join
  * build side into a broadcastable m-bit prune (Bloom 1970; the
  * mergeability framing is Agarwal et al., PODS 2012).
  *
  * Map-side partial aggregation reduces each partition of the build
  * side to one m-bit buffer, the exchange carries one buffer per
  * partition, and merge is bitwise OR — associative, commutative,
  * idempotent. Unlike the other three sketches the result is
  * BIT-IDENTICAL under every merge tree (the set-bit union does not
  * depend on order or grouping), which `BloomSpec` asserts; it still
  * carries no DuckDB oracle of its own because the bits hash with a
  * JVM-side mix, but every QUERY built on it stays exactly
  * oracle-checkable — the filter only prunes, membership is
  * re-verified by the exact join it guards (false positives cost a
  * shuffled row, never a wrong row; false negatives cannot happen).
  *
  * Error bound: fpp ≈ (1 − e^(−kn/m))^k, ≈0.9 % at m/n = 10 bits/key
  * with k = 5; `BloomSpec` asserts the no-false-negative law exactly
  * and the observed fpp within 2× of the formula.
  */
class BloomAgg(numBits: Int) extends Aggregator[Long, BloomBuf, BloomSummary] {
  require(numBits >= 64 && numBits % 64 == 0,
    "numBits must be a positive multiple of 64")
  private val words = numBits / 64

  override def zero: BloomBuf = BloomBuf(new Array[Long](words), 0L)

  override def reduce(b: BloomBuf, key: Long): BloomBuf = {
    Bloom.set(b.bits, key)
    BloomBuf(b.bits, b.n + 1L)
  }

  override def merge(x: BloomBuf, y: BloomBuf): BloomBuf = {
    val out = new Array[Long](words)
    var i = 0
    while (i < words) { out(i) = x.bits(i) | y.bits(i); i += 1 }
    BloomBuf(out, x.n + y.n)
  }

  override def finish(r: BloomBuf): BloomSummary = BloomSummary(r.bits, r.n)

  override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  override def outputEncoder: Encoder[BloomSummary] = Encoders.product[BloomSummary]
}

object BloomFilters {
  /** Untyped-agg entry point: `bloom(1 << 20)(keyCol)` yields a
    * struct<bits: array<bigint>, n_keys: bigint> summary column.
    */
  def bloom(numBits: Int)(key: Column): Column =
    udaf(new BloomAgg(numBits), Encoders.scalaLong).apply(key)

  /** Membership test column: true iff `key` MAY be in the filter
    * (definitely-absent keys return false). Requires
    * [[graft.plans.GraftExtensions]] registration on the session.
    */
  def mightContain(bits: Column, key: Column): Column =
    call_function("bloom_contains", bits, key)
}

/** Codegen'd Bloom membership test over (array<bigint> bits, bigint
  * key) — the probe-side twin of [[BloomAgg]], k probes inlined into
  * one whole-stage-codegen fragment with no per-row allocation. The
  * bits operand is in practice the single broadcast summary row of a
  * `bloom(...)` aggregation, so the generated loop tests against an
  * in-memory constant array.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint) arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(bitsAny: Any, keyAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[ArrayData]
    val key = keyAny.asInstanceOf[Long]
    val m = bits.numElements().toLong * 64L
    val h1 = Bloom.mix(key); val h2 = Bloom.mix2(key)
    var i = 0
    while (i < Bloom.K) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      if (((bits.getLong((pos >>> 6).toInt) >>> (pos & 63L)) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key) => {
      val m = ctx.freshName("m")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      // splitmix64 finalizer, inlined twice (key, then key ^ golden)
      def mixCode(in: String, out: String): String =
        s"""
           |long $out; { long $z = $in;
           |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
           |  $out = $z ^ ($z >>> 31); }
         """.stripMargin
      s"""
         |final long $m = (long) $bits.numElements() * 64L;
         |${mixCode(key, h1)}
         |${mixCode(s"($key ^ 0x9E3779B97F4A7C15L)", s"$h2")}
         |final long ${h2}_odd = $h2 | 1L;
         |boolean $hit = true;
         |for (int $i = 0; $i < ${Bloom.K}; $i++) {
         |  final long $pos = (($h1 + $i * ${h2}_odd) & Long.MAX_VALUE) % $m;
         |  if ((($bits.getLong((int) ($pos >>> 6)) >>> ($pos & 63L)) & 1L) == 0L) {
         |    $hit = false; break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
