package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Aggregation buffer of [[QuantileSketchAgg]]: per-level value
  * buffers (an item at level l carries weight 2ˡ), the per-level
  * compaction-parity bits packed in `flips` (bit l = the offset the
  * NEXT compaction of level l starts at), and the exact item count.
  */
case class QSketchBuf(levels: Seq[Seq[Double]], flips: Long, n: Long)

/** a14's output row: exact count + sketched p50/p90/p99 (NaN when the
  * group is empty).
  */
case class QSketchResult(n_events: Long, p50: Double, p90: Double, p99: Double)

/** MERGEABLE QUANTILE SKETCH as a typed [[Aggregator]] — the
  * deterministic multi-level compactor of the MRL/KLL family (Manku
  * et al. 1998; Karnin-Lang-Liberty 2016 is the randomized
  * refinement): level buffers of capacity k; a full level is sorted
  * and every other element promoted with doubled weight, the start
  * offset alternating per level (the parity bit) so consecutive
  * compactions cancel rank error instead of accumulating bias.
  *
  * This is the 100 TB shape a13's docstring promises: map-side
  * partial aggregation reduces each partition to an O(k·H) sketch
  * (H = #levels ≈ log₂(n/k)), so the exchange carries one ~100 KB
  * sketch per (group, partition) instead of the full value column,
  * and no partition-local sort of ~20 TB per group ever happens.
  *
  * ERROR BOUND: one compaction of a level-l buffer shifts any
  * cumulative-weight (rank) query by at most 2ˡ; level l compacts at
  * most n/(2ˡ·⌊k/2⌋) times, so the worst-case rank error is
  * Σ_l 2ˡ·n/(2ˡ·⌊k/2⌋) = n·H/⌊k/2⌋ ≈ 2nH/k — e.g. k=2048, n=10⁶
  * (H≈9): ε ≤ 0.9 % of rank, and the alternating parity makes the
  * typical error far smaller (signed errors random-walk). The spec
  * (`QuantileSketchSpec`) asserts the worst-case envelope against
  * exact order statistics and the merge laws.
  *
  * DETERMINISM: reduce/merge are deterministic functions of the
  * (multiset) inputs — ties sort by value, so equal values are
  * interchangeable and merge is exactly COMMUTATIVE; but, as for
  * every compacting sketch (HLL excepted), the result depends on the
  * merge TREE: a different partitioning can produce a different (but
  * equally bounded) sketch, which is why a14 follows the a07
  * precedent — no DuckDB oracle, spec-bounded against the exact twin
  * a13 instead.
  */
class QuantileSketchAgg(k: Int) extends Aggregator[Double, QSketchBuf, QSketchResult] {
  require(k >= 4 && k % 2 == 0, "k must be an even capacity >= 4")

  override def zero: QSketchBuf = QSketchBuf(Vector(Vector.empty), 0L, 0L)

  override def reduce(b: QSketchBuf, v: Double): QSketchBuf =
    compact(QSketchBuf(updatedLevel0(b.levels, v), b.flips, b.n + 1))

  override def merge(x: QSketchBuf, y: QSketchBuf): QSketchBuf = {
    val h = math.max(x.levels.size, y.levels.size)
    val lv = Vector.tabulate(h) { l =>
      val a = if (l < x.levels.size) x.levels(l) else Vector.empty
      val b = if (l < y.levels.size) y.levels(l) else Vector.empty
      (a ++ b).toVector
    }
    // xor of parity bits: commutative, so merge(x, y) == merge(y, x)
    compact(QSketchBuf(lv, x.flips ^ y.flips, x.n + y.n))
  }

  override def finish(r: QSketchBuf): QSketchResult = {
    if (r.n == 0L) return QSketchResult(0L, Double.NaN, Double.NaN, Double.NaN)
    // weighted order statistics over (value, 2^level) pairs
    val items = r.levels.zipWithIndex.flatMap { case (buf, l) =>
      val w = 1L << l
      buf.map(v => (v, w))
    }.sortBy(_._1).toIndexedSeq
    val total = items.iterator.map(_._2).sum
    def q(p: Double): Double = {
      val target = math.max(1L, math.ceil(p * total).toLong)
      var cum = 0L
      var i = 0
      while (i < items.size) {
        cum += items(i)._2
        if (cum >= target) return items(i)._1
        i += 1
      }
      items.last._1
    }
    QSketchResult(r.n, q(0.5), q(0.9), q(0.99))
  }

  private def updatedLevel0(levels: Seq[Seq[Double]], v: Double): Vector[Vector[Double]] = {
    val lv = levels.iterator.map(_.toVector).toVector
    lv.updated(0, lv(0) :+ v)
  }

  /** Compact every over-capacity level bottom-up (a promotion can
    * cascade into the next level; the single upward pass covers it
    * because promotions only move weight to HIGHER levels).
    */
  private def compact(b: QSketchBuf): QSketchBuf = {
    var lv = b.levels.iterator.map(_.toVector).toVector
    var flips = b.flips
    var l = 0
    while (l < lv.size) {
      if (lv(l).size >= k) {
        val sorted = lv(l).sorted
        val off = ((flips >> l) & 1L).toInt
        flips ^= 1L << l
        val promoted = Vector.tabulate((sorted.size - off + 1) / 2)(i => sorted(off + 2 * i))
        lv = lv.updated(l, Vector.empty)
        if (l + 1 >= lv.size) lv = lv :+ Vector.empty[Double]
        lv = lv.updated(l + 1, lv(l + 1) ++ promoted)
      }
      l += 1
    }
    QSketchBuf(lv, flips, b.n)
  }

  override def bufferEncoder: Encoder[QSketchBuf] = Encoders.product[QSketchBuf]
  override def outputEncoder: Encoder[QSketchResult] = Encoders.product[QSketchResult]
}

object QuantileSketch {
  /** Untyped-agg entry point: `quantileSketch(2048)(valueCol)` yields
    * a struct<n_events, p50, p90, p99> column.
    */
  def quantileSketch(k: Int)(value: Column): Column =
    udaf(new QuantileSketchAgg(k), Encoders.scalaDouble).apply(value)
}
