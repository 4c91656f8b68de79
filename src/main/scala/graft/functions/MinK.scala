package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** A (hash, id) candidate flowing into a distinct min-k aggregation. */
case class HashedId(h: Long, id: Long)

/** Buffer/result: at most k DISTINCT candidates, sorted ascending by
  * (h, id) — the KMV bottom-k set.
  */
case class MinKBuf(items: Seq[HashedId])

/** Distinct bottom-k by (h asc, id asc) as a typed [[Aggregator]] —
  * the KMV sketch's maintenance operator (a17's order statistic as
  * mergeable state). Unlike [[TopKAggregator]] the buffer is a SET:
  * re-deliveries of the same (h, id) are absorbed, which is what lets
  * the sketch run over a raw event stream (users repeat) without a
  * distinct pass in front.
  *
  * Merge-tree independent BY CONSTRUCTION: the result is "the k
  * smallest distinct elements of the union", and min-k ∘ union is
  * associative, commutative and idempotent — any partial grouping or
  * delivery order yields the bit-identical buffer (the st14/st36
  * artifact discipline; `MinKSpec` asserts it structurally). Per-row
  * cost O(k) with the sorted-buffer fast reject; merge O(k).
  */
class MinKDistinctAggregator(k: Int)
    extends Aggregator[HashedId, MinKBuf, MinKBuf] {

  private val ord: Ordering[HashedId] =
    Ordering.by((s: HashedId) => (s.h, s.id))

  override def zero: MinKBuf = MinKBuf(Vector.empty)

  override def reduce(b: MinKBuf, a: HashedId): MinKBuf = {
    // fast reject: buffer full and candidate sorts at-or-after the last
    // kept element (at = duplicate of the boundary, also a no-op)
    if (b.items.size >= k && ord.compare(a, b.items.last) >= 0) b
    else MinKBuf((b.items :+ a).distinct.sorted(ord).take(k))
  }

  override def merge(x: MinKBuf, y: MinKBuf): MinKBuf =
    MinKBuf((x.items ++ y.items).distinct.sorted(ord).take(k))

  override def finish(r: MinKBuf): MinKBuf = r

  override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
  override def outputEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
}

object MinK {
  /** Untyped-agg entry point: `minK(64)(hashCol, idCol)` yields a
    * struct<items: array<struct<h,id>>> column, items ascending.
    */
  def minK(k: Int)(h: Column, id: Column): Column =
    udaf(new MinKDistinctAggregator(k), Encoders.product[HashedId]).apply(h, id)
}
