package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** A (score, id) candidate flowing into a top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Aggregation buffer/result: at most k candidates, sorted by
  * (score desc, id asc) — the id tiebreak makes ranking deterministic
  * under score ties.
  */
case class TopKBuf(items: Seq[ScoredId])

/** Bounded top-k by (score desc, id asc) as a typed [[Aggregator]].
  *
  * This is the 100 TB-scale shape for similarity search: map-side
  * partial aggregation keeps only k candidates per partition, so a
  * top-k over N vectors shuffles O(k × partitions) rows instead of N
  * (a `Window`+`row_number` plan would shuffle and sort the full
  * candidate set per query). SURVEY.md §7.3 ("similarity top-k (M3):
  * custom Aggregator").
  *
  * reduce/merge keep the buffer sorted and truncated to k, so per-row
  * cost is O(k) and merge cost O(k); k is small (≤ 100s).
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    // fast reject: buffer full and candidate sorts after the last kept
    if (b.items.size >= k && ord.compare(a, b.items.last) >= 0) b
    else TopKBuf((b.items :+ a).sorted(ord).take(k))
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.items ++ y.items).sorted(ord).take(k))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopK {
  /** Untyped-agg entry point: `topK(10)(scoreCol, idCol)` yields a
    * struct<items: array<struct<score,id>>> column.
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId]).apply(score, id)
}
