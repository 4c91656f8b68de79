package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Aggregation buffer of [[HeavyHittersAgg]]: the ≤k Misra-Gries
  * counters plus the exact item count.
  */
case class MGBuf(counters: Map[String, Long], n: Long)

/** One summary entry: the item and its (under-)estimated count —
  * `est_cnt` ∈ [true − n/(k+1), true].
  */
case class MGHit(item: String, est_cnt: Long)

/** a15's output row: exact item count + the surviving counters ranked
  * by (−est, item).
  */
case class MGResult(n_items: Long, hits: Seq[MGHit])

/** MERGEABLE HEAVY-HITTERS SUMMARY as a typed [[Aggregator]] — the
  * Misra-Gries frequent-items algorithm (Misra & Gries 1982) with the
  * summary merge of Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * keep ≤ k counters; an unseen item beyond capacity decrements every
  * counter (dropping zeros); two summaries merge by summing counters
  * and subtracting the (k+1)-th largest combined count from all
  * (entries ≤ 0 drop — at most k stay strictly positive, so the merge
  * needs no tie-break and is exactly COMMUTATIVE).
  *
  * This closes the mergeable-summary trio a 100 TB dashboard runs on:
  * distinct counts (HLL, a07), quantiles (the MRL/KLL compactor, a14),
  * and frequent items (this) — each reduces a partition map-side to an
  * O(k) state, so the exchange carries k counters per partition
  * instead of the grouped column, and no full groupBy of a
  * high-cardinality key ever happens.
  *
  * ERROR BOUND (both papers' guarantee, preserved under any merge
  * tree): est_cnt never overcounts, and undercounts by at most
  * ⌊n/(k+1)⌋ total stream length n — so every item with true
  * frequency > n/(k+1) is GUARANTEED present in the summary.
  * `HeavyHittersSpec` asserts all three clauses against exact counts
  * plus the merge laws.
  *
  * DETERMINISM: reduce is order-dependent (every counter-based
  * summary's trade) and merge is commutative but tree-dependent, so —
  * the a07/a14 precedent — a query built on this carries no DuckDB
  * oracle; the spec bounds it against the exact answer instead.
  */
class HeavyHittersAgg(k: Int) extends Aggregator[String, MGBuf, MGResult] {
  require(k >= 1, "k must be a positive counter capacity")

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, item: String): MGBuf = {
    val c = b.counters
    val next =
      if (c.contains(item)) c.updated(item, c(item) + 1L)
      else if (c.size < k) c.updated(item, 1L)
      else c.collect { case (i, ct) if ct > 1L => i -> (ct - 1L) }
    MGBuf(next, b.n + 1L)
  }

  override def merge(x: MGBuf, y: MGBuf): MGBuf = {
    val summed = y.counters.foldLeft(x.counters) { case (acc, (i, ct)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + ct)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count; ≤ k entries stay > 0
        val kth = summed.valuesIterator.toArray.sortBy(-_).apply(k)
        summed.collect { case (i, ct) if ct > kth => i -> (ct - kth) }
      }
    MGBuf(trimmed, x.n + y.n)
  }

  override def finish(r: MGBuf): MGResult =
    MGResult(r.n,
      r.counters.toSeq.map { case (i, ct) => MGHit(i, ct) }
        .sortBy(h => (-h.est_cnt, h.item)))

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGResult] = Encoders.product[MGResult]
}

object HeavyHitters {
  /** Untyped-agg entry point: `heavyHitters(16)(itemCol)` yields a
    * struct<n_items, hits: array<struct<item, est_cnt>>> column.
    */
  def heavyHitters(k: Int)(item: Column): Column =
    udaf(new HeavyHittersAgg(k), Encoders.STRING).apply(item)
}
