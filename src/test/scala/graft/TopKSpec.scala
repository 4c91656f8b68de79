package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.{ScoredId, TopKAggregator}

/** Property tests for the bounded top-k Aggregator: any partitioning
  * of the input into reduce/merge trees yields the same result as a
  * global sort-and-take. Seeded random cases (deterministic).
  */
class TopKSpec extends AnyFunSuite {

  private def cases(seed: Int): Seq[List[ScoredId]] = {
    val rnd = new Random(seed)
    (0 until 200).map { _ =>
      val n = rnd.nextInt(40)
      // small id/score spaces force ties in both dimensions
      List.fill(n)(ScoredId((rnd.nextInt(21) - 10).toDouble, rnd.nextInt(15).toLong))
    }
  }

  private def expected(items: List[ScoredId], k: Int): Seq[ScoredId] =
    items.sortBy(s => (-s.score, s.id)).take(k)

  test("reduce-only accumulation matches sort-and-take") {
    val agg = new TopKAggregator(5)
    for (items <- cases(1)) {
      val got = items.foldLeft(agg.zero)(agg.reduce).items
      assert(got === expected(items, 5), s"input: $items")
    }
  }

  test("arbitrary partition + merge matches sort-and-take") {
    val agg = new TopKAggregator(3)
    val rnd = new Random(2)
    for (items <- cases(3)) {
      val nParts = rnd.nextInt(5) + 1
      val parts = items.grouped(math.max(1, (items.size + nParts - 1) / nParts)).toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).items === expected(items, 3), s"input: $items")
    }
  }

  test("buffer never exceeds k") {
    val agg = new TopKAggregator(2)
    for (items <- cases(4)) {
      assert(items.foldLeft(agg.zero)(agg.reduce).items.size <= 2)
    }
  }
}
