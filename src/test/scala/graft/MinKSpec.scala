package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.{HashedId, MinKBuf, MinKDistinctAggregator}

/** The KMV maintenance aggregator's contract: exactly the k smallest
  * DISTINCT (h, id) pairs, bit-identical under any delivery order,
  * partial grouping, or re-delivery.
  */
object MinKSpec extends Properties("graft.MinK") {

  private val K = 8
  private def agg = new MinKDistinctAggregator(K)

  private def reference(xs: Seq[HashedId]): Seq[HashedId] =
    xs.distinct.sortBy(s => (s.h, s.id)).take(K)

  private def reduceAll(xs: Seq[HashedId]): MinKBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  private val genItem: Gen[HashedId] = for {
    h <- Gen.chooseNum(0L, 30L) // tight range -> frequent duplicates
    id <- Gen.chooseNum(0L, 10L)
  } yield HashedId(h, id)

  private val genItems: Gen[List[HashedId]] = Gen.listOf(genItem)

  property("fold = k smallest distinct") = forAll(genItems) { xs =>
    reduceAll(xs).items == reference(xs)
  }

  property("merge of any split = unsplit fold, commutatively") =
    forAll(genItems, Gen.chooseNum(0, 100)) { (xs, cutPct) =>
      val (a, b) = xs.splitAt(xs.size * cutPct / 100)
      agg.merge(reduceAll(a), reduceAll(b)).items == reference(xs) &&
        agg.merge(reduceAll(b), reduceAll(a)).items == reference(xs)
    }

  property("re-delivery absorbed: double-feed and self-merge are no-ops") =
    forAll(genItems) { xs =>
      reduceAll(xs ++ xs).items == reference(xs) &&
        agg.merge(reduceAll(xs), reduceAll(xs)).items == reference(xs)
    }
}
