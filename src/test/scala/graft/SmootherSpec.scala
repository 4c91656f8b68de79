package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks the two analytic claims the w21/w22/d31 docstrings make.
  *
  * 1. w21's exactness argument: with α = 1/2 every EWMA term is an
  *    exact dyadic rational (a multiple of 2^-16), so the 16-term
  *    double sum is ASSOCIATIVE — bit-identical in any summation
  *    order — as long as every partial sum fits 53 mantissa bits,
  *    i.e. cents < 2^37. (The first draft claimed 2^40; THIS TEST
  *    refuted it at the 1-ulp level — a multiple of 2^-16 near 2^40
  *    needs 56 bits. Beyond 2^37 the hash parity still holds because
  *    both engines evaluate the SAME pinned left-assoc chain; the
  *    associativity property is just no longer the reason.)
  *
  * 2. d31's bounded-peel claim: the fixed [[graft.operators.Dedup]]
  *    peel depth is AT the fixpoint for the fixture graph — one more
  *    round changes nothing — so the bounded loop computes the true
  *    2-core here, not a truncation artifact.
  */
class SmootherSpec extends AnyFunSuite {

  test("dyadic EWMA terms sum bit-identically in any order") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val xs = Array.fill(16)(rnd.nextLong() & ((1L << 37) - 1))
      val terms = xs.zipWithIndex.map { case (x, i) =>
        x.toDouble / (1L << (i + 1))
      }
      val fwd = terms.foldLeft(0.0)(_ + _)
      val rev = terms.reverse.foldLeft(0.0)(_ + _)
      val shuf = rnd.shuffle(terms.toSeq).foldLeft(0.0)(_ + _)
      assert(java.lang.Double.doubleToRawLongBits(fwd) ==
        java.lang.Double.doubleToRawLongBits(rev))
      assert(java.lang.Double.doubleToRawLongBits(fwd) ==
        java.lang.Double.doubleToRawLongBits(shuf))
    }
  }
}

/** d31's peel-depth-is-converged lock (separate suite: needs Spark). */
class KcoreConvergenceSpec extends SparkSpecBase {

  /** The d31 peel re-run at an explicit depth. */
  private def core(rounds: Int): Set[Long] = {
    val edges = graft.operators.Dedup.simhashEdges(spark, sf)
    var keep = edges.select(col("doc_a").as("doc_id")).distinct()
    for (_ <- 1 to rounds) {
      keep = edges
        .join(keep.select(col("doc_id").as("ka")), col("doc_a") === col("ka"))
        .join(keep.select(col("doc_id").as("kb")), col("doc_b") === col("kb"))
        .groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= 2)
        .select(col("doc_a").as("doc_id"))
        .localCheckpoint(false)
    }
    keep.collect().map(_.getLong(0)).toSet
  }

  test("the 6-round 2-core peel is at the fixpoint on the fixture") {
    val s6 = core(6)
    val s7 = core(7)
    assert(s6 == s7, "one more peel round changed the core")
    assert(s6.nonEmpty, "degenerate fixture: empty 2-core")
  }
}
