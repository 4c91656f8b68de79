package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bloom, BloomFilters}

/** Property tests of the mergeable Bloom filter (BloomAgg +
  * bloom_contains) and the j13 pruned-join contract built on it:
  * the no-false-negative law, the fpp envelope, bit-identical merges
  * under any partitioning, codegen/Scala parity, and the plan shape
  * (the membership probe sits BELOW the fact-side exchange — pruning
  * before the shuffle is the whole point).
  */
class BloomSpec extends SparkSpecBase {

  private val Members: Seq[Long] = (0L until 5000L).map(k => k * 7919L + 13L)
  private val NonMembers: Seq[Long] =
    (0L until 20000L).map(k => k * 104729L + 500000009L).filterNot(Members.toSet)

  /** 2¹⁴-bit filter over 5000 keys — deliberately tight (kn/m ≈ 1.5)
    * so the fpp check exercises a realized error rate, not ~0.
    */
  private def tightBits(): Array[Long] = {
    val bits = new Array[Long](1 << 8)
    Members.foreach(Bloom.set(bits, _))
    bits
  }

  test("no false negatives: every inserted key tests positive") {
    val bits = tightBits()
    assert(Members.forall(Bloom.contains(bits, _)),
      "a member key tested negative — the Bloom law is broken")
  }

  test("fpp stays within 2x of the analytic envelope") {
    val bits = tightBits()
    val m = bits.length * 64.0
    val expected = math.pow(1 - math.exp(-Bloom.K * Members.size / m), Bloom.K)
    val observed =
      NonMembers.count(Bloom.contains(bits, _)).toDouble / NonMembers.size
    assert(observed <= 2 * expected,
      s"observed fpp $observed exceeds 2x the analytic $expected")
    assert(observed >= expected / 2,
      s"observed fpp $observed implausibly low vs analytic $expected — hashing degenerate?")
  }

  test("merge is bit-identical under any partitioning (OR-mergeable summary)") {
    import spark.implicits._
    def bitsOf(parts: Int): (Seq[Long], Long) = {
      val r = Members.toDF("k").repartition(parts, col("k"))
        .agg(BloomFilters.bloom(1 << 14)(col("k")).as("bf"))
        .select(col("bf.bits"), col("bf.n_keys")).head()
      (r.getSeq[Long](0), r.getLong(1))
    }
    val (b1, n1) = bitsOf(1)
    val (b8, n8) = bitsOf(8)
    assert(n1 === Members.size.toLong && n8 === n1)
    assert(b1 === b8, "merge-tree-dependent bits — Bloom must be order-free")
    assert(b1 === tightBits().toSeq, "aggregated bits diverge from sequential insertion")
  }

  test("bloom_contains (codegen) agrees with the Scala reference on members and non-members") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val bits = tightBits()
    val probes = (Members.take(500) ++ NonMembers.take(2000)).toDF("k")
    val got = probes
      .select(col("k"), BloomFilters.mightContain(typedLit(bits), col("k")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got.foreach { case (k, hit) =>
      assert(hit === Bloom.contains(bits, k), s"codegen/Scala disagree on key $k")
    }
  }

  test("st36: the stream-built summary prunes exactly as the batch build (= j13)") {
    val streamed = graft.streaming.StreamQueries
      .queries("st36_stream_bloom_build")(spark, sf)
      .collect().map(_.toSeq.mkString(",")).sorted
    val batch = graft.operators.Relational.j13_bloom_prune_join(spark, sf)
      .collect().map(_.toSeq.mkString(",")).sorted
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq,
      "the incrementally built filter diverges from the batch build")
  }

  test("j13: probe below the fact exchange; result equals the un-pruned join") {
    val df = graft.operators.Relational.j13_bloom_prune_join(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val shjAt = plan.indexOf("ShuffledHashJoin")
    val probeAt = plan.indexOf("bloom_contains")
    assert(shjAt >= 0, s"the exact join must run as the hinted shuffle-hash join:\n$plan")
    assert(probeAt >= 0, s"the bloom probe is missing from the plan:\n$plan")
    // tree strings print parents before their subtrees: the probe at a
    // larger offset than the join is INSIDE it — i.e. below the
    // fact-side exchange, pruning before the shuffle
    assert(probeAt > shjAt, s"the probe must sit below the exact join:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 1,
      s"exactly the one bounded 1-row summary join is allowed:\n$plan")

    val exact = {
      val hot = graft.Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      graft.Tables.lineitem(spark, sf)
        .join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(graft.Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
    }
    val got = df.collect().map(_.toSeq.mkString(",")).sorted.toSeq
    val want = exact.collect().map(_.toSeq.mkString(",")).sorted.toSeq
    assert(got.nonEmpty && got === want,
      "bloom pruning changed the join result — it may only prune, never drop members")
  }
}
