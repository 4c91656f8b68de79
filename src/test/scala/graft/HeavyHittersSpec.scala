package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHittersAgg, MGBuf}
import graft.operators.Relational

/** a15's contract — the Misra-Gries guarantee (preserved under the
  * Agarwal et al. summary merge, any tree): estimates never overcount,
  * undercount by at most ⌊n/(k+1)⌋, and every item with true frequency
  * above n/(k+1) is present; merge is exactly commutative with zero as
  * identity. Bounded against exact counts (the a07/a14
  * no-oracle-spec-bound precedent).
  */
class HeavyHittersSpec extends SparkSpecBase {

  private val K = 16

  /** Deterministic zipf-ish stream: item i drawn with weight ∝ 1/(i+1)
    * over `universe` items — a few genuine heavy hitters, a long tail.
    */
  private def data(n: Int, universe: Int, seed: Int): Vector[String] = {
    val rnd = new scala.util.Random(seed)
    val w = Vector.tabulate(universe)(i => 1.0 / (i + 1))
    val cum = w.scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    Vector.fill(n) {
      val x = rnd.nextDouble() * tot
      s"item_${cum.indexWhere(x <= _)}"
    }
  }

  private def checkGuarantee(xs: Vector[String], est: Map[String, Long],
                             k: Int, tag: String): Unit = {
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val eps = xs.size.toLong / (k + 1)
    for ((i, e) <- est) {
      assert(e <= exact(i), s"$tag: $i overcounted ($e > ${exact(i)})")
      assert(exact(i) - e <= eps, s"$tag: $i undercounted past n/(k+1) " +
        s"(${exact(i) - e} > $eps)")
    }
    for ((i, c) <- exact if c > eps)
      assert(est.contains(i), s"$tag: heavy item $i (freq $c > $eps) missing")
  }

  test("single-pass summary honors the three-clause Misra-Gries guarantee") {
    val agg = new HeavyHittersAgg(K)
    for ((n, u, seed) <- Seq((20000, 400, 1), (50000, 40, 2), (5000, 8, 3))) {
      val xs = data(n, u, seed)
      val res = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(res.n_items === n.toLong)
      assert(res.hits.size <= K)
      checkGuarantee(xs, res.hits.map(h => h.item -> h.est_cnt).toMap, K,
        s"n=$n u=$u")
    }
  }

  test("merge is exactly commutative, zero is the identity, any tree stays bounded") {
    val agg = new HeavyHittersAgg(K)
    val xs = data(40000, 200, 7)
    val (l, r) = xs.splitAt(17777)
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    def canon(s: MGBuf) = (s.counters.toSeq.sorted, s.n)
    assert(canon(agg.merge(a, b)) === canon(agg.merge(b, a)))
    assert(canon(agg.merge(a, agg.zero)) === canon(a))
    assert(agg.finish(agg.merge(agg.zero, agg.zero)).n_items === 0L)
    for (parts <- Seq(2, 7, 32)) {
      val partials = xs.grouped(math.ceil(xs.size.toDouble / parts).toInt)
        .map(_.foldLeft(agg.zero)(agg.reduce)).toVector
      val leftFold = agg.finish(partials.reduce(agg.merge))
      def balanced(v: Vector[MGBuf]): MGBuf =
        if (v.size == 1) v.head
        else balanced(v.grouped(2).map(g => g.reduce(agg.merge)).toVector)
      for (res <- Seq(leftFold, agg.finish(balanced(partials)))) {
        assert(res.n_items === xs.size.toLong)
        checkGuarantee(xs, res.hits.map(h => h.item -> h.est_cnt).toMap, K,
          s"parts=$parts")
      }
    }
  }

  test("st30's served summary survives a kill/resume and stays bounded") {
    // The st29 restart pattern on the hitters path: pass 1 folds one
    // item block into the per-key MG state and dies; pass 2 resumes
    // over the SAME checkpoint + table. The recovered summary must
    // carry the exact total and honor the three-clause guarantee over
    // ALL delivered items.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[(String, String)]
    val cp = tmpDir("cp_st30_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st30_restart_"), Seq("event_type"), "n_items")
    def base = ms.toDF().toDF("event_type", "uid")
      .groupBy(col("event_type"))
      .agg(graft.functions.HeavyHitters.heavyHitters(K)(col("uid")).as("s"))
      .select(col("event_type"), col("s.n_items").as("n_items"),
        col("s.hits").as("hits"))
    val xs1 = data(20000, 200, 5)
    val xs2 = data(10000, 200, 6)
    ms.addData(xs1.map(("click", _)): _*)
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, then the writer dies
    ms.addData(xs2.map(("click", _)): _*)
    val served = SQ.hittersOnRead(
      SQ.upsertServeWith(spark, base, table, cp)) // resumed pass 2
      .where(col("event_type") === "click").collect()
    val all = xs1 ++ xs2
    assert(served.nonEmpty && served.length <= K)
    assert(served.forall(_.getAs[Long]("n_items") === all.size.toLong),
      "the recovered summary must count every delivered item exactly once")
    checkGuarantee(all,
      served.map(r => r.getAs[String]("item") -> r.getAs[Long]("est_cnt")).toMap,
      K, "st30 restart")
  }

  test("a15 stays bounded against the exact brand counts on the sf corpus") {
    val exact = Relational.a01_brand_revenue(spark, sf)
      .select(col("p_brand"), col("n_lines")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Relational.a15_heavy_hitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty && got.length <= 16)
    val n = got.head._1
    assert(n === exact.values.sum, "n_items must be the exact total")
    val eps = n / 17
    for ((_, brand, est) <- got) {
      assert(est <= exact(brand), s"$brand overcounted")
      assert(exact(brand) - est <= eps, s"$brand undercounted past n/(k+1)")
    }
    for ((brand, c) <- exact if c > eps)
      assert(got.exists(_._2 == brand), s"heavy brand $brand missing")
  }
}
