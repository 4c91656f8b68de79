package graft

import org.apache.spark.sql.functions._
import graft.functions.{QuantileSketchAgg, QSketchBuf}
import graft.operators.Relational

/** a14's contract: the deterministic MRL/KLL-family compactor must
  * stay inside its worst-case rank-error envelope against EXACT order
  * statistics (the a07 bound-vs-exact-twin precedent), obey the merge
  * laws its docstring claims (commutativity is exact; associativity
  * holds as the bound, not bit equality — every compacting sketch's
  * trade), and agree with a13 on the distributed path.
  */
class QuantileSketchSpec extends SparkSpecBase {

  private val K = 256
  private val Qs = Seq(0.5, 0.9, 0.99)

  /** Worst-case rank error of the k-compactor on n items (docstring
    * derivation: n·H/⌊k/2⌋, H = #levels).
    */
  private def bound(n: Int, k: Int): Long = {
    val h = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n.toLong / k)) + 1)
    n.toLong * h / (k / 2)
  }

  /** Deterministic value stream with duplicates and skew. */
  private def data(n: Int, seed: Int): Vector[Double] = {
    val rnd = new scala.util.Random(seed)
    Vector.fill(n)(math.floor(math.pow(rnd.nextDouble(), 3) * 10000) / 10)
  }

  private def rankOf(sorted: Vector[Double], v: Double): Long =
    sorted.count(_ <= v).toLong // highest rank any instance of v occupies

  private def lowRankOf(sorted: Vector[Double], v: Double): Long =
    sorted.count(_ < v).toLong + 1 // lowest rank any instance occupies

  test("sketch quantiles stay inside the worst-case rank envelope") {
    val agg = new QuantileSketchAgg(K)
    for (n <- Seq(1000, 20000, 100000); seed <- Seq(1, 2)) {
      val xs = data(n, seed)
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      val res = agg.finish(buf)
      assert(res.n_events === n.toLong)
      val sorted = xs.sorted
      val eps = bound(n, K)
      for ((q, got) <- Qs.zip(Seq(res.p50, res.p90, res.p99))) {
        val target = math.ceil(q * n).toLong
        val lo = lowRankOf(sorted, got)
        val hi = rankOf(sorted, got)
        // some rank of the returned value must be within the envelope
        val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
        assert(err <= eps,
          s"n=$n seed=$seed q=$q: rank error $err > bound $eps (value $got)")
      }
    }
  }

  test("merge is exactly commutative and zero is the identity") {
    val agg = new QuantileSketchAgg(K)
    val xs = data(30000, 7)
    val (l, r) = xs.splitAt(11111)
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    def canon(s: QSketchBuf) = (s.levels.map(_.sorted), s.flips, s.n)
    assert(canon(agg.merge(a, b)) === canon(agg.merge(b, a)))
    assert(canon(agg.merge(a, agg.zero)) === canon(a))
    assert(agg.finish(agg.merge(agg.zero, agg.zero)).n_events === 0L)
  }

  test("any merge tree lands inside the envelope (partition invariance)") {
    val agg = new QuantileSketchAgg(K)
    val n = 60000
    val xs = data(n, 11)
    val sorted = xs.sorted
    val eps = bound(n, K)
    for (parts <- Seq(2, 7, 32)) {
      val chunks = xs.grouped(math.ceil(n.toDouble / parts).toInt).toVector
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      // left-fold tree and balanced pairwise tree
      val leftFold = partials.reduce(agg.merge)
      def balanced(v: Vector[QSketchBuf]): QSketchBuf =
        if (v.size == 1) v.head
        else balanced(v.grouped(2).map(g => g.reduce(agg.merge)).toVector)
      for (buf <- Seq(leftFold, balanced(partials))) {
        val res = agg.finish(buf)
        assert(res.n_events === n.toLong)
        for ((q, got) <- Qs.zip(Seq(res.p50, res.p90, res.p99))) {
          val target = math.ceil(q * n).toLong
          val lo = lowRankOf(sorted, got)
          val hi = rankOf(sorted, got)
          val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
          assert(err <= eps, s"parts=$parts q=$q: rank error $err > bound $eps")
        }
      }
    }
  }

  test("st29's served sketch survives a kill/resume; quantiles stay in the envelope") {
    // The serving twin's restart contract (the st23 kill/resume
    // pattern): pass 1 folds one value block into the keyed sketch
    // state and dies; pass 2 resumes over the SAME checkpoint + table
    // with a second block. The recovered sketch must carry the exact
    // total count and the served percentiles must sit inside the
    // worst-case envelope over ALL delivered values — state recovery
    // that lost or double-counted a block would blow the count check,
    // and a buffer mangled in the checkpoint round-trip the envelope.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[(String, Double)]
    val cp = tmpDir("cp_st29_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st29_restart_"), Seq("event_type"), "n_events")
    def base = ms.toDF().toDF("event_type", "value")
      .groupBy(col("event_type"))
      .agg(graft.functions.QuantileSketch.quantileSketch(K)(col("value")).as("s"))
      .select(col("event_type"), col("s.n_events").as("n_events"),
        col("s.p50").as("p50"), col("s.p90").as("p90"), col("s.p99").as("p99"))
    val xs1 = data(20000, 3)
    val xs2 = data(10000, 4)
    ms.addData(xs1.map(("lat", _)): _*)
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, then the writer dies
    ms.addData(xs2.map(("lat", _)): _*)
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed pass 2
    val row = served.where(col("event_type") === "lat").collect() match {
      case Array(r) => r
      case other => fail(s"expected one served row, got ${other.length}")
    }
    val all = xs1 ++ xs2
    assert(row.getAs[Long]("n_events") === all.size.toLong,
      "the recovered sketch must count every delivered value exactly once")
    val sorted = all.sorted
    val eps = bound(all.size, K)
    for ((q, got) <- Qs.zip(Seq(row.getAs[Double]("p50"),
        row.getAs[Double]("p90"), row.getAs[Double]("p99")))) {
      val target = math.ceil(q * all.size).toLong
      val lo = lowRankOf(sorted, got)
      val hi = rankOf(sorted, got)
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= eps, s"q=$q: served rank error $err > bound $eps (value $got)")
    }
  }

  test("a14 agrees with the exact a13 within the envelope on the sf corpus") {
    val exact = Relational.a13_value_quantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val sk = Relational.a14_quantile_sketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(sk.keySet === exact.keySet)
    // a14 runs at k=2048; every sf group is far below k·2, so the
    // sketch never compacts and the answers are EXACTLY a13's picks
    // when n < 2k — the strongest cheap cross-check available here.
    for ((t, (n, p50, p90, p99)) <- exact) {
      val (n2, q50, q90, q99) = sk(t)
      assert(n2 === n, s"$t count")
      if (n < 2 * 2048)
        assert((q50, q90, q99) === ((p50, p90, p99)), s"$t exact-regime mismatch")
      else {
        val sortedRanks = Seq(0.5 -> q50, 0.9 -> q90, 0.99 -> q99)
        val eps = bound(n.toInt, 2048)
        // re-derive ranks from the raw values for the big-group regime
        val vals = Tables.events(spark, sf).where(col("event_type") === t)
          .select(col("value")).collect().map(_.getDouble(0)).sorted.toVector
        for ((q, got) <- sortedRanks) {
          val target = math.ceil(q * n).toLong
          val lo = vals.count(_ < got).toLong + 1
          val hi = vals.count(_ <= got).toLong
          val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
          assert(err <= eps, s"$t q=$q err $err > $eps")
        }
      }
    }
  }
}
