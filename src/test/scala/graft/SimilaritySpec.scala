package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.GraftExtensions

/** d05's cell-cap behavior: an oversized cell must be hash-split into
  * sub-buckets (bounded candidate fan-out), while cells at or under the
  * cap keep the full within-cell pair set.
  */
class SimilaritySpec extends SparkSpecBase {

  /** n identical unit-ish vectors in one `label` cell — every generated
    * candidate pair has cosine 1.0, so the operator's output count IS
    * the candidate count.
    */
  private def oneCellCorpus(n: Int) = {
    import spark.implicits._
    val v = Array.tabulate(16)(i => (i + 1).toFloat)
    (0 until n).map(i => (i.toLong, 1L, v)).toDF("vec_id", "label", "v")
  }

  /** n25's point: the re-rank's win must show up in RANK-weighted
    * terms, not just set recall — and a perfect ranking must pin the
    * metrics at their integer ceilings (MRR 10⁶ ⇔ first hit at rank
    * 1; nDCG 1000‰ ⇔ every position relevant).
    */
  test("n25: rerank dominates adc on mean nDCG; metric ceilings are exact") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Similarity.n25_retrieval_eval(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    def mean(m: String, f: ((String, Long, Long, Long)) => Long) = {
      val xs = out.filter(_._1 == m).map(f(_).toDouble)
      xs.sum / xs.length
    }
    val adcN = mean("adc", _._4); val rrN = mean("rerank", _._4)
    assert(rrN >= adcN, s"re-rank mean nDCG $rrN below adc $adcN")
    // ceilings: any query with ndcg_pm = 1000 must also carry mrr 10⁶,
    // and no metric exceeds its ceiling
    out.foreach { case (m, qid, mrr, ndcg) =>
      assert(mrr <= 1000000L && ndcg <= 1000L, s"$m/$qid metric over ceiling")
      if (ndcg == 1000L) assert(mrr == 1000000L, s"$m/$qid perfect nDCG but MRR $mrr")
    }
  }

  /** d17's verdict contract: in every candidate near-dup pair the
    * less-central member is dropped, so (a) no pair survives with
    * BOTH members kept, and (b) each cell's most-central member
    * (cent6 desc, vec_id asc) can never lose a comparison — it is
    * always kept. Both are invariants the differential can't state
    * (it only re-derives the same rows).
    */
  test("d17: no intact near-dup pair survives; cell champions always survive") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Similarity.d17_semdedup(spark, sf)
    out.cache()
    val dropped = out.where(!col("keep")).count()
    assert(dropped > 0, "fixture must make the verdict non-vacuous")
    // every cell's (cent6 desc, vec_id asc) champion is kept
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell_id")).orderBy(col("cent6").desc, col("vec_id"))
    val champsDropped = out
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && !col("keep")).count()
    assert(champsDropped === 0, s"$champsDropped cell champions were dropped")
    // no judged pair keeps BOTH members
    val (_, pairs) = graft.operators.Similarity.semDedupParts(spark, sf)
    val keepFlags = out.select(col("vec_id"), col("keep"))
    val intact = pairs
      .join(keepFlags.select(col("vec_id").as("vec_a"), col("keep").as("ka")), "vec_a")
      .join(keepFlags.select(col("vec_id").as("vec_b"), col("keep").as("kb")), "vec_b")
      .where(col("ka") && col("kb")).count()
    assert(intact === 0, s"$intact near-dup pairs survived with both members kept")
    out.unpersist()
  }

  test("an oversized cell is sub-bucketed: fan-out stays far below c²") {
    GraftExtensions.register(spark)
    val n = 300
    val cap = 50
    val pairs = Similarity.nearDupPairs(oneCellCorpus(n), cap).count()
    val allPairs = n.toLong * (n - 1) / 2 // 44850 — the uncapped explosion
    assert(pairs > 0, "sub-bucketed cells must still emit within-bucket pairs")
    // nsub = 6; a perfectly even split gives 6·C(50,2) = 7350; hash
    // imbalance can push above that but must stay well under c²
    assert(pairs < allPairs / 3, s"fan-out $pairs not bounded (all-pairs $allPairs)")
  }

  test("a cell at the cap keeps the complete pair set (nsub = 1)") {
    GraftExtensions.register(spark)
    val n = 40
    val pairs = Similarity.nearDupPairs(oneCellCorpus(n), cellCap = 50).count()
    assert(pairs === n.toLong * (n - 1) / 2)
  }

  test("d10: exactly the planted contaminants flag; no natural train vector does") {
    // Precision AND recall of the semantic gate on the sf corpus: the
    // flagged set must be exactly the planted perturbed eval copies
    // (ids + 2000000 — cosine ≈ 0.94 to their originals), because the
    // natural corpus's max train-eval cosine sits far below the 0.8
    // threshold; each plant must name its original among its hits via
    // a max_cos6 in the perturbation's range.
    val got = Similarity.d10_semantic_decontam(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_eval_hits"), r.getAs[Double]("max_cos6"))).toMap
    val planted = Tables.embeddings(spark, sf)
      .where(col("vec_id") % 80 === 7)
      .collect().map(_.getAs[Long]("vec_id") + 2000000L).toSet
    assert(planted.nonEmpty, "fixture must plant at least one contaminant")
    assert(got.keySet === planted,
      s"flagged set must be exactly the plants; got ${got.keySet}, want $planted")
    for ((id, (hits, mc)) <- got) {
      assert(hits >= 1L, s"$id must hit at least its own original")
      assert(mc >= 0.85 && mc <= 1.0, s"$id max_cos6 $mc outside the plant range")
    }
  }

  test("st31 at ingest flags exactly the set batch d10 flags, scores equal") {
    // The two gates share the threshold and arithmetic; at spec scale
    // every cell is under d10's cap, so the batch sub-bucketing drops
    // nothing and the ingest gate (broadcast eval, no cap) must agree
    // bit-for-bit on ids, hit counts, and worst cosines.
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_eval_hits"), r.getAs[Double]("max_cos6"))).toMap
    val batch = toMap(Similarity.d10_semantic_decontam(spark, sf).collect())
    val ingest = toMap(graft.streaming.StreamQueries
      .queries("st31_stream_semantic_decontam")(spark, sf).collect())
    assert(batch.nonEmpty, "fixture must flag at least one contaminant")
    assert(ingest === batch,
      s"ingest and batch gates must agree; ingest $ingest vs batch $batch")
  }

  test("n06: recall@10 is in [0,1] and never drops when probing more cells") {
    val rows = Similarity.n06_ivf_recall(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("probes"), r.getAs[Long]("query_id"),
        r.getAs[Double]("recall10")))
    try {
      assert(rows.length === 10, "2 probe depths × 5 queries")
      assert(rows.forall { case (_, _, rc) => rc >= 0.0 && rc <= 1.0 })
      val byQuery = rows.groupBy(_._2).view.mapValues(_.sortBy(_._1).map(_._3))
      byQuery.foreach { case (q, rc) =>
        assert(rc.length === 2 && rc(1) >= rc(0),
          s"query $q: recall(P=3)=${rc(1)} < recall(P=1)=${rc(0)}")
      }
    } finally spark.catalog.clearCache()
  }

  test("n13: filtered recall is in [0,1], per-query monotone in probes, mean below unfiltered") {
    val filtered = Similarity.n13_filtered_ivf(spark, sf).collect()
      .map(r => (r.getAs[Long]("probes"), r.getAs[Long]("query_id"),
        r.getAs[Double]("recall10")))
    spark.catalog.clearCache()
    val unfiltered = Similarity.n06_ivf_recall(spark, sf).collect()
      .map(r => (r.getAs[Long]("probes"), r.getAs[Double]("recall10")))
    try {
      assert(filtered.length === 10, "2 probe depths × 5 queries")
      assert(filtered.forall { case (_, _, rc) => rc >= 0.0 && rc <= 1.0 })
      filtered.groupBy(_._2).foreach { case (q, rs) =>
        val rc = rs.sortBy(_._1).map(_._3)
        assert(rc(1) >= rc(0),
          s"query $q: filtered recall(P=3)=${rc(1)} < recall(P=1)=${rc(0)}")
      }
      // the label predicate thins each probed cell's candidate set, so
      // MEAN filtered recall must not exceed unfiltered at the same P
      // (per-query inversions are possible; the mean is the stable
      // statistic on this fixed corpus)
      for (p <- Seq(1L, 3L)) {
        val mf = filtered.collect { case (`p`, _, rc) => rc }
        val mu = unfiltered.collect { case (`p`, rc) => rc }
        assert(mf.sum / mf.length <= mu.sum / mu.length + 1e-9,
          s"P=$p: mean filtered recall above unfiltered")
      }
    } finally spark.catalog.clearCache()
  }

  test("retrain gate: skewed or low-cohesion stats trigger, balanced do not") {
    import spark.implicits._
    val skewed = Seq((0L, 100L, 0.9), (1L, 5L, 0.9), (2L, 5L, 0.9))
      .toDF("cell_id", "n_members", "mean_cos6")
    val hSkew = Similarity.indexHealth(skewed)
    assert(hSkew.nCells === 3 && hSkew.maxMembers === 100L)
    assert(hSkew.skew > 2.0)
    assert(Similarity.retrainNeeded(hSkew, maxSkew = 2.0, minCohesion = 0.5))
    val balanced = Seq((0L, 10L, 0.9), (1L, 11L, 0.92), (2L, 9L, 0.88))
      .toDF("cell_id", "n_members", "mean_cos6")
    assert(!Similarity.retrainNeeded(
      Similarity.indexHealth(balanced), maxSkew = 2.0, minCohesion = 0.5))
    val lowCohesion = Seq((0L, 10L, 0.9), (1L, 10L, 0.1))
      .toDF("cell_id", "n_members", "mean_cos6")
    assert(Similarity.retrainNeeded(
      Similarity.indexHealth(lowCohesion), maxSkew = 2.0, minCohesion = 0.5))
  }

  test("maintainIndex wires build → monitor → retrain on the real corpus") {
    // thresholds that force a retrain on any real stats: one more Lloyd
    // round must come back as a non-empty centroid relation
    val (h, retrained, cents) =
      Similarity.maintainIndex(spark, sf, maxSkew = 1.0 - 1e-9, minCohesion = 1.0)
    assert(retrained && h.nCells > 0 && h.meanMembers > 0)
    assert(cents.count() > 0)
    spark.catalog.clearCache()
    // thresholds no real index can breach: serve the existing centroids
    val (h2, retrained2, current) =
      Similarity.maintainIndex(spark, sf, maxSkew = 1e9, minCohesion = -1.0)
    assert(!retrained2 && h2.nCells > 0)
    // the coarse list can only carry cells at-or-above those with members
    assert(current.count() >= h2.nCells)
    spark.catalog.clearCache()
  }

  test("pickNprobe: cheapest depth meeting the target; deepest as fallback") {
    import spark.implicits._
    val sweep = Seq(
      (1L, 0L, 0.4), (1L, 1L, 0.6), // mean 0.5
      (2L, 0L, 0.7), (2L, 1L, 0.9), // mean 0.8
      (3L, 0L, 0.9), (3L, 1L, 0.9)) // mean 0.9
      .toDF("probes", "query_id", "recall10")
    assert(Similarity.pickNprobe(sweep, 0.75) === 2)
    assert(Similarity.pickNprobe(sweep, 0.85) === 3)
    assert(Similarity.pickNprobe(sweep, 0.99) === 3, "unreachable target -> deepest")
  }

  test("pickNprobe on the fixture sweep returns PickedNprobe — the depth n17 serves at") {
    val sweep = Similarity.n16_probe_sweep(spark, sf)
    try assert(Similarity.pickNprobe(sweep, Similarity.NprobeTargetRecall) ===
      Similarity.PickedNprobe,
      "the serving-depth loop must be closed: n17's depth IS the sweep's pick")
    finally spark.catalog.clearCache()
  }

  test("n20: tombstone accounting closes — compactedIndex IS the planned survivor set") {
    try {
      val plan = Similarity.n20_index_delete(spark, sf).collect()
      // per-cell arithmetic and the touched flag are internally consistent
      plan.foreach { r =>
        assert(r.getLong(3) === r.getLong(1) - r.getLong(2), s"n_after mismatch in $r")
        assert(r.getBoolean(4) === (r.getLong(2) > 0), s"touched flag mismatch in $r")
      }
      // the plan's totals equal the physical artifacts: sum(n_before) is the
      // whole index, sum(n_after) is exactly what the serving anti-join keeps
      val all = Similarity.indexRows(spark, sf)
      val kept = Similarity.compactedIndex(spark, sf)
      val nVecs = all.select("vec_id").distinct.count()
      assert(plan.map(_.getLong(1)).sum === nVecs)
      assert(plan.map(_.getLong(3)).sum === kept.select("vec_id").distinct.count())
      // no tombstoned id survives; no surviving id was tombstoned
      assert(kept.where(col("vec_id") % Similarity.DeleteMod === 3).count() === 0)
      assert(all.count() - kept.count() ===
        all.where(col("vec_id") % Similarity.DeleteMod === 3).count())
    } finally spark.catalog.clearCache()
  }

  /** n21's dynamic-overwrite contract, proven through the production
    * write path: a compaction restricted to ONE cell rewrites exactly
    * that cell's directory — every other cell's files stay
    * byte-identical (name, size, mtime) — and the full pass leaves
    * per-cell counts equal to the plan's n_after with no tombstoned
    * id surviving anywhere.
    */
  test("n21: rewrite touches only planned cells; untouched files stay byte-stable") {
    val path = tmpDir("graft_n21_")
    Similarity.buildIndexTable(spark, sf, path)
    def listing(cell: Long) = {
      val d = new java.io.File(s"$path/cell_id=$cell")
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    }
    val plan = Similarity.n20_index_delete(spark, sf).collect()
    val touched = plan.filter(_.getAs[Boolean]("touched")).map(_.getAs[Long]("cell_id"))
    assert(touched.nonEmpty, "fixture must tombstone something")
    val one = touched.min
    val others = plan.map(_.getAs[Long]("cell_id")).filter(_ != one)
    val before = others.map(c => c -> listing(c)).toMap
    Similarity.executeCompaction(spark, sf, path, col("cell_id") === one)
    others.foreach(c => assert(listing(c) === before(c),
      s"cell $c was not in the restricted plan but its files changed"))
    val oneRows = spark.read.parquet(s"$path/cell_id=$one")
    assert(oneRows.where(col("vec_id") % Similarity.DeleteMod === 3).count() === 0L,
      "the rewritten cell must hold no tombstoned id")
    Similarity.executeCompaction(spark, sf, path)
    val counts = spark.read.parquet(path)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number]("cell_id").longValue -> r.getAs[Long]("n")).toMap
    plan.foreach(r => assert(counts(r.getAs[Long]("cell_id")) === r.getAs[Long]("n_after"),
      s"cell ${r.getAs[Long]("cell_id")}: read-back count must equal the plan's n_after"))
    assert(spark.read.parquet(path)
      .where(col("vec_id") % Similarity.DeleteMod === 3).count() === 0L)
  }
}
