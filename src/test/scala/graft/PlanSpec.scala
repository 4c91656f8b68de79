package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ResolvedHint}
import org.apache.spark.sql.functions.{col, date_format, input_file_name}
import graft.operators.Relational

/** Physical/logical plan assertions — the scale-safety contract from
  * the round-1 verdict: no forced broadcasts on SF-scaling dimensions,
  * pushdown reaching the scan, top-k executing without a global sort.
  */
class PlanSpec extends SparkSpecBase {

  /** Tables a join may hint-broadcast: bounded dims only. */
  private val BoundedDims = Set("nation", "region")

  private def hintedTables(df: DataFrame): Seq[String] = {
    def relations(p: LogicalPlan): Seq[String] = p.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
          case _ => Seq.empty[String]
        }
    }.flatten
    df.queryExecution.analyzed.collect { case h: ResolvedHint => relations(h.child) }.flatten
  }

  test("scaling dims carry no broadcast hint (part/customer grow with SF)") {
    for (q <- Seq(
        Relational.j01_lookup_join, Relational.j02_broadcast_enrich,
        Relational.a01_brand_revenue, Relational.a02_type_revenue,
        Relational.a05_top_brands)) {
      val hinted = hintedTables(q(spark, sf))
      assert(hinted.forall(BoundedDims.contains),
        s"forced broadcast on scaling table(s): ${hinted.filterNot(BoundedDims.contains)}")
    }
  }

  test("bounded dims ARE hinted where intended (s06, j02)") {
    assert(hintedTables(Relational.s06_dim_scan(spark, sf)).contains("region"))
    val j02 = hintedTables(Relational.j02_broadcast_enrich(spark, sf))
    assert(j02.contains("nation") && j02.contains("region"))
  }

  test("p09: filter is pushed into the parquet scan and columns are pruned") {
    val plan = Relational.p09_filter_flag(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(l_returnflag,R)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_returnflag:string>"),
      s"scan reads more than the projected columns:\n$plan")
  }

  test("a05: top-k executes as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.a05_top_brands(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected top-k plan:\n$plan")
  }

  test("n03: centroid side broadcasts; argmax aggregates partially map-side") {
    val plan = graft.operators.Similarity.n03_cell_assign(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid scoring must broadcast the bounded side:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("HashAggregate(keys=[vec_id"),
      s"per-vector argmax must partially aggregate before the shuffle:\n$plan")
  }

  test("j10: the range join executes as an equi-join on the day bucket, never a nested loop") {
    val plan = Relational.j10_range_join(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval decomposition must give Spark an equi-key:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/sort-merge join on the bucket:\n$plan")
  }

  test("pq encode: codebooks broadcast; per-(vector, m) argmin aggregates partially map-side") {
    // n07 itself now reads the prebuilt index (the shared-build
    // contract), so the scale lock targets the encode pipeline the
    // build runs.
    graft.plans.GraftExtensions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").as("v"))
    val plan = graft.operators.Similarity
      .pqEncodeL(e, graft.operators.Similarity.pqSeedBooks(e), carryVec = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"codebook scoring must broadcast the bounded side:\n$plan")
    assert(plan.contains("partial_min"),
      s"the per-(vector, m) argmins must partially aggregate before the shuffle:\n$plan")
  }

  /** Flatten an executed plan into nodes, resolving AQE wrappers and
    * treating cache scans as leaves (their build plan is separate).
    */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: flatten(q.plan)
    case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(s)
    case o => o +: o.children.flatMap(flatten)
  }

  private def shingleExchanges(ps: Seq[org.apache.spark.sql.execution.SparkPlan]): Int =
    ps.count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.toString.contains("s#")
      case _ => false
    }

  test("t14: packing plans as ONE exchange on the shard key + a pruned scan") {
    val df = graft.operators.TextAnalysis.t14_pack(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"packing must shuffle exactly once (on shard):\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must prune to doc_id+text:\n$plan")
  }

  test("t15: sampling is shuffle-free") {
    val plan = graft.operators.TextAnalysis.t15_stratified_sample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-row hash sampling must not shuffle:\n$plan")
  }

  test("d08: decontamination never plans a cartesian/nested-loop join") {
    val df = graft.operators.Dedup.d08_decontam(spark, sf)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"train x eval pairing must stay an equi-join on the shingle key:\n$plan")
    } finally spark.catalog.clearCache()
  }

  test("c01: the composed curation pipeline never plans a cartesian/nested-loop join") {
    val df = graft.operators.Curation.c01_curation_pipeline(spark, sf)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"every capstone stage must stay keyed (equi-join / window / agg):\n$plan")
    } finally spark.catalog.clearCache()
  }

  test("d09/mm05/t18: candidate and scoring joins stay keyed; 1-row broadcasts are the only nested loops") {
    // the sweep's candidate join, mm05's bucket join and t18's count
    // joins must all be equi-joins; BroadcastNestedLoopJoin may appear
    // ONLY for the intended single-row broadcasts (d09's n_true, t18's
    // vocabulary size) — never for a scaling relation
    def audit(name: String, df: DataFrame, maxNested: Int): Unit = try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
      val nested = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(nested <= maxNested,
        s"$name: $nested nested-loop joins (allowed $maxNested — 1-row broadcasts only):\n$plan")
    } finally spark.catalog.clearCache()
    audit("d09", graft.operators.Dedup.d09_lsh_tuning(spark, sf), 1)
    audit("mm05", graft.operators.Multimodal.mm05_media_dedup(spark, sf), 0)
    audit("t18", graft.operators.TextAnalysis.t18_bigram_lm(spark, sf), 1)
    audit("t19", graft.operators.TextAnalysis.t19_domain_mixture(spark, sf), 1)
  }

  test("t23: top-k as TakeOrderedAndProject; the 1-row stats broadcast is the only nested loop") {
    val df = graft.operators.TextAnalysis.t23_bm25(spark, sf)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"the top-k must never globally sort:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"t23 plans a cartesian:\n$plan")
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
        s"only the 1-row corpus-stats broadcast may nest:\n$plan")
      val rows = df.collect()
      assert(rows.nonEmpty && rows.forall { r =>
        r.getLong(1) > 0L && r.getLong(2) >= 1L && r.getLong(2) <= 8L
      }, "BM25 scores must be positive over 1..8 matched query terms")
    } finally spark.catalog.clearCache()
  }

  test("n18: bounded broadcasts only; every query fuses to exactly the top-10") {
    val df = graft.operators.Similarity.n18_hybrid_rrf(spark, sf)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"n18 plans a cartesian:\n$plan")
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
        s"only the 5-query scoring and 1-row stats broadcasts may nest:\n$plan")
      val rows = df.collect()
      val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
      assert(perQuery.keySet === (0L until 5L).toSet, s"expected 5 queries: $perQuery")
      assert(perQuery.values.forall(_ === 10), s"expected top-10 per query: $perQuery")
      val maxRrf = 2 * (1000000 / 61)
      assert(rows.forall { r =>
        r.getLong(3) > 0L && r.getLong(3) <= maxRrf
      }, "fused scores must lie in (0, 2*floor(1e6/61)]")
    } finally spark.catalog.clearCache()
  }

  test("n19: IVF-leg hybrid — candidates by cell equi-join, bounded broadcasts only") {
    val df = graft.operators.Similarity.n19_hybrid_ivf(spark, sf)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"n19 plans a cartesian:\n$plan")
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
        s"only the centroid fold and 1-row stats may nest:\n$plan")
      val rows = df.collect()
      val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
      assert(perQuery.keySet === (0L until 5L).toSet && perQuery.values.forall(_ === 10),
        s"expected top-10 per query: $perQuery")
    } finally spark.catalog.clearCache()
  }

  test("a13: ONE exchange — rank, group size and the rollup share the event_type distribution") {
    val df = Relational.a13_value_quantiles(spark, sf)
    df.collect()
    val shuffles = flatten(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 1,
      s"both window passes and the final groupBy must reuse one hash distribution, saw $shuffles exchanges")
  }

  test("a24: two event_type exchanges (one per median pass), med/mad broadcast back") {
    val df = Relational.a24_outlier_mad(spark, sf)
    df.collect()
    val plans = flatten(df.queryExecution.executedPlan)
    val shuffles = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles <= 2,
      s"each median pick should cost one event_type exchange, saw $shuffles")
    val bcasts = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
    assert(bcasts >= 2, s"med and mad must broadcast back, saw $bcasts broadcasts")
  }

  test("w06: ONE exchange and ONE sort — the RANGE frame rides the ROWS frame's ordering") {
    val df = Relational.w06_rolling_stats(spark, sf)
    df.collect()
    val plans = flatten(df.queryExecution.executedPlan)
    val shuffles = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 1, s"both frames must share the user_id distribution, saw $shuffles")
    val sorts = plans.count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    assert(sorts === 1,
      s"(tsu) is a prefix of (tsu, event_id) — the second window must not re-sort, saw $sorts")
  }

  test("w07: the pattern sweep is ONE user exchange, never a nested loop") {
    val df = Relational.w07_sequence_match(spark, sf)
    df.collect()
    val plans = flatten(df.queryExecution.executedPlan)
    val shuffles = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 1, s"the sweep must be the only distribution, saw $shuffles")
    assert(!plans.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "the negation must fold into the sweep, not plan as an interval join")
  }

  test("a16: ONE exchange — lag, the running sum and the session rollup all ride user_id") {
    // hash(user_id) satisfies the rollup's (user_id, sid) clustering —
    // every row of a user is already co-located — so the session
    // aggregation must NOT re-shuffle what the windows distributed.
    val df = Relational.a16_sessionize(spark, sf)
    df.collect()
    val shuffles = flatten(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 1,
      s"windows and session rollup must share the user_id distribution, saw $shuffles")
  }

  test("j14: multi-touch credit plans as ONE user exchange, never a user-crossing join") {
    val df = Relational.j14_multitouch_attribution(spark, sf)
    df.collect()
    val plans = flatten(df.queryExecution.executedPlan)
    val shuffles = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 1,
      s"the range-framed window must be the only distribution, saw $shuffles")
    assert(!plans.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "the lookback must never plan as a nested-loop/cartesian join")
  }

  test("j12: the as-of join plans as ONE exchange + window, never a nested loop") {
    // The union+window formulation's whole point: the naive
    // inequality join would plan a broadcast-nested-loop cross.
    val df = Relational.j12_attribution_asof(spark, sf)
    df.collect()
    val plans = flatten(df.queryExecution.executedPlan)
    val shuffles = plans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles === 1,
      s"both sides and the window must share one user_id distribution, saw $shuffles")
    assert(!plans.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "the as-of must never fall back to a nested-loop/cartesian plan")
  }

  test("c05: the stage-keyed window pass and the profile rollup share ONE exchange") {
    // c03's chain owns its per-gate shuffles; the profile layer on top
    // must add exactly one stage-keyed distribution reused by both the
    // rank window and the final groupBy (a13's one-exchange property).
    val df = graft.operators.Curation.c05_curation_profile(spark, sf)
    try {
      df.collect()
      val stageShuffles = flatten(df.queryExecution.executedPlan).count {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          s.outputPartitioning.toString.contains("stage")
        case _ => false
      }
      assert(stageShuffles === 1,
        s"the window and rollup must reuse one stage-hash distribution, saw $stageShuffles")
    } finally spark.catalog.clearCache()
  }

  test("partitionedParquet: partition pruning eliminates directories; files are compacted") {
    val dir = java.nio.file.Files.createTempDirectory("layout_").toString
    val li = Tables.lineitem(spark, sf)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    graft.sinks.Sinks.partitionedParquet(
      li, dir, Seq("ship_month"), sortCols = Seq("l_orderkey"))
    val months = li.select(col("ship_month")).distinct().count()
    // one compacted file per partition at fixture volume — no sliver explosion
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(files === months, s"expected $months compacted files, found $files")
    // a partition predicate prunes to ONE directory before any file opens
    val probe = li.select(col("ship_month")).first().getString(0)
    val q = spark.read.parquet(dir).where(col("ship_month") === probe)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(probe),
      s"partition filter not applied:\n$plan")
    val scanned = q.select(input_file_name()).distinct().count()
    assert(scanned === 1, s"pruning must scan exactly the matching partition, scanned $scanned")
  }

  test("w04: both window frames ride ONE user_id exchange") {
    val plan = graft.operators.Relational.w04_window_battery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"the coarse and fine frames must share the user_id distribution:\n$plan")
  }

  test("a18: the cube lattice is ONE Expand + ONE aggregation exchange") {
    val plan = graft.operators.Relational.a18_event_cube(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      s"cube must expand the lattice below one aggregation, not run 4 passes:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"one shuffle for the whole lattice:\n$plan")
  }

  test("s11: the point scan reads ONE bucket of 8") {
    val plan = graft.operators.Relational.s11_bucket_pruned_scan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"the equality filter on the bucket key must prune to one bucket:\n$plan")
  }

  test("j16: version build + sweep are the only exchanges; never a nested loop") {
    val plan = graft.operators.Relational.j16_point_in_time(spark, sf)
      .queryExecution.executedPlan.toString
    // two exchanges total: the version-history build and the sweep —
    // the irreducible pair (thinning needs version numbers, so the
    // build cannot fold into the sweep's single pass)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2,
      s"version build + sweep must be the only two user_id exchanges:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the interval join must never plan as a nested loop:\n$plan")
  }

  test("w05: candles are ONE aggregation exchange, no window pass") {
    val plan = graft.operators.Relational.w05_ohlc_candles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"ordered-pick aggregates must ride one candle-keyed exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"min_by/max_by must not fall back to a window + sort:\n$plan")
  }

  test("n22: the index point probe reads ONE bucket of 8") {
    val plan = graft.operators.Similarity.n22_index_point_probe(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"the vec_id equality filter must prune the bucketed index to one bucket:\n$plan")
  }

  test("t36: the term lookup reads ONE postings bucket of 8") {
    val plan = graft.operators.TextAnalysis.t36_term_lookup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"the token equality filter must prune the postings to one bucket:\n$plan")
  }

  test("j15: bucketed co-located join + rollup plans with ZERO exchanges") {
    val df = graft.operators.Relational.j15_bucketed_join(spark, sf)
    val nodes = flatten(df.queryExecution.executedPlan)
    val ex = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    val plan = df.queryExecution.executedPlan.toString
    assert(ex === 0,
      s"the bucketed layout must eliminate every exchange (agg AND join):\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"the MERGE-hinted co-located join must plan sort-merge:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"both scans must read bucketed layout:\n$plan")
  }

  test("d04: all three index consumers read the cache; one shuffle on the shingle key") {
    val (pairs, kept) = graft.operators.Dedup.ngramJaccardPlan(
      spark, sf, graft.operators.Dedup.DfCap)
    try {
      pairs.collect()
      val nodes = flatten(pairs.queryExecution.executedPlan)
      val scans = nodes.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s }
      assert(scans.size >= 3,
        s"expected self-join sides + size branch to read the cached index, got ${scans.size}")
      assert(shingleExchanges(nodes) === 0,
        "cache preserves s-partitioning; consumers must not re-shuffle the shingle key")
      val builds = scans.map(_.relation.cachedPlan).distinct
      assert(builds.size === 1 && shingleExchanges(flatten(builds.head)) === 1,
        "the index must be built by exactly one shuffle on the shingle key")
    } finally kept.unpersist()
  }

  test("j20/a37/d22: candidate generation stays equi-join — no cartesian; j20 also no nested loop") {
    // the round-11 pair/wedge generators: bucket explosion (j20), the
    // order-key self-join (a37) and the oriented wedge joins (d22)
    // must never degenerate into a cartesian; j20 has no bounded
    // 1-row broadcast, so it must not plan ANY nested loop either
    // (a37's single BroadcastNestedLoop is the intended 1-row
    // n_orders attach).
    val j20 = Relational.j20_order_pairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!j20.contains("CartesianProduct") &&
      !j20.contains("BroadcastNestedLoop"), s"j20 plan degenerated:\n$j20")
    val a37 = Relational.a37_basket_lift(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!a37.contains("CartesianProduct"), s"a37 plan degenerated:\n$a37")
    val d22 = graft.operators.Dedup.d22_triangle_count(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!d22.contains("CartesianProduct"), s"d22 plan degenerated:\n$d22")
  }

  test("mm10/d24/d25: round-12 pair and audit plans stay equi-join — no cartesian") {
    // mm10's banded hamming join, d24's label-table joins and d25's
    // edge-artifact reuse must never degenerate into a cartesian; the
    // single BroadcastNestedLoop allowed anywhere is a bounded 1-row
    // total attach (none of these three has one).
    for ((name, q) <- Seq(
        ("mm10", graft.operators.Multimodal.mm10_media_dhash),
        ("d24", graft.operators.Dedup.d24_partition_agreement),
        ("d25", graft.operators.Dedup.d25_source_dup_report))) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        s"$name plan degenerated:\n$plan")
    }
  }

  test("n30: the query side broadcasts; each rung aggregates partially map-side") {
    val plan = graft.operators.Similarity.n30_truncated_retrieval(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the bounded query set must broadcast:\n$plan")
    assert(plan.contains("partial_topk") || plan.contains("partial_finalmerge")
        || plan.contains("objHashAggregate") || plan.contains("partial"),
      s"rungs must partially aggregate before the exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"n30 plan degenerated:\n$plan")
  }

  test("a41/w14: split scan and period report ride the calendar-bounded daily relation") {
    // the one full-width exchange either query may have is the daily
    // rollup's; the analytics tail must not add a data-volume shuffle
    // (windows over the daily relation are unpartitioned by design —
    // the calendar bound is the docstring contract)
    val a41 = Relational.a41_changepoint(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!a41.contains("CartesianProduct"), s"a41 plan degenerated:\n$a41")
    val w14 = Relational.w14_period_over_period(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!w14.contains("CartesianProduct") &&
      !w14.contains("SortMergeJoin"),
      s"w14's shifted self-joins must broadcast, never sort-merge:\n$w14")
  }

  /** Every BroadcastNestedLoopJoin must broadcast a provably bounded
    * side: a 1-row aggregate (bnds/tot/mx), a bounded Range (quartile/
    * pct grids), or their AQE-wrapped stages. Data-volume relations
    * (scans, exchanges over scans) must never be a BNL side.
    */
  private def assertBnlSidesBounded(df: DataFrame, ctx: String): Unit = {
    val plans = flatten(df.queryExecution.executedPlan)
    assert(!plans.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      s"$ctx: no cartesian product allowed")
    plans.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.foreach { b =>
      val side = (if (b.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
        b.right else b.left).toString
      // bounded: a literal Range grid, a 1-row aggregate, or a reused
      // broadcast of one of the named bounded relations
      val boundedCols = Seq("bnds", "w_total", "quartile", "pct", "mx", "tot")
      assert(side.contains("Range (") ||
        side.contains("HashAggregate") || side.contains("SortAggregate") ||
        (side.contains("ReusedExchange") &&
          boundedCols.exists(c => side.contains(s"[$c#"))),
        s"$ctx: BNL broadcasts a non-bounded side:\n$side")
    }
  }

  test("j22/j23/j24: no cartesian; BNLs broadcast only bounded sides; " +
      "the successor lookup is an equi-join on rnk") {
    for (q <- Seq(Relational.j22_max_concurrency,
        Relational.j23_interval_coverage, Relational.j24_max_quiet_gap)) {
      val df = q(spark, sf)
      df.collect()
      assertBnlSidesBounded(df, "sweep")
    }
    // the j23/j24 successor lookup must be an equi-join keyed on rnk
    val plan = Relational.j23_interval_coverage(spark, sf)
      .queryExecution.executedPlan.toString
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[rnk".r
      .findFirstIn(plan).isDefined,
      s"the scale-safe lead must be an equi-join on rnk:\n$plan")
  }

  test("a47/t38: no cartesian; nested loops broadcast only the bounded " +
      "grids (1-row totals, 3-4-row threshold ranges)") {
    for (df <- Seq(Relational.a47_weighted_quartiles(spark, sf),
        graft.operators.TextAnalysis.t38_vocab_growth(spark, sf))) {
      df.collect()
      assertBnlSidesBounded(df, "grid-pick")
    }
  }

  test("w17/a45: the data-volume window partitions by bucket; only the " +
      "bucket-offset window is unpartitioned") {
    for (q <- Seq(Relational.w17_global_rank, Relational.a45_pareto_abc)) {
      val df = q(spark, sf)
      df.collect()
      val wins = flatten(df.queryExecution.executedPlan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "expected window operators in the plan")
      val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
      // the ≤nBuckets-row offset rollup is the ONLY single-partition
      // window; the per-row rank/prefix window must carry the bucket key
      assert(unpart.size === 1,
        s"exactly one bounded offsets window expected, saw ${unpart.size}")
      assert(unpart.head.output.map(_.name).exists(Set("b_n", "b_v")),
        "the unpartitioned window must be the bucket-offset rollup, " +
          s"saw outputs ${unpart.head.output.map(_.name)}")
      assert(part.nonEmpty &&
        part.forall(_.partitionSpec.exists(_.toString.contains("bkt"))),
        "the data-volume rank/prefix window must partition by bkt")
    }
  }
}
