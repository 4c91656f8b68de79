package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Layout-family gates: the Morton interleave against an independent
  * bit-loop reference, the pruning audit's accounting identities, and
  * the plan shapes the 100 TB claims rest on (grid-bounded shuffle,
  * persisted cell relation, broadcast predicate joins).
  */
class LayoutSpec extends SparkSpecBase {

  /** Independent Morton reference: per-bit loop (no magic masks). */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("morton16 matches the per-bit reference over the 16-bit corners and a lattice") {
    import spark.implicits._
    val probes = (Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 65534L, 65535L) ++
      (0 until 64).map(i => (i * 1021L + 17L) % 65536L)).distinct
    val df = probes.flatMap(x => probes.map(y => (x, y))).toDF("x", "y")
      .select(col("x"), col("y"), Layout.morton16(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(x, y), s"morton16($x, $y) = $z != ${mortonRef(x, y)}")
    }
  }

  test("morton16 key order is hierarchical: equal 13-bit prefixes iff equal 8x8 tile") {
    import spark.implicits._
    // For 6-bit coords, zkey >> 6 must equal morton of (x>>3, y>>3):
    // the property z02's file assignment (top bits = tile) relies on.
    val df = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
      .select(
        shiftright(Layout.morton16(col("x"), col("y")), 6).as("prefix"),
        Layout.morton16(shiftright(col("x"), 3), shiftright(col("y"), 3)).as("tile"))
    assert(df.where(col("prefix") =!= col("tile")).count() == 0)
  }

  test("z02 audit accounting: scanned is a superset of matched; linear never prunes y-bands") {
    try {
      val rows = Layout.z02_zorder_pruning(spark, sf).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(rows.size == 12, s"expected 6 preds x 2 layouts, got ${rows.size}")
      rows.foreach { case ((pred, layout), (files, scanned, matched)) =>
        assert(scanned >= matched,
          s"$pred/$layout scans $scanned < matches $matched")
        assert(files >= 1 && files <= 64)
      }
      // The differential the family exists to demonstrate: a predicate
      // on the non-leading dimension cannot prune x-stripe files.
      val (linFiles, linScanned, _) = rows(("y_range", "linear"))
      val (zFiles, zScanned, zMatched) = rows(("y_range", "zorder"))
      assert(linFiles == 64, s"linear layout pruned y_range to $linFiles files")
      assert(zFiles < linFiles && zScanned < linScanned,
        s"zorder must out-prune linear on y_range: $zFiles/$zScanned vs $linFiles/$linScanned")
      assert(zScanned == zMatched,
        "8x8 tiles align with the 8-wide y band: zorder scan should be exact")
      // Full-table predicate reads everything under both layouts.
      assert(rows(("full", "linear"))._2 == rows(("full", "zorder"))._2)
    } finally spark.catalog.clearCache()
  }

  test("z02 plan: broadcast joins only, cells lineage-cut, no cartesian product") {
    try {
      val plan = Layout.z02_zorder_pruning(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
      assert(plan.contains("InMemoryTableScan"),
        "cells must be persist()-cut so file-stats and matching share one fact scan")
      assert(!plan.contains("SortMergeJoin"),
        "every join side here is bounded (preds=6, fstats<=128) and must broadcast")
    } finally spark.catalog.clearCache()
  }

  test("z04 physical contract: pruned tile read touches a strict subset of the 16 files") {
    val q = Layout.z04_zordered_table(spark, sf)
    // The zkey interval must reach the parquet scan as pushed filters.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(zkey), GreaterThanOrEqual(zkey") ||
           plan.contains("GreaterThanOrEqual(zkey"),
      s"zkey interval not pushed to the scan:\n$plan")
    val touched = q.select(input_file_name().as("f")).distinct().count()
    // The table root holds 16 range files; an aligned 8x8 tile is
    // 1/64 of the key space, so the pruned read must touch only a
    // strict subset (sampled boundaries make the exact count vary).
    val table = spark.read.parquet(
      q.queryExecution.analyzed.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
        .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.head.toString)
    val total = table.select(input_file_name().as("f")).distinct().count()
    assert(total >= 8, s"expected ~16 range files, found $total")
    assert(touched < total,
      s"pruning bought nothing: touched $touched of $total files")
    // Disjoint intervals: per-file (min,max) zkey ranges must not overlap.
    val ranges = table.groupBy(input_file_name().as("f"))
      .agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file zkey intervals overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }
  }

  test("z05 plan is a partition of the tiles and prices rewrites consistently") {
    val rows = Layout.z05_incremental_recluster(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("tile")).distinct.length == rows.length)
    rows.foreach { r =>
      val (s, d) = (r.getAs[Long]("n_standing"), r.getAs[Long]("n_delta"))
      val action = r.getAs[String]("action")
      val rew = r.getAs[Long]("rows_rewritten")
      val expected =
        if (s == 0L && d > 0L) "new"
        else if (d * 1000L >= s * 100L) "rewrite"
        else "append"
      assert(action == expected, s"tile ${r.getAs[Long]("tile")}: s=$s d=$d")
      assert(rew == (expected match {
        case "new" => d
        case "rewrite" => s + d
        case _ => 0L
      }))
    }
    // The skewed-ingest fixture must produce BOTH warm and cold tiles —
    // a one-action plan would mean the fixture stopped discriminating.
    val actions = rows.map(_.getAs[String]("action")).toSet
    assert(actions.contains("append") &&
      (actions.contains("rewrite") || actions.contains("new")), actions.toString)
  }

  test("z03 groups are equal-mass: every group lands within one max-file of target") {
    val rows = Layout.z03_compaction_plan(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("group_bytes")).sum
    val target = (total + 23) / 24
    // Prefix-sum sharding bounds each group by target + (its largest
    // straddling file); the fixture's largest file bounds that excess.
    val maxFile = graft.Tables.documents(spark, sf)
      .groupBy(pmod(col("doc_id"), lit(503L))).agg(sum("n_chars").as("b"))
      .agg(max("b")).head().getLong(0)
    rows.foreach { r =>
      val b = r.getAs[Long]("group_bytes")
      assert(b <= target + maxFile,
        s"group ${r.getAs[Long]("group_id")} overfull: $b > $target + $maxFile")
    }
    assert(rows.map(_.getAs[Long]("n_files")).sum == 503L ||
      rows.map(_.getAs[Long]("n_files")).sum ==
        graft.Tables.documents(spark, sf)
          .select(pmod(col("doc_id"), lit(503L))).distinct().count(),
      "every inventory file must be assigned to exactly one group")
  }
}
