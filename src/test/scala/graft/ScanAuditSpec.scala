package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan

/** Heavy-table FileScan budget over every BATCH query — the CI form
  * of `tools/scan_audit.scala`, which caught j29/j33/t41 re-deriving
  * fact aggregates from fresh scans in r13 and two more missing
  * lineage cuts in r14, each time only because someone remembered to
  * run it. The failure class: a refactor (or a Catalyst interaction
  * like mm12's CollapseProject re-inline) quietly turns one scan of a
  * fact table into five, which is invisible at sf0.001 correctness
  * and a 5× I/O regression on the 100 TB table.
  *
  * The gate: each query's pre-AQE physical plan (subqueries included)
  * is searched for `<table>.parquet` FileScan references over the
  * fact-scale tables; any (query, table) count ≥ 2 must appear in the
  * committed budget `scan_budget.txt` with EXACTLY that count.
  * Queries absent from the budget therefore carry an implicit
  * one-scan-per-fact-table ceiling; a count that DRIFTS (up or down)
  * from its committed value fails, so improvements ratchet the budget
  * down in the same commit and regressions cannot hide:
  *
  *   GRAFT_UPDATE_SCAN_BUDGET=1 sbt "testOnly graft.ScanAuditSpec"
  *
  * Counting note: a query whose builder persists/localCheckpoints an
  * intermediate renders InMemoryTableScan here, which counts ZERO —
  * correct, because the fact scan happens once at materialization,
  * not per consumer; that is exactly the lineage-cut pattern the r14
  * audit installed and this spec now protects.
  */
class ScanAuditSpec extends SparkSpecBase {

  private val budgetPath =
    Paths.get(sys.props("user.dir"), "src", "test", "resources", "scan_budget.txt")

  /** Fact-scale tables (TESTDATA.md): the ones whose scan count is a
    * 100 TB cost. region/nation/supplier/part/customer are dim-scale
    * — broadcast-sized at any SF — and exempt by design.
    */
  private val heavy = Seq("lineitem", "orders", "events", "documents", "embeddings")

  private def renderAll(p: SparkPlan, sb: StringBuilder): Unit = {
    sb.append(p.simpleString(100000)).append('\n')
    p.subqueries.foreach(renderAll(_, sb))
    p.children.foreach(renderAll(_, sb))
  }

  private lazy val computed: Seq[(String, Seq[(String, Int)])] = {
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    val stNames = graft.streaming.StreamQueries.queries.keySet
    SparkEntry.queries.view.filterKeys(!stNames.contains(_))
      .toSeq.sortBy(_._1)
      .map { case (n, q) =>
        val plan = q(spark, sf).queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case p => p
        }
        val sb = new StringBuilder
        renderAll(plan, sb)
        val text = sb.toString
        n -> heavy.map(t => t -> s"$t\\.parquet".r.findAllIn(text).length)
          .filter(_._2 >= 2)
      }
  }

  test("every batch query stays on its committed heavy-table scan budget") {
    val flat = computed.filter(_._2.nonEmpty).map { case (n, cs) =>
      s"$n ${cs.map { case (t, c) => s"$t=$c" }.mkString(",")}"
    }
    if (sys.env.contains("GRAFT_UPDATE_SCAN_BUDGET")) {
      Files.createDirectories(budgetPath.getParent)
      Files.write(budgetPath,
        flat.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      info(s"scan budget regenerated: ${flat.size} queries above one scan/table")
    } else {
      assert(Files.exists(budgetPath),
        "scan budget missing — run GRAFT_UPDATE_SCAN_BUDGET=1 sbt 'testOnly graft.ScanAuditSpec'")
      val locked = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(budgetPath)).asScala.filter(_.nonEmpty)
        .map { l => val a = l.split(' '); a(0) -> a(1) }.toMap
      val current = computed.filter(_._2.nonEmpty).map { case (n, cs) =>
        n -> cs.map { case (t, c) => s"$t=$c" }.mkString(",")
      }.toMap
      val over = current.collect {
        case (n, c) if !locked.contains(n) =>
          s"$n: $c (budget: one scan per fact table)"
        case (n, c) if locked(n) != c =>
          s"$n: $c (budget: ${locked(n)})"
      }
      val stale = locked.collect {
        case (n, c) if !current.contains(n) =>
          s"$n: now within one scan/table (budget $c is stale — ratchet it down)"
      }
      assert(over.isEmpty && stale.isEmpty,
        "heavy-table scan-count drift — a fact table scanned k× is a k× I/O cost at " +
          "100 TB; if the new shape is deliberate, regenerate with " +
          "GRAFT_UPDATE_SCAN_BUDGET=1 sbt 'testOnly graft.ScanAuditSpec' and commit:\n" +
          (over ++ stale).mkString("\n"))
    }
  }
}
