package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types._

/** Plan-fingerprint lockfile over every BATCH query in the registry —
  * the r12 mm12 lesson generalized: a CollapseProject interaction
  * silently re-inlined a decode 16× and was only caught by a manual
  * bench audit. This spec renders each query's INITIAL physical plan
  * (pre-AQE — deterministic without executing) to a normalized digest
  * and diffs against the committed lockfile, so any optimizer- or
  * refactor-induced plan change must be acknowledged by regenerating
  * the lockfile in the same commit:
  *
  *   GRAFT_UPDATE_PLAN_LOCK=1 sbt "testOnly graft.PlanLockSpec"
  *
  * Streaming (`st*`) queries are excluded: their construction replays
  * streams (side-effecting and runtime-bound); their read-side shapes
  * are locked by the targeted PlanSpec/StreamingSpec assertions.
  *
  * The same construction pass also enforces ORACLE PORTABILITY from
  * the Spark side (the w13 r12 lesson — HUGEINT/decimal column types
  * hash-diverge through the driver's fetch path with zero numeric
  * difference): every output schema must use only types whose DuckDB
  * fetch renders identically, mirroring scripts/oracle_gate.py's
  * DESCRIBE sweep of the DuckDB side.
  */
class PlanLockSpec extends SparkSpecBase {

  private val lockPath =
    Paths.get(sys.props("user.dir"), "src", "test", "resources", "plan_lock.txt")

  /** Strip run-variant tokens: expression ids, object identity hashes
    * (`TopKAggregator@7cc9fa83`), paths, app ids, and the grouping ids
    * RewriteDistinctAggregates assigns in exprId-hash order (`gid# =
    * 4` vs `= 3` across JVMs). Then reduce each line to its SORTED
    * TOKEN BAG: Catalyst orders key/function/projection/grouping-set
    * lists by attribute hash in several places (multi-count_distinct
    * expands, hashpartitioning key order, Expand projections), which
    * is run-variant but semantically identical — so the digest locks
    * tree topology + node kind + the multiset of identifiers per
    * node, not their print order. A real plan regression (extra
    * exchange, re-inlined expression, changed join strategy) changes
    * the tree or a node's token bag; a hash-order reshuffle changes
    * neither.
    */
  private def normalize(s: String): String = s
    .replaceAll("#\\d+", "#")
    // lambda variables render as x_<globalCounter># — the counter is
    // JVM-history-dependent (how many lambdas were planned before)
    .replaceAll("_\\d+#", "_#")
    .replaceAll("@[0-9a-f]+", "@")
    .replaceAll("(file:|hdfs:)?(/[\\w.\\-]+)+/?", "<path>")
    .replaceAll("(plan_id|exprId|cteId|id)=\\d+", "$1=")
    .replaceAll("= \\d+", "= N")
    .replaceAll("local-\\d+", "<app>")
    .split("[^A-Za-z0-9_#<>.@]+").filter(_.nonEmpty)
    .sorted.mkString(" ")

  private def render(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    // maxFields high enough that no list truncates: "... 6 more
    // fields" keeps a run-variant PREFIX of an unordered list
    sb.append("  " * depth).append(normalize(p.simpleString(500))).append('\n')
    p.subqueries.foreach(render(_, depth + 1, sb))
    p.children.foreach(render(_, depth + 1, sb))
  }

  private def digest(name: String, df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val sb = new StringBuilder
    render(plan, 0, sb)
    sys.env.get("GRAFT_DUMP_PLANS").foreach { d =>
      Files.createDirectories(Paths.get(d))
      Files.write(Paths.get(d, s"$name.txt"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
    }
    MessageDigest.getInstance("MD5").digest(
      sb.toString.getBytes(StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
  }

  /** Spark-side portable output types: these and ONLY these fetch
    * identically through DuckDB's reader and the driver's normalizer.
    * A DecimalType/FloatType/ShortType output means the query (or its
    * oracle) needs an explicit cast before it can hash-match.
    *
    * SCALARS ONLY — no ArrayType (the r14 driver-sortability clause).
    * The driver's checker canonicalizes row order with a pandas
    * sort_values over ALL output columns; an ARRAY cell arrives as a
    * numpy ndarray, which is unhashable there, and the comparison
    * crashes before comparing anything (f08 shipped r13's only red
    * row this way; w13's HUGEINT in r12 was the same builder-lenient/
    * driver-strict class). Array-valued RESULTS are fine internally —
    * registered queries must scalarize them (sorted `concat_ws`
    * VARCHAR / `array_to_string` on the DuckDB side) at the output.
    */
  private def portable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType | BooleanType |
         DateType | BinaryType => true
    case _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }

  private lazy val batch: Seq[(String, DataFrame)] = {
    // The suites share one JVM-wide session (SparkSpecBase): whatever
    // a previously-run suite left persisted would render here as
    // InMemoryRelation instead of the query's real subtree, making
    // digests depend on suite order. Start from a cold cache — the
    // same state the solo lockfile-generation run sees.
    spark.catalog.clearCache()
    // FileScan metadata (PushedFilters, schema) truncates at this many
    // chars — the default 100 cuts mid-token at a point that depends
    // on pre-normalization name lengths (lambda counters), making the
    // digest history-dependent. Render in full; the token-bag
    // normalizer handles the size.
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    val stNames = graft.streaming.StreamQueries.queries.keySet
    SparkEntry.queries.view.filterKeys(!stNames.contains(_))
      .toSeq.sortBy(_._1)
      .map { case (n, q) => (n, q(spark, sf)) }
  }

  test("every batch query's output schema is oracle-portable") {
    val bad = batch.flatMap { case (n, df) =>
      val offenders = df.schema.fields.filterNot(f => portable(f.dataType))
      if (offenders.isEmpty) None
      else Some(s"$n: ${offenders.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
    }
    assert(bad.isEmpty,
      s"non-portable output column types (cast them):\n${bad.mkString("\n")}")
  }

  test("physical plans match the committed lockfile") {
    // Drop every cache registration (suite leftovers AND the persist
    // marks the query builders themselves placed during construction)
    // so no digest renders an InMemoryTableScan where another run
    // would render the real subtree — executedPlan substitutes cached
    // fragments at creation time, and digest() below is the first
    // forcing of each query's plan.
    spark.catalog.clearCache()
    val computed = batch.map { case (n, df) => n -> digest(n, df) }
    if (sys.env.contains("GRAFT_UPDATE_PLAN_LOCK")) {
      Files.createDirectories(lockPath.getParent)
      Files.write(lockPath, computed.map { case (n, d) => s"$n $d" }
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      info(s"lockfile regenerated with ${computed.size} entries")
    } else {
      assert(Files.exists(lockPath),
        "plan lockfile missing — run GRAFT_UPDATE_PLAN_LOCK=1 sbt 'testOnly graft.PlanLockSpec'")
      val locked = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(lockPath)).asScala
        .filter(_.nonEmpty).map(_.split(' ')).map(a => a(0) -> a(1)).toMap
      val drifted = computed.collect {
        case (n, d) if locked.get(n).exists(_ != d) => s"$n: plan changed (${locked(n)} -> $d)"
        case (n, _) if !locked.contains(n) => s"$n: new query not in lockfile"
      }
      val removed = locked.keySet -- computed.map(_._1).toSet
      assert(drifted.isEmpty && removed.isEmpty,
        "physical plan drift — if intentional, regenerate with " +
          "GRAFT_UPDATE_PLAN_LOCK=1 sbt 'testOnly graft.PlanLockSpec' " +
          "and commit the lockfile:\n" +
          (drifted ++ removed.map(n => s"$n: in lockfile but no longer registered")).mkString("\n"))
    }
  }
}
