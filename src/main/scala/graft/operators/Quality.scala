package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** DATA-QUALITY AUDITS — the nightly checks a training-data pipeline
  * runs BEFORE shipping a snapshot to consumers: per-column profiles
  * (the statistics a reviewer eyeballs and a drift monitor diffs),
  * a declarative constraint suite (completeness / uniqueness /
  * referential integrity / domain / range — the Deequ-style contract
  * a table publishes), and the constraint trend over time (the same
  * metrics per ingest month, so a regression names the month it
  * arrived). The reference validates nothing — malformed payloads
  * flow until a consumer throws (its fastjson parses are bare
  * `JSON.parseObject`, e.g. ods/KafkaToODS_M.scala:47); this family
  * is the missing admission control, built table-level where p12's
  * quarantine is row-level.
  *
  * Design rule shared by all three queries: every metric that can
  * ride ONE scan of its fact table does — violations are conditional
  * aggregates over a single pass, never one query per constraint
  * (at 100 TB, N constraint queries = N scans is the difference
  * between a nightly audit and a weekly one). Cross-table
  * constraints (FK orphans) ride the SAME pass via cardinality-
  * preserving left joins against the unique-key side, so adding a
  * referential check never adds a scan of the probe side.
  */
object Quality {
  type Q = (SparkSession, String) => DataFrame

  /** Money as integer cents (exact cross-engine; the w-family rule). */
  private def centsStr(c: Column): Column = cents(c).cast("long").cast("string")

  // --------------------------------------------------------------------
  // q01 — per-column profile
  // --------------------------------------------------------------------

  /** q01 — COLUMN PROFILE of the orders table, long format: one row
    * per column with (n_rows, n_nonnull, n_distinct, min, max) — the
    * table "describe" a curation reviewer reads and q03's trend diffs.
    * Min/max are rendered to engine-neutral VARCHAR at the type level
    * (longs verbatim, money as integer cents, timestamps as ISO
    * dates) so one schema carries every column.
    *
    * Scale shape: ONE scan, one aggregate row, then a 6-way inline
    * unpivot of that single row — the row count of the output is the
    * column count, not the data. The six exact COUNT(DISTINCT)s in
    * one aggregate expand the shuffle 6× (RewriteDistinctAggregates'
    * Expand — visible in the plan and priced here deliberately: the
    * differential needs exact counts; a 100 TB deployment flips the
    * same query to approx_count_distinct and drops the Expand, the
    * a03/a07 exact-vs-HLL pairing already in this library).
    */
  val q01_column_profile: Q = (spark, dir) => {
    val a = orders(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      // o_orderkey
      count(col("o_orderkey")).as("nn_ok"),
      countDistinct(col("o_orderkey")).as("nd_ok"),
      min(col("o_orderkey")).cast("string").as("mn_ok"),
      max(col("o_orderkey")).cast("string").as("mx_ok"),
      // o_custkey
      count(col("o_custkey")).as("nn_ck"),
      countDistinct(col("o_custkey")).as("nd_ck"),
      min(col("o_custkey")).cast("string").as("mn_ck"),
      max(col("o_custkey")).cast("string").as("mx_ck"),
      // o_orderstatus
      count(col("o_orderstatus")).as("nn_os"),
      countDistinct(col("o_orderstatus")).as("nd_os"),
      min(col("o_orderstatus")).as("mn_os"),
      max(col("o_orderstatus")).as("mx_os"),
      // o_totalprice (cents)
      count(col("o_totalprice")).as("nn_tp"),
      countDistinct(col("o_totalprice")).as("nd_tp"),
      centsStr(min(col("o_totalprice"))).as("mn_tp"),
      centsStr(max(col("o_totalprice"))).as("mx_tp"),
      // o_orderdate (ISO day)
      count(col("o_orderdate")).as("nn_od"),
      countDistinct(col("o_orderdate")).as("nd_od"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("mn_od"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("mx_od"),
      // o_orderpriority
      count(col("o_orderpriority")).as("nn_op"),
      countDistinct(col("o_orderpriority")).as("nd_op"),
      min(col("o_orderpriority")).as("mn_op"),
      max(col("o_orderpriority")).as("mx_op"))
    def row(name: String, sfx: String) =
      struct(lit(name).as("col_name"), col("n_rows"),
        col(s"nn_$sfx").as("n_nonnull"), col(s"nd_$sfx").as("n_distinct"),
        col(s"mn_$sfx").as("min_val"), col(s"mx_$sfx").as("max_val"))
    a.select(inline(array(
      row("o_orderkey", "ok"), row("o_custkey", "ck"),
      row("o_orderstatus", "os"), row("o_totalprice", "tp"),
      row("o_orderdate", "od"), row("o_orderpriority", "op"))))
  }

  /** q01x — THE PROFILE'S DISTINCT COUNTS AT 100 TB GRAIN: q01's
    * six exact COUNT(DISTINCT)s re-expressed as one KMV bottom-k
    * sketch per column ([[graft.functions.MinK]] — a17's order
    * statistic, a07's estimator arithmetic verbatim), and STILL
    * hash-oracle-checked — the property that picked KMV over the
    * built-in HLL for this library's portable sketch lane. The
    * adjudication the pair encodes: q01 keeps exact multi-distinct
    * because an audit's profile is a published contract (a drift
    * monitor diffing n_distinct must not chase estimator noise) and
    * its 6-way Expand is priced at the audit's nightly grain; q01x is
    * what the same profile flips to when the table is the 100 TB
    * fact itself — the unpivot rotates the row into 6 thin
    * (col_name, value) pairs whose per-column sketch partials
    * collapse map-side to ≤ k items, so the one exchange carries
    * 6·partitions·k items instead of Expand's 6× row replication.
    * Values are canonicalized to the profile's own VARCHAR rendering
    * (longs verbatim, money as integer cents, dates ISO) before
    * hashing, and nulls are excluded exactly as COUNT(DISTINCT)
    * excludes them; est = (k−1)·2⁶⁰ / h₍ₖ₎, exact below k.
    */
  val q01x_profile_kmv: Q = (spark, dir) => {
    val k = Relational.KmvK
    import graft.functions.{MinK, Portable}
    val pairs = orders(spark, dir).select(inline(array(
      struct(lit("o_orderkey").as("col_name"),
        col("o_orderkey").cast("string").as("v")),
      struct(lit("o_custkey").as("col_name"),
        col("o_custkey").cast("string").as("v")),
      struct(lit("o_orderstatus").as("col_name"),
        col("o_orderstatus").as("v")),
      struct(lit("o_totalprice").as("col_name"),
        centsStr(col("o_totalprice")).as("v")),
      struct(lit("o_orderdate").as("col_name"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("v")),
      struct(lit("o_orderpriority").as("col_name"),
        col("o_orderpriority").as("v")))))
      .where(col("v").isNotNull)
    val h = Portable.hash60(concat(lit("kmv:"), col("v")))
    val kth = element_at(col("s.items"), size(col("s.items"))).getField("h")
    pairs.select(col("col_name"), h.as("h"))
      .groupBy(col("col_name"))
      .agg(MinK.minK(k)(col("h"), col("h")).as("s"))
      .select(col("col_name"),
        size(col("s.items")).cast("long").as("n_kept"),
        kth.as("kth"),
        when(size(col("s.items")) < k, size(col("s.items")).cast("long"))
          .otherwise(floor(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
            kth.cast("double")).cast("long")).as("n_distinct_est"))
  }

  // --------------------------------------------------------------------
  // q02 — the constraint suite
  // --------------------------------------------------------------------

  /** q02 — CONSTRAINT AUDIT: the declarative suite over orders and
    * lineitem, one output row per constraint with (checked,
    * violations, passed). The battery: column completeness, key
    * uniqueness, value domain, value range, two referential checks
    * (orders→customer, lineitem→orders), and one CROSS-ROW business
    * rule (ship-before-order: l_shipdate >= o_orderdate — which this
    * synthetic generation violates massively, exactly the kind of
    * fact an audit states rather than assumes). The FK legs are
    * [[Relational.p23_fk_audit]]'s orphan measurement reduced to
    * suite membership: p23 reports the orphan RATE per edge for
    * investigation; this row answers the publish/block question —
    * and does it without p23's dedicated anti-join pass, see below.
    *
    * Scale shape: THREE fact-table scans total for eight constraints
    * (orders twice, lineitem once) — the point is that no single
    * constraint adds a pass: the orders-side five ride one scan
    * through a cardinality-preserving left join onto broadcast
    * customer keys (c_custkey is unique, so the join cannot
    * duplicate; FK violations are null probes); the lineitem-side
    * three ride one lineitem scan through a left join onto the orders
    * key+date projection (o_orderkey unique — same cardinality
    * argument; that projected second orders read is shared by the FK
    * check and the date rule, and prunes to two columns at the scan).
    * Uniqueness is COUNT(*) − COUNT(DISTINCT key) in the same
    * aggregate. Scan counts are budget-locked (ScanAuditSpec).
    */
  val q02_constraint_audit: Q = (spark, dir) => {
    val cust = customer(spark, dir).select(col("c_custkey"))
    val o = orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
    val oAgg = o.agg(
      count(lit(1)).as("n_o"),
      (count(lit(1)) - count(col("o_custkey"))).as("v_complete"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("v_domain"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("v_range"),
      sum(when(col("c_custkey").isNull && col("o_custkey").isNotNull, 1L)
        .otherwise(0L)).as("v_fk_cust"))
    val okeys = orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val l = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
      .join(okeys, col("l_orderkey") === col("o_orderkey"), "left")
    val lAgg = l.agg(
      count(lit(1)).as("n_l"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_fk_ord"),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("v_qty"),
      sum(when(col("l_shipdate") < col("o_orderdate"), 1L)
        .otherwise(0L)).as("v_ship"))
    def rows(checked: Column, pairs: (String, String)*) = pairs.map {
      case (name, vcol) => struct(lit(name).as("check_name"),
        checked.as("checked"), col(vcol).as("violations"),
        when(col(vcol) === 0L, 1L).otherwise(0L).as("passed"))
    }
    val oOut = oAgg.select(inline(array(rows(col("n_o"),
      "completeness_o_custkey" -> "v_complete",
      "unique_o_orderkey" -> "v_unique",
      "domain_o_orderstatus" -> "v_domain",
      "range_o_totalprice_pos" -> "v_range",
      "fk_orders_customer" -> "v_fk_cust"): _*)))
    val lOut = lAgg.select(inline(array(rows(col("n_l"),
      "fk_lineitem_orders" -> "v_fk_ord",
      "range_l_quantity_pos" -> "v_qty",
      "rule_ship_after_order" -> "v_ship"): _*)))
    oOut.unionAll(lOut)
  }

  // --------------------------------------------------------------------
  // q03 — the constraint trend
  // --------------------------------------------------------------------

  /** q03 — CONSTRAINT TREND: q02's audit grain crossed with TIME —
    * per order month: row volume, completeness violations, FK
    * orphans, range violations, and the ship-date rule's violation
    * count and checked denominator. The output a quality dashboard
    * plots; a metric that moves names the ingest month that moved it
    * (the t24/st40 drift discipline applied to CONSTRAINTS rather
    * than content distributions).
    *
    * Scale shape: identical to q02's lineitem leg — one fact scan
    * through the cardinality-preserving join, then ONE keyed shuffle
    * on the month grain (map-side partial aggregation makes the
    * exchange |months| rows per task); the orders-side metrics ride
    * the same month groups off the orders scan. Three fact scans
    * (orders twice — the lineitem leg re-reads the two-column
    * key+date projection, budget-locked — lineitem once), two
    * grid-bounded exchanges, any table size.
    */
  val q03_constraint_trend: Q = (spark, dir) => {
    val cust = customer(spark, dir).select(col("c_custkey"))
    val om = orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        // same constraint as q02's fk_orders_customer: a null o_custkey
        // is a completeness violation, not an FK orphan
        sum(when(col("c_custkey").isNull && col("o_custkey").isNotNull, 1L)
          .otherwise(0L)).as("v_fk_cust"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("v_range"))
    val okeys = orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val lm = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(okeys, col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_shipdate") < col("o_orderdate"), 1L)
          .otherwise(0L)).as("v_ship"))
    om.join(lm, Seq("month"), "left")
      .select(col("month"), col("n_orders"), col("v_fk_cust"),
        col("v_range"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("v_ship"), lit(0L)).as("v_ship"))
  }

  // --------------------------------------------------------------------
  // q04 — the publish decision
  // --------------------------------------------------------------------

  /** q04 — PUBLISH GATE: q02's suite reduced to the one row a pipeline
    * orchestrator branches on — go/no-go, how many checks failed, and
    * WHICH (sorted CSV, so the blocking alert is self-describing).
    * This is the table-level analog of c06's refusal circuit breaker:
    * the audit decides; the decision is data a downstream job reads,
    * not a log line a human greps. Rides q02's plan unchanged (same
    * two fact scans) plus one single-row reduction.
    */
  val q04_publish_gate: Q = (spark, dir) =>
    q02_constraint_audit(spark, dir).agg(
      count(lit(1)).as("n_checks"),
      sum(lit(1L) - col("passed")).as("n_failed"),
      concat_ws(",", sort_array(collect_list(
        when(col("passed") === 0L, col("check_name"))))).as("failed_csv"))
      .select(col("n_checks"), col("n_failed"),
        when(col("n_failed") === 0L, 1L).otherwise(0L).as("go"),
        col("failed_csv"))

  // --------------------------------------------------------------------
  // Registry + DuckDB twins
  // --------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q01_column_profile" -> q01_column_profile,
    "q01x_profile_kmv" -> q01x_profile_kmv,
    "q02_constraint_audit" -> q02_constraint_audit,
    "q03_constraint_trend" -> q03_constraint_trend,
    "q04_publish_gate" -> q04_publish_gate,
  )


  /** q02's DuckDB twin, shared verbatim by q04's wrapper. */
  private val duckQ02Sql: String =
    """WITH o AS (SELECT o.*, c.c_custkey AS ck
                    FROM orders o LEFT JOIN customer c
                      ON o.o_custkey = c.c_custkey),
         oa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_o,
                  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS v_complete,
                  CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
                  CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_domain,
                  CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_range,
                  CAST(COALESCE(SUM(CASE WHEN ck IS NULL AND o_custkey IS NOT NULL
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_fk_cust
                FROM o),
         l AS (SELECT l.l_quantity, l.l_shipdate, o.o_orderkey, o.o_orderdate
               FROM lineitem l LEFT JOIN orders o
                 ON l.l_orderkey = o.o_orderkey),
         la AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_l,
                  CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_fk_ord,
                  CAST(COALESCE(SUM(CASE WHEN l_quantity <= 0
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_qty,
                  CAST(COALESCE(SUM(CASE WHEN l_shipdate < o_orderdate
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_ship
                FROM l)
         SELECT 'completeness_o_custkey' AS check_name, n_o AS checked,
                v_complete AS violations,
                CAST(CASE WHEN v_complete = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed FROM oa
         UNION ALL SELECT 'unique_o_orderkey', n_o, v_unique,
                CAST(CASE WHEN v_unique = 0 THEN 1 ELSE 0 END AS BIGINT) FROM oa
         UNION ALL SELECT 'domain_o_orderstatus', n_o, v_domain,
                CAST(CASE WHEN v_domain = 0 THEN 1 ELSE 0 END AS BIGINT) FROM oa
         UNION ALL SELECT 'range_o_totalprice_pos', n_o, v_range,
                CAST(CASE WHEN v_range = 0 THEN 1 ELSE 0 END AS BIGINT) FROM oa
         UNION ALL SELECT 'fk_orders_customer', n_o, v_fk_cust,
                CAST(CASE WHEN v_fk_cust = 0 THEN 1 ELSE 0 END AS BIGINT) FROM oa
         UNION ALL SELECT 'fk_lineitem_orders', n_l, v_fk_ord,
                CAST(CASE WHEN v_fk_ord = 0 THEN 1 ELSE 0 END AS BIGINT) FROM la
         UNION ALL SELECT 'range_l_quantity_pos', n_l, v_qty,
                CAST(CASE WHEN v_qty = 0 THEN 1 ELSE 0 END AS BIGINT) FROM la
         UNION ALL SELECT 'rule_ship_after_order', n_l, v_ship,
                CAST(CASE WHEN v_ship = 0 THEN 1 ELSE 0 END AS BIGINT) FROM la"""

  val oracles: Map[String, String] = Map(
    "q01_column_profile" ->
      """WITH a AS (SELECT
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderkey) AS BIGINT) AS nn_ok,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_ok,
           CAST(MIN(o_orderkey) AS VARCHAR) AS mn_ok,
           CAST(MAX(o_orderkey) AS VARCHAR) AS mx_ok,
           CAST(COUNT(o_custkey) AS BIGINT) AS nn_ck,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_ck,
           CAST(MIN(o_custkey) AS VARCHAR) AS mn_ck,
           CAST(MAX(o_custkey) AS VARCHAR) AS mx_ck,
           CAST(COUNT(o_orderstatus) AS BIGINT) AS nn_os,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_os,
           MIN(o_orderstatus) AS mn_os,
           MAX(o_orderstatus) AS mx_os,
           CAST(COUNT(o_totalprice) AS BIGINT) AS nn_tp,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_tp,
           CAST(CAST(ROUND(MIN(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mn_tp,
           CAST(CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mx_tp,
           CAST(COUNT(o_orderdate) AS BIGINT) AS nn_od,
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd_od,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS mn_od,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS mx_od,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS nn_op,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_op,
           MIN(o_orderpriority) AS mn_op,
           MAX(o_orderpriority) AS mx_op
         FROM orders)
         SELECT 'o_orderkey' AS col_name, n_rows, nn_ok AS n_nonnull,
                nd_ok AS n_distinct, mn_ok AS min_val, mx_ok AS max_val FROM a
         UNION ALL SELECT 'o_custkey', n_rows, nn_ck, nd_ck, mn_ck, mx_ck FROM a
         UNION ALL SELECT 'o_orderstatus', n_rows, nn_os, nd_os, mn_os, mx_os FROM a
         UNION ALL SELECT 'o_totalprice', n_rows, nn_tp, nd_tp, mn_tp, mx_tp FROM a
         UNION ALL SELECT 'o_orderdate', n_rows, nn_od, nd_od, mn_od, mx_od FROM a
         UNION ALL SELECT 'o_orderpriority', n_rows, nn_op, nd_op, mn_op, mx_op FROM a""",
    "q01x_profile_kmv" -> {
      val k = Relational.KmvK
      val h = graft.functions.Portable.duckHash60("concat('kmv:', v)")
      s"""WITH pairs AS (
            SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v
            FROM orders
            UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
            UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
            UNION ALL SELECT 'o_totalprice',
              CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
            FROM orders
            UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d')
            FROM orders
            UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
          uh AS (SELECT DISTINCT col_name, $h AS h
                 FROM pairs WHERE v IS NOT NULL),
          r AS (SELECT col_name, h,
                       CAST(row_number() OVER (PARTITION BY col_name
                                               ORDER BY h) AS BIGINT) AS rank
                FROM uh)
          SELECT col_name, CAST(MAX(rank) AS BIGINT) AS n_kept,
                 MAX(h) AS kth,
                 CASE WHEN MAX(rank) < $k THEN MAX(rank)
                      ELSE CAST(floor(${k - 1}.0 * pow(2.0, 60.0) /
                             CAST(MAX(h) AS DOUBLE)) AS BIGINT) END
                   AS n_distinct_est
          FROM r WHERE rank <= $k GROUP BY col_name"""
    },
    "q02_constraint_audit" -> duckQ02Sql,
    // q04 wraps q02's full oracle as a derived table — the reduction
    // must agree with the audit it summarizes, row for row
    "q04_publish_gate" -> {
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_checks,
                 CAST(COUNT(*) FILTER (WHERE passed = 0) AS BIGINT) AS n_failed,
                 CAST(CASE WHEN COUNT(*) FILTER (WHERE passed = 0) = 0
                           THEN 1 ELSE 0 END AS BIGINT) AS go,
                 COALESCE(string_agg(check_name, ',' ORDER BY check_name)
                            FILTER (WHERE passed = 0), '') AS failed_csv
          FROM ($duckQ02Sql) a"""
    },
    "q03_constraint_trend" ->
      """WITH om AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(COALESCE(SUM(CASE WHEN c.c_custkey IS NULL
                                          AND o.o_custkey IS NOT NULL
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_fk_cust,
                  CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_range
                FROM orders o LEFT JOIN customer c
                  ON o.o_custkey = c.c_custkey
                GROUP BY 1),
         lm AS (SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
                  CAST(COUNT(*) AS BIGINT) AS n_lines,
                  CAST(COALESCE(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_ship
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey
                GROUP BY 1)
         SELECT om.month, om.n_orders, om.v_fk_cust, om.v_range,
                COALESCE(lm.n_lines, 0) AS n_lines,
                COALESCE(lm.v_ship, 0) AS v_ship
         FROM om LEFT JOIN lm USING (month)""",
  )
}
