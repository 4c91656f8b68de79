package graft

import graft.operators.Quality

/** Quality-family gates: suite-internal consistency (the constraint
  * battery's pass flags vs its violation counts, the profile's
  * counting identities) — the invariants that hold on ANY data, so
  * they complement the fixture-pinned differential oracles.
  */
class QualitySpec extends SparkSpecBase {

  test("q02 battery: 8 constraints, passed iff zero violations, denominators positive") {
    val rows = Quality.q02_constraint_audit(spark, sf).collect()
    assert(rows.length == 8, s"expected 8 constraint rows, got ${rows.length}")
    val names = rows.map(_.getAs[String]("check_name")).toSet
    assert(names.contains("fk_lineitem_orders") && names.contains("unique_o_orderkey"))
    rows.foreach { r =>
      val v = r.getAs[Long]("violations")
      val p = r.getAs[Long]("passed")
      val n = r.getAs[Long]("checked")
      assert(p == (if (v == 0L) 1L else 0L),
        s"${r.getAs[String]("check_name")}: passed=$p violations=$v")
      assert(v >= 0L && v <= n, s"${r.getAs[String]("check_name")}: v=$v n=$n")
    }
  }

  test("q01 profile identities: nonnull <= rows, distinct <= nonnull, min <= max on keys") {
    val rows = Quality.q01_column_profile(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val nn = r.getAs[Long]("n_nonnull")
      val nd = r.getAs[Long]("n_distinct")
      assert(nn <= n && nd <= nn,
        s"${r.getAs[String]("col_name")}: n=$n nonnull=$nn distinct=$nd")
    }
    val ok = rows.find(_.getAs[String]("col_name") == "o_orderkey").get
    assert(ok.getAs[Long]("n_distinct") == ok.getAs[Long]("n_nonnull"),
      "o_orderkey must profile as unique")
    assert(ok.getAs[String]("min_val").toLong <= ok.getAs[String]("max_val").toLong)
  }

  test("q04 gate reconciles with the audit it summarizes") {
    val gate = Quality.q04_publish_gate(spark, sf).head()
    val audit = Quality.q02_constraint_audit(spark, sf).collect()
    val failed = audit.filter(_.getAs[Long]("passed") == 0L)
      .map(_.getAs[String]("check_name")).sorted
    assert(gate.getAs[Long]("n_checks") == audit.length)
    assert(gate.getAs[Long]("n_failed") == failed.length)
    assert(gate.getAs[Long]("go") == (if (failed.isEmpty) 1L else 0L))
    assert(gate.getAs[String]("failed_csv") == failed.mkString(","))
  }

  test("q03 trend reconciles with q02 totals on the shared metrics") {
    val trend = Quality.q03_constraint_trend(spark, sf).collect()
    val audit = Quality.q02_constraint_audit(spark, sf).collect()
      .map(r => r.getAs[String]("check_name") -> r).toMap
    assert(trend.map(_.getAs[Long]("n_orders")).sum ==
      audit("range_o_totalprice_pos").getAs[Long]("checked"),
      "per-month order counts must sum to the audit's orders denominator")
    assert(trend.map(_.getAs[Long]("v_ship")).sum ==
      audit("rule_ship_after_order").getAs[Long]("violations"),
      "per-month ship-rule violations must sum to the audit total")
    assert(trend.map(_.getAs[Long]("v_fk_cust")).sum ==
      audit("fk_orders_customer").getAs[Long]("violations"))
  }
}
