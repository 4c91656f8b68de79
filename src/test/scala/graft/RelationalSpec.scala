package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Batch-operator invariants the differential oracle can't express:
  * per-group properties, null-on-miss shapes, allocation exactness.
  */
class RelationalSpec extends SparkSpecBase {

  test("w03: per-order allocations sum exactly to the order total") {
    val alloc = Relational.w03_payment_allocation(spark, sf)
      .groupBy(col("order_id"))
      .agg(sum(round(col("final_detail_amount") * 100)).as("alloc_cents"))
    val totals = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("order_id"),
        round(col("o_totalprice") * 100).as("total_cents"))
    val bad = alloc.join(totals, "order_id")
      .where(col("alloc_cents") =!= col("total_cents"))
    assert(bad.count() === 0)
  }

  test("a03: one row per day, all counts positive") {
    val dau = Relational.a03_dau(spark, sf)
    assert(dau.count() === dau.select("dt").distinct().count())
    assert(dau.where(col("dau") <= 0).count() === 0)
  }

  test("a07: KMV DAU is exact below k, within 2/sqrt(k) of exact above") {
    val exact = Relational.a03_dau(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.a07_dau_approx(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    val k = Relational.KmvK
    approx.foreach { case (dt, a) =>
      val e = exact(dt)
      if (e < k) assert(a === e, s"$dt: sub-k regime must be exact ($a vs $e)")
      else assert(math.abs(a - e).toDouble / e <= 2.0 / math.sqrt(k.toDouble),
        s"$dt: approx $a vs exact $e exceeds 2/sqrt($k)")
    }
  }

  test("j05: one survivor per (orderkey, partkey), and it is the min line number") {
    val d = Relational.j05_join_dedup(spark, sf)
    assert(d.groupBy("l_orderkey", "l_partkey").count().where(col("count") > 1).count() === 0)
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey", "l_partkey")
      .agg(min("l_linenumber").as("l_linenumber"))
    assert(d.exceptAll(expected.select("l_orderkey", "l_partkey", "l_linenumber")).count() === 0)
    assert(d.count() === expected.count())
  }

  test("j01: dim miss yields NULL dim fields, not a dropped row (fixture)") {
    val dir = tmpDir("j01_fixture_")
    import spark.implicits._
    Seq((1L, 1, 100L), (2L, 1, 999L)) // partkey 999 has no dim row
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((100L, "n", "b", "t"))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
      .write.parquet(s"$dir/part.parquet")
    val out = Relational.j01_lookup_join(spark, dir).collect()
    assert(out.length === 2)
    val miss = out.find(_.getLong(0) == 2L).get
    assert(miss.isNullAt(miss.fieldIndex("sku_name")))
    val hit = out.find(_.getLong(0) == 1L).get
    assert(hit.getAs[String]("sku_name") === "n")
  }

  test("j08: as-of semantics — latest at-or-before order, ties inclusive, null before first") {
    val dir = tmpDir("j08_fixture_")
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // user 1: orders at day 1 (keys 10 and 11 — same date, max wins) and day 5
    Seq((10L, 1L, ts("2024-01-01 00:00:00")),
        (11L, 1L, ts("2024-01-01 00:00:00")),
        (20L, 1L, ts("2024-01-05 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq((100L, ts("2023-12-31 00:00:00"), 1L), // before any order -> null
        (101L, ts("2024-01-01 00:00:00"), 1L), // equal ts -> inclusive, max key 11
        (102L, ts("2024-01-03 00:00:00"), 1L), // between -> day-1 order
        (103L, ts("2024-06-01 00:00:00"), 1L)) // after all -> day-5 order
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.j08_asof_join(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got === Map(100L -> -1L, 101L -> 11L, 102L -> 11L, 103L -> 20L))
  }

  test("j06: completion defaults — no NULL metrics on unmatched sides") {
    val j = Relational.j06_outer_join(spark, sf)
    assert(j.where(col("n_returned").isNull || col("returned_amt").isNull).count() === 0)
    // unmatched orders carry zero metrics and the order_only state
    assert(j.where(col("join_state") === "order_only" && col("n_returned") =!= 0).count() === 0)
  }

  test("a09: the funnel is ORDERED — out-of-sequence events do not convert") {
    // the sf corpus is dense (every user eventually converts), so the
    // ordering constraint only bites on a crafted fixture:
    //   user 1: signup < click < purchase  -> all three stages
    //   user 2: purchase < click < signup  -> stage 1 only
    //   user 3: click BEFORE signup        -> stage 1 only
    import spark.implicits._
    val dir = tmpDir("a09_fixture_")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 0.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 2L, "purchase", 0.0, "{}"),
      (5L, ts("2024-01-01 11:00:00"), 2L, "click", 0.0, "{}"),
      (6L, ts("2024-01-01 12:00:00"), 2L, "signup", 0.0, "{}"),
      (7L, ts("2024-01-01 09:00:00"), 3L, "click", 0.0, "{}"),
      (8L, ts("2024-01-01 10:00:00"), 3L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.a09_funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_signup" -> 3L, "2_signup_click" -> 1L,
      "3_signup_click_purchase" -> 1L), s"got $got")
  }

  test("j11: consecutive same-type events collapse into one version; intervals chain") {
    import spark.implicits._
    val dir = tmpDir("j11_fixture_")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: A A B A -> versions A(1) B(2) A(3); user 2: single event
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 13:00:00"), 1L, "view", 0.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Relational.j11_scd2_history(spark, dir)
      .orderBy(col("user_id"), col("version_n")).collect()
    val u1 = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(2), r.getString(1), r.getBoolean(5)))
    assert(u1.toSeq === Seq((1L, "view", false), (2L, "click", false), (3L, "view", true)))
    // every closed version's valid_to equals the next version's valid_from
    val chain = rows.filter(_.getLong(0) == 1L)
    for (Array(a, b) <- chain.sliding(2))
      assert(a.getTimestamp(4) === b.getTimestamp(3),
        s"interval gap between versions ${a.getLong(2)} and ${b.getLong(2)}")
    assert(rows.count(_.getLong(0) == 2L) === 1 &&
      rows.find(_.getLong(0) == 2L).get.getBoolean(5))
  }

  /** The CDC-apply semantics pinned on a hand-built changelog where
    * the order is controlled (the oracle differential runs the same
    * derivation on both engines, so it can't catch a shared
    * misreading of the semantics themselves):
    *  - partial update patches one column, keeps the other
    *  - re-insert RESETS state (pre-reinsert updates must not leak)
    *  - a delete tombstones the key even with earlier generations
    *  - updates to a never-inserted key are dropped, not applied
    */
  test("j17: generation reset, tombstone and orphan-update semantics") {
    import spark.implicits._
    val log = Seq(
      // u1: insert(10,new) → update balance 20 → insert(5,re) → update segment
      (1L, 10L, 1L, "insert", Some(10L), Some("new")),
      (1L, 20L, 2L, "update", Some(20L), None),
      (1L, 30L, 3L, "insert", Some(5L), Some("re")),
      (1L, 40L, 4L, "update", None, Some("gold")),
      // u2: insert → delete (tombstoned)
      (2L, 10L, 5L, "insert", Some(7L), Some("new")),
      (2L, 20L, 6L, "delete", None, None),
      // u3: update only, never inserted (orphan — dropped)
      (3L, 10L, 7L, "update", Some(9L), None),
      // u4: delete then update after the delete (must NOT resurrect)
      (4L, 10L, 8L, "insert", Some(1L), Some("new")),
      (4L, 20L, 9L, "delete", None, None),
      (4L, 30L, 10L, "update", Some(99L), None))
      .toDF("user_id", "tsu", "eid", "op", "balance_c", "segment")
    val out = Relational.cdcApply(log)
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // u1 survives with the RE-INSERTED balance (5, not 20), the
    // post-reinsert segment patch, and only gen-2 ops counted
    assert(out.toSeq === Seq((1L, 5L, "gold", 2L)))
  }

  /** w07's pattern semantics pinned on a hand-built log (the oracle
    * re-derives the same relation, so a shared misreading of
    * "between" would pass the differential):
    *  - an error between click and purchase kills the match
    *  - an error BEFORE the click does not
    *  - a later clean click re-arms after an error
    *  - the 1-hour window binds
    *  - an error at the purchase's exact instant counts as between
    *    (clicks < errors < purchases at one instant)
    */
  test("w07: negation, re-arm, window and instant-tie semantics") {
    import spark.implicits._
    val H = 3600000000L
    val log = Seq(
      (1L, "click", 0L, 1L), (1L, "purchase", 100L, 2L), // match
      (2L, "click", 0L, 3L), (2L, "error", 50L, 4L), (2L, "purchase", 100L, 5L), // killed
      (3L, "error", 0L, 6L), (3L, "click", 50L, 7L), (3L, "purchase", 100L, 8L), // match
      (4L, "click", 0L, 9L), (4L, "purchase", H + 1L, 10L), // window exceeded
      (5L, "click", 0L, 11L), (5L, "error", 10L, 12L),
      (5L, "click", 20L, 13L), (5L, "purchase", 30L, 14L), // re-armed → match on 13
      (6L, "click", 0L, 15L), (6L, "error", 100L, 16L), (6L, "purchase", 100L, 17L)) // instant tie kills
      .toDF("user_id", "event_type", "tsu", "event_id")
    val got = Relational.sequenceMatch(log)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 1L), (8L, 7L), (14L, 13L)),
      s"pattern instances wrong: $got")
  }

  /** Cross-operator contract: the time-travel read AS OF 1 must equal
    * the base snapshot with p17's diff applied — the two operators
    * describe the same version edge from opposite directions, and a
    * drift between them would mean the diff model and the log-fold
    * model disagree.
    */
  test("s14: AS OF 1 == base ⊕ p17's diff (keys and changed-text agreement)") {
    val base = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val diff = Relational.p17_snapshot_diff(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v1 = Relational.s14_time_travel(spark, sf)
      .where(col("version_read") === 1)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    val expectedKeys = (base.keySet -- diff.filter(_._2 == "removed").keySet) ++
      diff.filter(_._2 == "added").keySet
    assert(v1.keySet === expectedKeys, "AS OF 1 key set diverges from base ⊕ diff")
    v1.foreach { case (id, text) =>
      diff.get(id) match {
        case Some("changed") => assert(text !== base(id), s"doc $id marked changed but text equals base")
        case Some("added") => assert(!base.contains(id))
        case _ => assert(text === base(id), s"undiffed doc $id drifted in the fold")
      }
    }
  }

  test("j14: per-purchase credit conserves the purchase's cents exactly") {
    val out = Relational.j14_multitouch_attribution(spark, sf)
      .groupBy(col("purchase_id"))
      .agg(sum(col("credit_cents")).as("total"))
    val purch = graft.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val bad = out.join(purch, "purchase_id")
      .where(col("total") =!= col("cents")).count()
    assert(bad === 0L, s"$bad purchases lose or mint credit in the split")
  }

  /** The z-order layout claim measured, not asserted from theory: the
    * SAME rows land three ways (user-sorted, day-sorted, z-ordered)
    * and the z-ordered files must carry tighter per-file spans on the
    * dimension each linear sort leaves full-width.
    */
  test("f02: the z-ordered layout tightens BOTH dimensions' per-file spans") {
    val dir = tmpDir("zorder_")
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long").as("day_idx"))
    def spans(sortCol: org.apache.spark.sql.Column, path: String) = {
      ev.repartition(1).sortWithinPartitions(sortCol)
        .write.option("maxRecordsPerFile", 100).mode("overwrite").parquet(path)
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("user_id")) - min(col("user_id"))).as("us"),
          (max(col("day_idx")) - min(col("day_idx"))).as("ds"))
        .agg(avg(col("us")), avg(col("ds"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (_, dayUnderUserSort) = spans(col("user_id"), s"$dir/u")
    val (userUnderDaySort, _) = spans(col("day_idx"), s"$dir/d")
    val (uZ, dZ) = spans(
      graft.operators.Relational.morton2(col("user_id"), col("day_idx")), s"$dir/z")
    assert(dZ < dayUnderUserSort,
      s"z-order must tighten day spans ($dZ) vs the user-sorted layout ($dayUnderUserSort)")
    assert(uZ < userUnderDaySort,
      s"z-order must tighten user spans ($uZ) vs the day-sorted layout ($userUnderDaySort)")
  }

  test("a20: merged weekly sketches bracket the exact distinct; merge path is identity") {
    val approx = Relational.a20_sketch_reagg(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("wau_approx").toDouble).toMap
    val exact = Tables.events(spark, sf)
      .select(date_format(date_trunc("week", to_date(col("ts"))), "yyyy-MM-dd").as("wk"),
        col("user_id"))
      .groupBy(col("wk")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.nonEmpty && approx.keySet === exact.keySet)
    approx.foreach { case (wk, est) =>
      val n = exact(wk).toDouble
      assert(math.abs(est - n) <= 0.05 * n + 2,
        s"week $wk: estimate $est vs exact $n outside the lgK=12 envelope")
    }
    // merge-path identity: union-of-daily == the directly built weekly sketch
    val direct = Tables.events(spark, sf)
      .select(date_format(date_trunc("week", to_date(col("ts"))), "yyyy-MM-dd").as("wk"),
        col("user_id"))
      .groupBy(col("wk"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("est"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est").toDouble).toMap
    approx.foreach { case (wk, est) =>
      assert(math.abs(est - direct(wk)) <= 0.01 * direct(wk),
        s"week $wk: merged-daily estimate $est diverges from direct sketch ${direct(wk)}")
    }
  }

  test("j15: bucketing changes layout, never content (equals the plain join)") {
    val bucketed = Relational.j15_bucketed_join(spark, sf)
    val plain = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .join(Tables.orders(spark, sf)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            Tables.moneySum(col("o_totalprice")).as("user_spend")),
        col("user_id") === col("o_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("n_orders"), col("user_spend"))
    assert(bucketed.exceptAll(plain).count() === 0L &&
      plain.exceptAll(bucketed).count() === 0L,
      "the bucketed plan must compute the identical relation")
  }

  test("a17: the KMV estimate brackets the exact distinct within the k=64 envelope") {
    val est = Relational.a17_kmv_sample(spark, sf)
      .groupBy(col("event_type")).agg(max(col("est_distinct")).as("est"))
    val exact = graft.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
    val rows = est.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, n) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      // k=64 gives σ ≈ n/8; 4σ is a generous deterministic-fixture bound
      assert(math.abs(e - n) <= n / 2.0,
        s"${r.getString(0)}: estimate $e vs exact $n out of envelope")
    }
  }

  test("bucketedPrefix reproduces the naive global window at every bucket count") {
    import spark.implicits._
    // skewed values, heavy ties (incl. a dominant value), negatives
    val rows = (1L to 500L).map(i => (i % 7, i, i % 13)) ++
      (501L to 600L).map(i => (-3L, i, 1L)) ++ Seq((0L, 601L, 0L))
    val df = rows.toDF("k", "id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))
    val naive = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum_v", sum(col("v")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .select("k", "id", "v", "rnk", "cum_v")
    for (nb <- Seq(2, 3, 32, 64)) {
      val bucketed = Relational.bucketedPrefix(df, "k", "id", "v", nb)
        .select("k", "id", "v", "rnk", "cum_v")
      assert(bucketed.exceptAll(naive).count() === 0L &&
        naive.exceptAll(bucketed).count() === 0L,
        s"nBuckets=$nb diverges from the single-partition window")
    }
  }
}
