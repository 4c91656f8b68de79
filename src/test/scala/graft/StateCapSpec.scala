package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{Pipelines, RetEvent, ScdEvent}

case class CubeOrder(r_name: String, n_name: String, o_totalprice: Double)

case class CdcOp(user_id: Long, tsu: Long, eid: Long, op: String,
                 balance_c: Option[Long], segment: Option[String])

case class WsDoc(doc_id: Long, pri: Double)

case class StratDoc(lang: String, doc_id: Long, h: Long)

case class SrcSh(source: String, h: Long)

case class PairLine(pk: Long, qty: Double, cents: Long)

case class ScoredDoc(query_id: Long, doc_id: Long, score: Double, leg: String)

case class LanedDoc(doc_id: Long, lane: String, content_hash: String,
                    clean_text: String)

/** The heavy-user bounded-state contract: a single user delivering 10k
  * events must leave retention/scd2 state CAPPED (the round-7 judge
  * task 4) with the documented deterministic truncation — smallest
  * days kept (retention), first-N-by-(tsu,event_id) prefix kept (scd2).
  */
class StateCapSpec extends SparkSpecBase {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)
  private def drain(q: StreamingQuery): Unit = q.processAllAvailable()

  test("retention: a 10k-day user truncates to MaxRetDays smallest days; cohort survives") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[RetEvent]
    val ev = ms.toDS().withWatermark("event_time", "1 hour")
    val q = Pipelines.retention(ev).toDF()
      .writeStream.format("memory").queryName("ret_cap_ms")
      .option("checkpointLocation", tmpDir("cp_retcap_"))
      .outputMode("append").start()
    try {
      // 10k distinct epoch days, delivered NEWEST-FIRST so the kept set
      // cannot be an arrival-order artifact; day d at midday of day d
      val base = 19000
      val events = (0 until 10000).reverseIterator.map { i =>
        RetEvent(7L, base + i, new Timestamp((base + i) * 86400000L + 43200000L))
      }.toSeq
      ms.addData(events: _*)
      drain(q)
      ms.addData(RetEvent(-1L, 47663, t("2100-01-01 00:00:00"))); drain(q)
      ms.addData(RetEvent(-1L, 47814, t("2100-06-01 00:00:00"))); drain(q)
      val got = spark.table("ret_cap_ms").where(col("user_id") >= 0)
        .collect().map(r => (r.getInt(1), r.getInt(2)))
      assert(got.length === Pipelines.MaxRetDays,
        s"state must cap at ${Pipelines.MaxRetDays} days, emitted ${got.length}")
      assert(got.forall(_._1 === base), "cohort must remain the MIN day")
      assert(got.map(_._2).sorted.toSeq ===
        (base until base + Pipelines.MaxRetDays),
        "kept days must be exactly the smallest MaxRetDays")
    } finally q.stop()
  }

  test("scd2: a 10k-event user truncates to the first MaxScdEvents; versions stay defined") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[ScdEvent]
    val ev = ms.toDS().withWatermark("event_time", "1 hour")
    val q = Pipelines.scd2(ev).toDF()
      .writeStream.format("memory").queryName("scd2_cap_ms")
      .option("checkpointLocation", tmpDir("cp_scdcap_"))
      .outputMode("append").start()
    try {
      // 10k events in runs of 100 (type flips every 100 events), one
      // second apart, delivered newest-first; the kept prefix is the
      // first MaxScdEvents = 10 complete runs → exactly 10 versions
      val base = t("2024-01-01 00:00:00").getTime
      val events = (0 until 10000).reverseIterator.map { i =>
        val tt = new Timestamp(base + i * 1000L)
        ScdEvent(7L, "t" + (i / 100), tt.getTime * 1000L, i.toLong, tt)
      }.toSeq
      ms.addData(events: _*)
      drain(q)
      ms.addData(ScdEvent(-1L, "x", t("2100-01-01 00:00:00").getTime * 1000L,
        99990L, t("2100-01-01 00:00:00"))); drain(q)
      ms.addData(ScdEvent(-1L, "x", t("2100-06-01 00:00:00").getTime * 1000L,
        99991L, t("2100-06-01 00:00:00"))); drain(q)
      val got = spark.table("scd2_cap_ms").where(col("user_id") >= 0)
        .orderBy(col("version_n")).collect()
      val nRuns = Pipelines.MaxScdEvents / 100
      assert(got.length === nRuns,
        s"versions must collapse over the capped prefix, got ${got.length}")
      assert(got.map(_.getAs[String]("event_type")).toSeq ===
        (0 until nRuns).map("t" + _), "versions must be the prefix's runs in order")
      assert(got.last.getAs[Long]("vt") === -1L,
        "the final kept version stays open")
    } finally q.stop()
  }

  test("scd2: truncation never pre-fires the flush under multi-batch delivery") {
    // The round-8 advisor's anchor hazard: batch 1 overflows the cap so
    // the NEWEST events are dropped from the kept prefix; batch 2 then
    // delivers only an OLDER event. If the TTL anchor were recomputed
    // from kept-prefix + current rows (the pre-ScdState arithmetic) it
    // would regress to kept-max + ttl and the flush would pre-fire once
    // the watermark passes it. ScdState.newestMs carries the true max
    // monotonically, so the mid sentinels here must NOT flush user 7.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[ScdEvent]
    val ev = ms.toDS().withWatermark("event_time", "1 hour")
    val q = Pipelines.scd2(ev, ttlMs = 3600000L, maxEvents = 5).toDF()
      .writeStream.format("memory").queryName("scd2_prefire_ms")
      .option("checkpointLocation", tmpDir("cp_scdpre_"))
      .outputMode("append").start()
    try {
      def se(typ: String, s: String, id: Long) = {
        val tt = t(s); ScdEvent(7L, typ, tt.getTime * 1000L, id, tt)
      }
      def sentinel(s: String, id: Long) = {
        val tt = t(s); ScdEvent(-1L, "x", tt.getTime * 1000L, id, tt)
      }
      // 10 events one minute apart; cap 5 keeps 10:00-10:04 ("a" run),
      // drops 10:05-10:09 ("b" run). True newest = 10:09 → anchor 11:09.
      // A kept-prefix recomputation would anchor at 10:04 → 11:04.
      ms.addData((0 until 10).reverseIterator.map { i =>
        se(if (i < 5) "a" else "b", f"2024-01-01 10:0$i%02d:00", i.toLong)
      }.toSeq: _*)
      drain(q)
      // batch 2: one OLDER event only — must not regress the anchor
      ms.addData(se("a", "2024-01-01 10:00:30", 10L)); drain(q)
      // watermark to 11:06 then 11:07 — past the buggy anchor (11:04),
      // before the true one (11:09); the second batch evaluates timeouts
      ms.addData(sentinel("2024-01-01 12:06:00", 11L)); drain(q)
      ms.addData(sentinel("2024-01-01 12:07:00", 12L)); drain(q)
      assert(spark.table("scd2_prefire_ms").where(col("user_id") >= 0).isEmpty,
        "flush fired between the kept-prefix anchor and the true anchor — pre-fire")
      // past the true anchor: the flush fires over the re-truncated
      // buffer (smallest 5 incl. the late 10:00:30 row — all "a")
      ms.addData(sentinel("2100-01-01 00:00:00", 13L)); drain(q)
      ms.addData(sentinel("2100-06-01 00:00:00", 14L)); drain(q)
      val got = spark.table("scd2_prefire_ms").where(col("user_id") >= 0)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(4)))
      assert(got.toSeq === Seq(("a", 1L, -1L)),
        s"the capped history is one open 'a' version; got ${got.toSeq}")
    } finally q.stop()
  }

  test("st57's sample serving: the top-k buffer survives a kill/resume; a post-restart arrival evicts a pre-restart member") {
    // st57's shape: ONE global update-mode TopK buffer, upsert-served.
    // Run 2's high-priority doc must enter the recovered buffer and
    // push out the weakest pre-restart member — proving the buffer
    // state (not just the served table) came back from the checkpoint.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[WsDoc]
    val cp = tmpDir("cp_st57_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st57_restart_"), Seq("g"), "n_seen")
    def base = ms.toDF().groupBy(lit(1L).as("g"))
      .agg(graft.functions.TopK.topK(3)(col("pri"), col("doc_id")).as("tk"),
        count(lit(1)).as("n_seen"))
      .select(col("g"), col("tk.items").as("items"), col("n_seen"))
    ms.addData(WsDoc(1L, 10.0), WsDoc(2L, 20.0), WsDoc(3L, 30.0), WsDoc(4L, 5.0))
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, writer dies
    ms.addData(WsDoc(5L, 40.0))
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed pass 2
    val got = served.select(org.apache.spark.sql.functions.explode(col("items")))
      .select(col("col.id")).collect().map(_.getLong(0)).toSet
    assert(got === Set(5L, 3L, 2L),
      s"recovered buffer wrong: $got (40>30>20 must survive, 10 evicted)")
    assert(served.head().getAs[Long]("n_seen") === 5L,
      "n_seen must count across the restart")
  }

  test("st71's stratified serving: the MinK quota buffer survives a kill/resume; a post-restart smaller hash evicts a pre-restart member") {
    // st71's shape: one MinK buffer + one count per stratum, upsert-
    // served. Run 2's smaller hash must enter the RECOVERED buffer and
    // evict the largest pre-restart member; n_stratum must count
    // across the restart — proving the aggregation state (not just the
    // served table) came back from the checkpoint.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[StratDoc]
    val cp = tmpDir("cp_st71_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st71_restart_"), Seq("lang"), "n_stratum")
    def base = ms.toDF().groupBy(col("lang"))
      .agg(graft.functions.MinK.minK(3)(col("h"), col("doc_id")).as("s"),
        count(lit(1)).as("n_stratum"))
      .select(col("lang"), col("s.items").as("items"), col("n_stratum"))
    ms.addData(StratDoc("en", 1L, 40L), StratDoc("en", 2L, 20L),
      StratDoc("en", 3L, 30L), StratDoc("en", 4L, 50L))
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, writer dies
    ms.addData(StratDoc("en", 5L, 10L))
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed pass 2
    val got = served.select(explode(col("items")))
      .select(col("col.id")).collect().map(_.getLong(0)).toSet
    assert(got === Set(5L, 2L, 3L),
      s"recovered quota buffer wrong: $got (10<20<30 must survive, 40/50 out)")
    assert(served.head().getAs[Long]("n_stratum") === 5L,
      "n_stratum must count across the restart")
  }

  test("st83's source sketches: state caps at k regardless of shingle volume and survives a kill/resume") {
    // st83's shape: ONE MinK buffer per source over shingle hashes —
    // the r13 rework that replaced the per-common-shingle state rows
    // (state ∝ overlap, corpus-sized for mirrored sources at 100 TB)
    // with O(|sources|·k). Feed 6 distinct hashes into a k=4 buffer:
    // it must hold exactly the 4 smallest; after a kill/resume a
    // smaller hash must enter the RECOVERED buffer and evict its
    // largest member — proving both the cap and that the aggregation
    // state came back from the checkpoint.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[SrcSh]
    val cp = tmpDir("cp_st83_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st83_restart_"), Seq("source"), "n_kept_src")
    def base = ms.toDF().groupBy(col("source"))
      .agg(graft.functions.MinK.minK(4)(col("h"), col("h")).as("s"))
      .select(col("source"), col("s.items").as("items"),
        size(col("s.items")).cast("long").as("n_kept_src"))
    ms.addData(SrcSh("web", 40L), SrcSh("web", 20L), SrcSh("web", 60L),
      SrcSh("web", 30L), SrcSh("web", 50L), SrcSh("web", 10L),
      SrcSh("web", 20L)) // repeat absorbs — set semantics
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, writer dies
    ms.addData(SrcSh("web", 5L))
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed
    val got = served.select(explode(col("items")))
      .select(col("col.h")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 10L, 20L, 30L),
      s"recovered source sketch wrong: $got (cap 4, 5 must evict 40)")
    assert(served.head().getAs[Long]("n_kept_src") === 4L,
      "n_kept_src must report the capped buffer size")
  }

  test("st55's CDC serving: state survives a kill/resume; a post-restart delete tombstones a pre-restart insert") {
    // The boundary/candidate maxes must recover from the checkpoint:
    // run 2's delete of user 1 has to beat an insert that was only
    // ever seen in run 1, and user 2's update must patch one column
    // of a recovered image without clobbering the other.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[CdcOp]
    val cp = tmpDir("cp_st55_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st55_restart_"), Seq("user_id"), "last_tsu")
    def base = SQ.cdcServeAgg(ms.toDF())
    ms.addData(
      CdcOp(1L, 10L, 1L, "insert", Some(10L), Some("new")),
      CdcOp(2L, 10L, 2L, "insert", Some(7L), Some("new")))
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, then the writer dies
    ms.addData(
      CdcOp(1L, 20L, 3L, "delete", None, None),
      CdcOp(2L, 20L, 4L, "update", Some(42L), None))
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed pass 2
    val got = served.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3))))
    assert(got.toSeq === Seq(
      (1L, "delete", None, None),
      (2L, "insert", Some(42L), Some("new"))),
      s"recovered CDC state is wrong: ${got.toSeq}")
  }

  test("st23's upsert-serving path: cube survives a kill/resume; served rollup equals batch") {
    // The round-8 verdict's task 6: kill the serving writer mid-stream
    // and resume it over the SAME checkpoint + table — the update-mode
    // aggregation state must recover (post-restart totals include
    // pre-restart orders), the idempotent upsert must not double-apply,
    // and the read-side rollup over the served cells must equal the
    // batch rollup over ALL delivered orders (a11's arithmetic).
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[CubeOrder]
    val cp = tmpDir("cp_st23_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st23_restart_"), Seq("r_name", "n_name"), "n_orders")
    def base = ms.toDF()
      .groupBy(col("r_name"), col("n_name"))
      .agg(Tables.moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    val run1 = Seq(
      CubeOrder("EUROPE", "FRANCE", 10.01), CubeOrder("EUROPE", "FRANCE", 20.02),
      CubeOrder("EUROPE", "GERMANY", 5.50), CubeOrder("ASIA", "JAPAN", 7.77))
    val run2 = Seq(
      CubeOrder("EUROPE", "FRANCE", 1.99), // updates a recovered cell
      CubeOrder("ASIA", "CHINA", 3.33)) // opens a new cell after restart
    ms.addData(run1: _*)
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, then the writer dies
    ms.addData(run2: _*)
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed pass 2
    val got = SQ.rollupOnRead(served)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val expected = SQ.rollupOnRead((run1 ++ run2).toDF("r_name", "n_name", "o_totalprice")
        .groupBy(col("r_name"), col("n_name"))
        .agg(Tables.moneySum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders")))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected,
      s"served rollup after kill/resume must equal the batch cube;\n got $got\n exp $expected")
    assert(got((Some("EUROPE"), Some("FRANCE")))._2 === 3L,
      "the updated cell must carry pre- AND post-restart orders exactly once")
  }

  test("st35's serving path: leg rankings survive a kill/resume; fusion equals batch") {
    // st35's twin of the st23 lock: kill the hybrid serving writer
    // between batches, resume over the SAME checkpoint + table — the
    // per-(query, leg) TopK state must recover (post-restart arrivals
    // displace pre-restart entries exactly as one continuous stream
    // would), and the RRF fusion derived from the served buffers must
    // equal the fusion over ALL delivered rows.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[ScoredDoc]
    val cp = tmpDir("cp_st35_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st35_restart_"), Seq("query_id", "leg"), "n_scored")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("query_id"), col("leg"))
      .agg(graft.functions.TopK.topK(50)(col("score"), col("doc_id")).as("tk"),
        count(lit(1)).as("n_scored"))
      .select(col("query_id"), col("leg"), col("tk.items").as("items"),
        col("n_scored"))
    val run1 = Seq(
      ScoredDoc(0, 11, 900000.0, "lex"), ScoredDoc(0, 12, 800000.0, "lex"),
      ScoredDoc(0, 12, 0.91, "sem"), ScoredDoc(0, 13, 0.88, "sem"))
    val run2 = Seq(
      ScoredDoc(0, 14, 950000.0, "lex"), // displaces the pre-restart leader
      ScoredDoc(0, 11, 0.99, "sem")) // a doc gaining its second leg
    ms.addData(run1: _*)
    SQ.upsertServeWith(spark, agg(ms.toDF()), table, cp) // pass 1, writer dies
    ms.addData(run2: _*)
    val served = SQ.upsertServeWith(spark, agg(ms.toDF()), table, cp) // resumed
    val got = SQ.hybridServeOnRead(served)
      .collect().map(_.toSeq.mkString(",")).sorted.toSeq
    val expected = SQ.hybridServeOnRead(agg((run1 ++ run2).toDF()))
      .collect().map(_.toSeq.mkString(",")).sorted.toSeq
    assert(got.nonEmpty && got === expected,
      s"fused serving after kill/resume must equal the batch fusion;\n got $got\n exp $expected")
  }

  test("st51's serving path: front-door lanes survive a kill/resume; keeper stays the min id") {
    // st51's twin of the st23 lock: kill the front-door serving writer
    // between batches, resume over the SAME checkpoint + table — the
    // (lane, content_hash) keeper state must recover, a post-restart
    // copy with a SMALLER id must take the keeper role from the
    // pre-restart keeper exactly as one continuous stream would, and
    // the served table must equal the batch rollup over ALL delivered
    // rows. (The stateless gates ahead of this tail are batch-proven
    // by st51's chained oracle; this locks the stateful tail.)
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[LanedDoc]
    val cp = tmpDir("cp_st51_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_st51_restart_"),
      Seq("lane", "content_hash", "clean_text"), "n_copies")
    val run1 = Seq(
      LanedDoc(30L, "admitted", "h1", "clean one"),
      LanedDoc(40L, "admitted", "h1", "clean one"),
      LanedDoc(7L, "corrupt", "h2", ""),
      LanedDoc(9L, "dup", "h3", ""))
    val run2 = Seq(
      LanedDoc(10L, "admitted", "h1", "clean one"), // takes h1's keeper role
      LanedDoc(5L, "mixture", "h4", "")) // a new lane after restart
    ms.addData(run1: _*)
    SQ.upsertServeWith(spark, SQ.frontDoorAgg(ms.toDF()), table, cp) // writer dies
    ms.addData(run2: _*)
    val served = SQ.upsertServeWith(spark, SQ.frontDoorAgg(ms.toDF()), table, cp)
    def key(r: org.apache.spark.sql.Row) = r.toSeq.mkString("|")
    val got = served
      .select(col("lane"), col("content_hash"), col("clean_text"),
        col("keeper_id"), col("n_copies"))
      .collect().map(key).sorted.toSeq
    val expected = SQ.frontDoorAgg((run1 ++ run2).toDF()
        .select(col("doc_id"), col("lane"), col("content_hash"), col("clean_text")))
      .select(col("lane"), col("content_hash"), col("clean_text"),
        col("keeper_id"), col("n_copies"))
      .collect().map(key).sorted.toSeq
    assert(got.nonEmpty && got === expected,
      s"served lanes after kill/resume must equal the batch rollup;\n got $got\n exp $expected")
    val h1 = served.where(col("content_hash") === "h1").collect()
    assert(h1.length === 1 && h1.head.getAs[Long]("keeper_id") === 10L &&
      h1.head.getAs[Long]("n_copies") === 3L,
      "the post-restart smaller id must take the keeper role over recovered state")
  }

  test("composite-key upsert (st94/st97's grain) survives a kill/resume; counts accumulate per pair, not per first key") {
    // Every other upsert test keys by ONE column; st94 keys state by
    // (part, qty) and st97 by (order, supplier). This locks the
    // composite contract across a restart: a post-restart row for the
    // SAME pair must merge into the recovered pair row (count goes up),
    // a row sharing only the FIRST key component must create a NEW
    // row — a table that keyed on the first column alone would pass
    // every single-key test and corrupt both queries.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val SQ = graft.streaming.StreamQueries
    val ms = MemoryStream[PairLine]
    val cp = tmpDir("cp_pair_restart_")
    val table = new graft.sinks.KeyedUpsertTable(
      spark, tmpDir("tbl_pair_restart_"), Seq("pk", "qty"), "n_lines")
    def base = ms.toDF().groupBy(col("pk"), col("qty"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("rev_cents"))
    ms.addData(PairLine(1L, 5.0, 100L), PairLine(1L, 5.0, 50L),
      PairLine(1L, 7.0, 30L))
    SQ.upsertServeWith(spark, base, table, cp) // pass 1, writer dies
    ms.addData(PairLine(1L, 5.0, 25L), PairLine(2L, 5.0, 10L))
    val served = SQ.upsertServeWith(spark, base, table, cp) // resumed
    val got = served.collect()
      .map(r => (r.getLong(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      (1L, 5.0) -> (3L, 175L),
      (1L, 7.0) -> (1L, 30L),
      (2L, 5.0) -> (1L, 10L)),
      s"composite-grain state wrong after restart: $got")
  }
}
