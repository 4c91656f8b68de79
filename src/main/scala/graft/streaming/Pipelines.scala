package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user's order as seen by the stateful first-order operator. */
case class OrderEvent(o_orderkey: Long, o_custkey: Long, o_orderdate: java.sql.Timestamp)

/** First-order flag output row. */
case class OrderFlag(o_orderkey: Long, o_custkey: Long, if_first_order: String)

/** One order line entering the streaming allocation operator: integer
  * cents carried as exact doubles (see [[graft.Tables.cents]]).
  */
case class AllocLine(order_id: Long, line_id: Int, line_cents: Double,
                     total_cents: Double, event_time: java.sql.Timestamp)

/** Allocation output row (same shape/aliases as batch w03). */
case class AllocOut(order_id: Long, line_id: Int, sku_total: Double,
                    final_detail_amount: Double)

/** One SimHash band row entering the streaming near-dup operator:
  * the full 48-bit fingerprint rides along for the hamming verify.
  */
case class BandRow(doc_id: Long, band: Int, bkey: Long, fp: Long,
                   event_time: java.sql.Timestamp)

/** Band-claim verdict: `ok` iff the document owns this (band, bkey)
  * bucket or is NOT a near-dup (hamming > threshold) of the bucket's
  * owner within the dedup window.
  */
case class BandClaim(doc_id: Long, band: Int, ok: Boolean)

/** One event entering the streaming funnel: `tsu` is the event time in
  * exact MICROseconds (`java.sql.Timestamp.getTime` is millis — the
  * stage comparisons are strict, so sub-millisecond ordering matters);
  * `event_time` is the watermark column.
  */
case class FunnelEvent(user_id: Long, event_type: String, tsu: Long,
                       event_id: Long, event_time: java.sql.Timestamp)

/** Per-user funnel anchors in micros; -1 = stage not reached. */
case class FunnelState(t1: Long, t2: Long, t3: Long)

/** A user's final funnel depth (1-3), emitted on state timeout. */
case class FunnelUser(user_id: Long, stage: Long)

/** One event entering the streaming retention operator: `day` is the
  * epoch-day of the event (cohorting is date-granular).
  */
case class RetEvent(user_id: Long, day: Int, event_time: java.sql.Timestamp)

/** [[Pipelines.retention]] state: the user's distinct active days
  * (bounded — capped at `maxDays`, smallest kept) plus the newest
  * event-time millis seen, the TTL anchor (anchoring on the DAY number
  * alone would pre-expire the timeout for events arriving later than
  * ttl past midnight — the round-7 advisor item).
  */
case class RetState(days: Seq[Int], newestMs: Long)

/** A user's (cohort day, active day) pair, emitted once per distinct
  * active day when the user's state times out.
  */
case class RetHit(user_id: Long, cohort_day: Int, day: Int)

/** One CDC-style event entering the streaming SCD2 operator (`tsu` =
  * exact micros; `event_time` = watermark column).
  */
case class ScdEvent(user_id: Long, event_type: String, tsu: Long,
                    event_id: Long, event_time: java.sql.Timestamp)

/** One buffered event in SCD2 state. */
case class ScdBuf(tsu: Long, event_id: Long, event_type: String)

/** SCD2 keyed state: the capped event buffer plus the newest
  * event-time EVER seen for the key (micros→millis), carried
  * monotonically so the TTL anchor survives truncation across
  * batches — the [[RetState]] pattern.
  */
case class ScdState(buf: Seq[ScdBuf], newestMs: Long)

/** One buffered touchpoint/conversion in attribution state. */
case class AttrEvent(user_id: Long, tsu: Long, event_id: Long,
                     is_click: Boolean, event_time: java.sql.Timestamp)
case class AttrBuf(tsu: Long, event_id: Long, is_click: Boolean)

/** Attribution keyed state: capped buffer + the monotone TTL anchor
  * (the [[ScdState]] shape).
  */
case class AttrState(buf: Seq[AttrBuf], newestMs: Long)

/** One attributed conversion; click fields None when the user had no
  * at-or-before touchpoint.
  */
case class AttrOut(event_id: Long, user_id: Long, tsu: Long,
                   click_id: Option[Long], click_tsu: Option[Long],
                   gap_us: Option[Long])

/** One buffered event for the sequence-pattern sweep. */
case class SeqEvent(user_id: Long, tsu: Long, event_id: Long,
                    etype: String, event_time: java.sql.Timestamp)
case class SeqBuf(tsu: Long, event_id: Long, etype: String)

/** Sequence-pattern keyed state: capped buffer + monotone TTL anchor. */
case class SeqState(buf: Seq[SeqBuf], newestMs: Long)

/** One matched click→purchase pattern instance (w07's row shape). */
case class SeqOut(purchase_id: Long, user_id: Long, click_id: Long,
                  click_tsu: Long, purchase_tsu: Long, gap_us: Long)

/** One consecutive (from, to) transition from a user's flushed
  * event history (a35's pair shape).
  */
case class TransOut(user_id: Long, from_type: String, to_type: String)

/** One session's first-three-steps path signature (a40's row shape). */
case class PathOut(user_id: Long, path: String)

/** One user's deepest strictly-after funnel step (a44's semantics). */
case class FunnelOut(user_id: Long, step_reached: Long)

/** One buffered touchpoint/conversion in multi-touch state; `cents`
  * is the conversion value (0 for clicks).
  */
case class MtEvent(user_id: Long, tsu: Long, event_id: Long,
                   is_click: Boolean, cents: Long,
                   event_time: java.sql.Timestamp)
case class MtBuf(tsu: Long, event_id: Long, is_click: Boolean, cents: Long)

/** Multi-touch keyed state: capped buffer + monotone TTL anchor. */
case class MtState(buf: Seq[MtBuf], newestMs: Long)

/** One (purchase, click) credit share of a multi-touch split. */
case class MtOut(purchase_id: Long, user_id: Long, click_id: Long,
                 click_rank: Long, n_clicks: Long, credit_cents: Long)

/** One emitted SCD2 version; `vf`/`vt` are micros, `vt` = -1 for the
  * open (current) version.
  */
case class ScdVersion(user_id: Long, event_type: String, version_n: Long,
                      vf: Long, vt: Long)

/** Source-agnostic Structured Streaming pipelines — each takes
  * streaming DataFrame(s) and returns the transformed streaming
  * DataFrame, so the same operator runs over the [[Replay]] file source
  * (verification), a `MemoryStream` (unit tests, out-of-order replay),
  * or Kafka (production, [[graft.sources.Sources]]).
  *
  * These are the Spark-native re-expressions of the reference's
  * DStream pipelines (SURVEY.md §2 S/W/A/J streaming rows): watermarks
  * replace manual Redis state TTLs, `dropDuplicates` replaces the
  * Redis-sadd DAU dedup, `flatMapGroupsWithState` replaces the
  * Phoenix-lookup first-order flag, and stream-stream joins with event
  * time bounds replace the hand-rolled dual-DStream join + cache.
  *
  * Scale notes: every stateful operator keys its state by the shuffle
  * key (user / order key), so state is partition-local and scales
  * horizontally; watermarks bound state size. Nothing collects to the
  * driver.
  */
object Pipelines {

  /** Replay value for the order-wide join's event-time range: the
    * testdata generates l_shipdate and o_orderdate independently inside
    * a ~7-year span, so ±10 years covers every real pair, and the batch
    * oracles repeat the bound verbatim so both engines compute
    * identical semantics. A testdata artifact — production uses
    * [[DefaultJoinRange]].
    */
  val JoinRangeDays = 3650

  /** Replay range as an interval literal (see [[JoinRangeDays]]). */
  val ReplayJoinRange: String = s"$JoinRangeDays days"

  /** Production default for the order-wide join's event-time range —
    * the analog of the reference's ~100 s Redis TTL on the awaiting
    * side (dws/OrderWiderApp.scala:139). The range bounds BOTH sides'
    * keyed state: a row is evicted once the watermark passes its event
    * time + range, so state size is O(rows per range window), not
    * O(stream length). `StreamingSpec` proves a partner arriving after
    * eviction no longer matches.
    */
  val DefaultJoinRange = "100 seconds"

  /** W1/A3 — streaming DAU (ref app/Dau.scala:104-123: Redis-sadd
    * first-visit dedup, then per-day counts): watermark → watermarked
    * dedup on (dt, user) → 1-day tumbling window count. Two chained
    * stateful operators (dedup feeding a windowed aggregation — Spark
    * 3.4+ watermark propagation); in append mode a day's row emits once
    * the watermark passes the day's end, exactly once per day.
    *
    * State is BOUNDED: `dropDuplicatesWithinWatermark` evicts a
    * (day, user) entry once the watermark passes its event time + the
    * 25-hour delay, so months of uptime hold ~one day of users, not
    * every user ever seen. The 25-hour delay makes the dedup exact
    * per-day: same-day duplicates are at most 24 h apart, so when a
    * duplicate arrives either the first sighting's state is still live
    * (deduped) or the watermark has passed the duplicate itself
    * (late-dropped) — never double-counted. `StreamingSpec` proves
    * eviction and the exactness boundary.
    */
  def dau(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "25 hours")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .dropDuplicatesWithinWatermark("dt", "user_id")
      .groupBy(window(col("ts"), "1 day"), col("dt"))
      .agg(count(lit(1)).as("dau"))
      .select(col("dt"), col("dau"))

  /** W1 — sliding-window activity counts (ref app/RealTimeApp windowed
    * DStream counts): 6-hour windows sliding every 3 hours, per event
    * type. Append mode: each (window, type) row emits exactly once,
    * when the watermark passes the window end.
    */
  def slidingActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"))

  /** J4 streaming — dual-stream inner equi-join within event-time
    * bounds (ref dws/OrderWiderApp.scala:119-128: join of two
    * per-batch RDDs, which silently drops cross-batch matches; the
    * watermarked stream-stream join holds both sides in keyed state so
    * matches land regardless of arrival batch). State is evicted once
    * the watermark passes the range bound.
    */
  def orderWideInner(orders: DataFrame, lineitem: DataFrame,
                     range: String = DefaultJoinRange): DataFrame =
    joinOrderWide(orders, lineitem, "inner", range)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("order_detail_id"),
        col("l_extendedprice").as("sku_total"),
        col("o_totalprice").as("final_total_amount"),
        col("o_custkey").as("user_id"))

  /** J3/J6 streaming — dual-stream LEFT SEMI join: orders emit once
    * their first in-range line arrives, carrying ONLY order columns
    * (the existence-check shape of the reference's "has this order
    * any detail yet" probes, without materializing the wide row).
    * Semi is the one stream-stream join type with ASYMMETRIC state
    * semantics: the right side buffers for the range window like an
    * inner join, but a matched LEFT row is emitted once and dropped —
    * it never waits for more partners — so left-side state is
    * strictly smaller than the inner join's (left anti is the type
    * Spark does NOT support on two streams; the anti shapes ride
    * stream-static j03/st16 instead).
    */
  def orderSemi(orders: DataFrame, lineitem: DataFrame,
                range: String = DefaultJoinRange): DataFrame =
    joinOrderWide(orders, lineitem, "left_semi", range)
      .select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("user_id"),
        col("o_orderstatus").as("order_status"))

  /** J6 streaming — dual-stream LEFT OUTER join + completion defaults
    * (ref dws/OrderWiderApp.scala:63-115: unmatched rows parked in a
    * Redis cache awaiting the partner; Spark emits the null-completed
    * row itself once the watermark proves the partner can no longer
    * arrive).
    */
  def orderWideOuter(orders: DataFrame, lineitem: DataFrame,
                     range: String = DefaultJoinRange): DataFrame =
    joinOrderWide(orders, lineitem, "left_outer", range)
      .select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("user_id"),
        col("o_totalprice").as("final_total_amount"),
        col("l_linenumber").as("order_detail_id"),
        coalesce(col("l_extendedprice"), lit(0.0)).as("sku_total"),
        when(col("l_orderkey").isNull, "order_only").otherwise("matched").as("join_state"))

  /** J6 streaming, FULL OUTER variant (ref dws/OrderWiderApp.scala:76:
    * the commented-out `fullOuterJoin` path): both sides' unmatched
    * rows emit with completion defaults once the watermark proves the
    * partner can no longer arrive — orders with no lines as
    * `order_only`, lines whose order never arrived as `line_only`.
    */
  def orderWideFull(orders: DataFrame, lineitem: DataFrame,
                    range: String = DefaultJoinRange): DataFrame =
    joinOrderWide(orders, lineitem, "full_outer", range)
      .select(
        coalesce(col("o_orderkey"), col("l_orderkey")).as("order_id"),
        col("o_custkey").as("user_id"),
        coalesce(col("o_totalprice"), lit(0.0)).as("final_total_amount"),
        col("l_linenumber").as("order_detail_id"),
        coalesce(col("l_extendedprice"), lit(0.0)).as("sku_total"),
        when(col("l_orderkey").isNull, "order_only")
          .when(col("o_orderkey").isNull, "line_only")
          .otherwise("matched").as("join_state"))

  private def joinOrderWide(orders: DataFrame, lineitem: DataFrame,
                            joinType: String, range: String): DataFrame = {
    val o = orders.withWatermark("o_orderdate", "1 hour")
    val l = lineitem.withWatermark("l_shipdate", "1 hour")
    o.join(l,
      o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") >= o("o_orderdate") - expr(s"INTERVAL $range") &&
        l("l_shipdate") <= o("o_orderdate") + expr(s"INTERVAL $range"),
      joinType)
  }

  /** Hot-tier TTL for [[firstOrderFlag]] keyed state: a customer seen
    * within this window is answered from executor-local state; older
    * keys are evicted (state does NOT grow with lifetime customer
    * cardinality) and must be answered by the compacted state table
    * ([[firstOrderFlagBatch]] — the cold tier).
    */
  val FirstOrderTtlMs: Long = 30L * 24 * 3600 * 1000

  /** J7/W2 streaming — stateful first-order flag, HOT TIER
    * (ref dwd/Ods_to_DWD_order_info.scala:83-127: per batch, look the
    * user up in Phoenix, sort the batch's orders by create_time, flag
    * the earliest if the user is new, then write the user back).
    * `flatMapGroupsWithState` is the Spark-native form: state is one
    * boolean per user, partition-local, no external store, no
    * cross-batch race. Within a batch the group's rows sort by
    * (o_orderdate, o_orderkey) — the reference's in-batch sort with a
    * deterministic tiebreak.
    *
    * State is BOUNDED (SURVEY §7.4 item 2): each key carries an
    * event-time timeout at its newest order + `ttlMs` and is evicted
    * once the watermark passes it, so state holds ~one TTL window of
    * active customers, not every customer ever seen. The contract at
    * 100 TB is two-tier: this operator answers recent customers from
    * local state, and the caller pairs it with the compacted
    * known-customers table + per-batch anti-join
    * ([[firstOrderFlagBatch]], the st03 wiring) so a customer
    * returning after eviction is still flagged correctly. Requires a
    * watermark on `o_orderdate` (EventTimeTimeout).
    */
  def firstOrderFlag(orders: Dataset[OrderEvent],
                     ttlMs: Long = FirstOrderTtlMs): Dataset[OrderFlag] = {
    import orders.sparkSession.implicits._
    orders
      .groupByKey(_.o_custkey)
      .flatMapGroupsWithState[Boolean, OrderFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[OrderEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.o_orderdate.getTime, r.o_orderkey))
            val seen = state.getOption.getOrElse(false)
            val out = sorted.zipWithIndex.map { case (r, i) =>
              OrderFlag(r.o_orderkey, r.o_custkey,
                if (!seen && i == 0) "1" else "0")
            }
            if (sorted.nonEmpty) {
              state.update(true)
              val newest = sorted.map(_.o_orderdate.getTime).max
              state.setTimeoutTimestamp(
                math.max(newest + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** J7 COLD TIER — the SURVEY §7.4.2 compacted-state-table design:
    * flag one micro-batch of orders against the known-customers table
    * as of the PREVIOUS batch. Within the batch the earliest order per
    * customer (deterministic (o_orderdate, o_orderkey) order) takes
    * the flag, unless the customer is already in the table. The left
    * join is a plain shuffle join on the customer key (the table grows
    * with customer cardinality — never broadcast), co-partitioned with
    * the in-batch window on the same key; memory per executor is
    * O(batch partition), not O(customers), which is what makes this
    * the 100 TB shape: state lives compacted ON STORAGE and is joined
    * per batch, the reference's Phoenix-lookup pattern without the
    * row-at-a-time round trips.
    */
  def firstOrderFlagBatch(batch: DataFrame,
                          knownCustomers: Option[DataFrame]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val ranked = batch.withColumn("__rn", row_number().over(w))
    val withKnown = knownCustomers match {
      case None => ranked.withColumn("__known", lit(false))
      case Some(k) =>
        ranked.join(
          k.select(col("o_custkey")).withColumn("__known", lit(true)),
          Seq("o_custkey"), "left")
    }
    withKnown.select(
      col("o_orderkey"), col("o_custkey"),
      when(col("__rn") === 1 && !coalesce(col("__known"), lit(false)), "1")
        .otherwise("0").as("if_first_order"))
  }

  /** How long an order's lines are awaited after its newest event time
    * before the allocation is finalized (the reference's ~100 s Redis
    * TTL, dws/OrderWiderApp.scala:139,189-191).
    */
  val AllocTimeoutMs: Long = 100 * 1000L

  /** W3 streaming — payment allocation with per-order buffered state
    * (SURVEY §7.4 item 1, ref dws/OrderWiderApp.scala:157-199). The
    * reference allocates per arriving line against racy Redis
    * accumulators; the deterministic re-design buffers an order's
    * lines in keyed state and allocates the whole order at once when
    * its event-time timeout fires — i.e. when the watermark proves no
    * further lines can arrive (TTL semantics, minus the race). Line
    * order inside an order is defined by (line_id, line_cents) — the
    * same deterministic sort as the batch twin — so the emitted
    * multiset equals w03's exactly, whatever the arrival batching.
    *
    * Scale shape: state is one buffered line list per in-flight order,
    * keyed by the shuffle key and evicted on timeout; the allocation
    * math is O(lines log lines) at flush. No cross-order state, no
    * driver involvement.
    *
    * Contract: `lines` must already carry a watermark on `event_time`
    * (EventTimeTimeout requires one; callers apply it where the
    * sentinel/late-data policy is decided).
    */
  def paymentAllocation(lines: Dataset[AllocLine]): Dataset[AllocOut] = {
    import lines.sparkSession.implicits._
    lines
      .groupByKey(_.order_id)
      .flatMapGroupsWithState[Seq[AllocLine], AllocOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[AllocLine], state: GroupState[Seq[AllocLine]]) =>
          if (state.hasTimedOut) {
            val out = allocate(state.get)
            state.remove()
            out.iterator
          } else {
            val buf = state.getOption.getOrElse(Seq.empty) ++ rows
            state.update(buf)
            // await further lines until TTL past the newest line seen;
            // clamped above the watermark (setTimeoutTimestamp rejects
            // timestamps the watermark has already passed)
            val newest = buf.map(_.event_time.getTime).max
            state.setTimeoutTimestamp(
              math.max(newest + AllocTimeoutMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** How long a user's funnel state is held open past their newest
    * event before the final stage is emitted (same TTL rationale as
    * [[AllocTimeoutMs]]).
    */
  val FunnelTimeoutMs: Long = 100 * 1000L

  /** a09's ORDERED FUNNEL as keyed streaming state — the realtime
    * conversion dashboard the reference's domain implies. Per user,
    * the state machine folds events in (ts, event_id) order: the first
    * signup anchors stage 1; the first click STRICTLY after it, stage
    * 2; the first purchase strictly after that, stage 3. The user's
    * final depth is emitted when the event-time timeout fires — when
    * the watermark proves no further events can arrive.
    *
    * State is three longs per in-flight user, TTL-evicted. Within one
    * delivery the fold equals a09's min-timestamp semantics exactly
    * (the first signup in time order IS the min; the first qualifying
    * click after it IS the min qualifying click). Across batches the
    * machine is MONOTONE: a late-arriving earlier signup cannot
    * retroactively re-qualify a click that was rejected in an earlier
    * batch — the documented at-ingest approximation (st15's delivery
    * contract; the replay delivers one batch, under which the result
    * is exact, and a09 is the exact retrospective answer). Events
    * arriving after a user's timeout fired re-create state and emit a
    * SECOND depth row for that user — the per-user-uniqueness of the
    * output, like retention's and scd2's invariants, is scoped to the
    * single-replay-batch contract.
    */
  def funnel(events: Dataset[FunnelEvent]): Dataset[FunnelUser] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUser](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            val stage = if (s.t3 >= 0) 3L else if (s.t2 >= 0) 2L else if (s.t1 >= 0) 1L else 0L
            state.remove()
            if (stage > 0) Iterator.single(FunnelUser(uid, stage)) else Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val sorted = rows.toSeq.sortBy(r => (r.tsu, r.event_id))
            sorted.foreach { e =>
              e.event_type match {
                case "signup" if s.t1 < 0 => s = s.copy(t1 = e.tsu)
                case "click" if s.t1 >= 0 && s.t2 < 0 && e.tsu > s.t1 =>
                  s = s.copy(t2 = e.tsu)
                case "purchase" if s.t2 >= 0 && s.t3 < 0 && e.tsu > s.t2 =>
                  s = s.copy(t3 = e.tsu)
                case _ =>
              }
            }
            state.update(s)
            val newest = sorted.map(_.tsu / 1000L).max
            state.setTimeoutTimestamp(
              math.max(newest + FunnelTimeoutMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Per-user day-set cap for [[retention]] — one year of daily
    * activity. A bot/service account active for years truncates at the
    * horizon instead of growing the buffered day set without bound;
    * the corpus maxes at 30 distinct days, so the cap never fires
    * outside the heavy-user fixture spec.
    */
  val MaxRetDays: Int = 366

  /** Per-user event-buffer cap for [[scd2]] — same rationale; corpus
    * maxes at 99 events per user.
    */
  val MaxScdEvents: Int = 1000

  /** a10's RETENTION COHORTING as keyed streaming state: per user,
    * buffer the set of DISTINCT ACTIVE DAYS (date-granular — capped at
    * `maxDays` = [[MaxRetDays]]) and emit every (cohort day, active
    * day) pair once when the event-time timeout proves the user's
    * activity closed. Buffering until timeout makes the cohort
    * assignment exact over everything delivered: the min day IS the
    * cohort even if the user's earliest event arrives last (contrast
    * [[funnel]]'s monotone fold, which must order-fold because its
    * stages chain). Late-beyond-watermark events are dropped by the
    * upstream watermark — the standard tradeoff.
    *
    * OVERFLOW POLICY (the bounded-state contract, spec-proven on a
    * 10k-event user): beyond `maxDays` distinct days the SMALLEST days
    * are kept — deterministic under complete delivery regardless of
    * arrival order, the cohort (min day) is always retained, and the
    * dropped tail is exactly what a dashboard with a bounded window
    * never renders. The TTL anchors on the newest EVENT-TIME millis
    * (carried in [[RetState]]), not the day number.
    *
    * Post-timeout re-delivery: if a user's events arrive AFTER their
    * timeout flushed (only possible under multi-batch delivery with a
    * watermark that outran them), state is re-created and a second
    * (cohort, day) set emits — so the downstream "plain COUNT equals
    * a10's COUNT DISTINCT" identity is scoped to the single-replay-
    * batch delivery contract (st15's), as is scd2's one-is_current-row
    * invariant.
    */
  def retention(events: Dataset[RetEvent],
                ttlMs: Long = FunnelTimeoutMs,
                maxDays: Int = MaxRetDays): Dataset[RetHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) =>
          if (state.hasTimedOut) {
            val days = state.get.days
            val cohort = days.min
            state.remove()
            days.sorted.iterator.map(d => RetHit(uid, cohort, d))
          } else {
            val evs = rows.toSeq
            val prev = state.getOption.getOrElse(RetState(Seq.empty, Long.MinValue))
            val days = (prev.days ++ evs.map(_.day)).distinct.sorted.take(maxDays)
            val newestMs = math.max(prev.newestMs, evs.map(_.event_time.getTime).max)
            state.update(RetState(days, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** j11's SCD TYPE-2 HISTORY as keyed streaming state — the CDC-fed
    * warehouse-history build that is the reference's core domain
    * (every maxwell op-type row updates a dim; SCD2 keeps the history
    * instead of overwriting). Per user, events buffer until the
    * event-time timeout proves the history closed, then consecutive
    * same-type runs collapse into versions with chained validity
    * intervals — identical to the batch window-pass semantics, because
    * the collapse runs over the COMPLETE delivered history (st21's
    * buffer-until-flush exactness argument; a per-batch eager collapse
    * could not merge a run that straddles batches). State is the
    * user's event list, CAPPED at `maxEvents` = [[MaxScdEvents]]; the
    * emitted rows are one per VERSION, not per event.
    *
    * OVERFLOW POLICY (spec-proven on a 10k-event user): beyond
    * `maxEvents` the buffer keeps the FIRST `maxEvents` events by
    * (tsu, event_id) — the history's deterministic prefix; versions
    * collapse over that prefix and the final kept version stays open
    * (valid_to = −1). Deterministic under complete delivery regardless
    * of arrival order or batch split. The TTL anchors on the newest
    * event EVER seen (carried monotonically in [[ScdState]], dropped
    * or kept — the [[RetState]] pattern), so truncation never
    * pre-fires the flush while the user is still active, even when a
    * later batch delivers only older events. Post-timeout
    * re-delivery re-creates state (version_n restarts) — the
    * one-is_current-per-user claim is scoped to the single-replay-
    * batch delivery contract (see [[retention]]).
    */
  def scd2(events: Dataset[ScdEvent],
           ttlMs: Long = FunnelTimeoutMs,
           maxEvents: Int = MaxScdEvents): Dataset[ScdVersion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdVersion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[ScdEvent], state: GroupState[ScdState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf.sortBy(b => (b.tsu, b.event_id))
            state.remove()
            val changes = hist.zipWithIndex.filter { case (b, i) =>
              i == 0 || hist(i - 1).event_type != b.event_type
            }.map(_._1)
            changes.zipWithIndex.iterator.map { case (b, i) =>
              val vt = if (i + 1 < changes.size) changes(i + 1).tsu else -1L
              ScdVersion(uid, b.event_type, i + 1L, b.tsu, vt)
            }
          } else {
            val prev = state.getOption.getOrElse(ScdState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => ScdBuf(e.tsu, e.event_id, e.event_type))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(ScdState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** j12's AS-OF ATTRIBUTION as keyed streaming state — realtime
    * last-touch attribution: per user, touchpoints and conversions
    * buffer until the event-time timeout proves the history closed,
    * then one sorted sweep assigns each purchase the latest
    * at-or-before click — identical to the batch window-pass
    * semantics because the sweep runs over the COMPLETE delivered
    * history (st21/scd2's buffer-until-flush exactness argument: an
    * eager per-batch assignment could not attribute a purchase to a
    * click that arrives later but timestamps earlier). Clicks sort
    * before purchases at equal timestamps (at-or-before) with
    * event_id tie-breaks — j12's total order exactly.
    *
    * State is the user's event list, CAPPED at `maxEvents` with
    * scd2's deterministic first-N-by-(tsu, event_id) prefix and the
    * [[AttrState]] monotone TTL anchor (truncation never pre-fires
    * the flush). Emitted rows are one per CONVERSION, not per event.
    */
  def attribution(events: Dataset[AttrEvent],
                  ttlMs: Long = FunnelTimeoutMs,
                  maxEvents: Int = MaxScdEvents): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf.sortBy(b => (b.tsu, !b.is_click, b.event_id))
            state.remove()
            var lastClick: Option[AttrBuf] = None
            val out = Vector.newBuilder[AttrOut]
            hist.foreach { b =>
              if (b.is_click) lastClick = Some(b)
              else out += AttrOut(b.event_id, uid, b.tsu,
                lastClick.map(_.event_id), lastClick.map(_.tsu),
                lastClick.map(c => b.tsu - c.tsu))
            }
            out.result().iterator
          } else {
            val prev = state.getOption.getOrElse(AttrState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => AttrBuf(e.tsu, e.event_id, e.is_click))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(AttrState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** j14's multi-touch split, streamed: per-user buffered state (the
    * [[attribution]] machinery — capped prefix, monotone TTL anchor,
    * event-time timeout), and at flush ONE sorted sweep over the
    * complete delivered history assigns every purchase its equal-split
    * credit across the clicks in the strictly-prior `lookbackUs`
    * window — so a late-arriving earlier click joins the split it
    * belongs to, which no eager per-batch join can do. Credit
    * arithmetic is j14's verbatim (floor split, remainder cents to the
    * earliest ranks — conservation exact). The per-purchase scan is
    * O(buf) with the buffer hard-capped at `maxEvents`.
    */
  def multiTouch(events: Dataset[MtEvent],
                 lookbackUs: Long = 7L * 86400L * 1000000L,
                 ttlMs: Long = FunnelTimeoutMs,
                 maxEvents: Int = MaxScdEvents): Dataset[MtOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MtState, MtOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[MtEvent], state: GroupState[MtState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf.sortBy(b => (b.tsu, b.event_id))
            state.remove()
            val out = Vector.newBuilder[MtOut]
            hist.withFilter(!_.is_click).foreach { p =>
              val cs = hist.filter(c => c.is_click &&
                c.tsu >= p.tsu - lookbackUs && c.tsu < p.tsu)
              val n = cs.size.toLong
              if (n > 0) {
                val base = p.cents / n
                val rem = p.cents % n
                cs.zipWithIndex.foreach { case (c, i) =>
                  out += MtOut(p.event_id, uid, c.event_id, i + 1L, n,
                    base + (if (i + 1L <= rem) 1L else 0L))
                }
              }
            }
            out.result().iterator
          } else {
            val prev = state.getOption.getOrElse(MtState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => MtBuf(e.tsu, e.event_id, e.is_click, e.cents))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(MtState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** w07's sequence-pattern sweep, streamed: per-user buffered state
    * (the [[attribution]] machinery — capped prefix, monotone TTL
    * anchor, event-time timeout), and at flush ONE sorted sweep under
    * the total (tsu, tag, event_id) order — clicks before errors
    * before purchases at an instant, w07's tie rule — carrying the
    * running error count and the last click with the count AT it; a
    * purchase emits iff its click is within `windowUs` and the count
    * hasn't moved. Flush-time evaluation over the complete delivered
    * history is what makes negation SAFE under disorder: an eager
    * per-batch match would emit a pattern instance that a
    * late-arriving in-between error retroactively kills — an
    * unretractable wrong answer in append mode; buffering until the
    * watermark closes the user's hour makes the NOT-EXISTS decidable.
    */
  def sequenceMatch(events: Dataset[SeqEvent],
                    windowUs: Long = 3600000000L,
                    ttlMs: Long = FunnelTimeoutMs,
                    maxEvents: Int = MaxScdEvents): Dataset[SeqOut] = {
    import events.sparkSession.implicits._
    def tag(t: String): Int = t match {
      case "click" => 0; case "error" => 1; case _ => 2
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, SeqOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf.sortBy(b => (b.tsu, tag(b.etype), b.event_id))
            state.remove()
            var errCnt = 0L
            var click: Option[(SeqBuf, Long)] = None // (row, errCnt at click)
            val out = Vector.newBuilder[SeqOut]
            hist.foreach { b =>
              b.etype match {
                case "click" => click = Some((b, errCnt))
                case "error" => errCnt += 1
                case _ =>
                  click.foreach { case (c, ce) =>
                    if (b.tsu - c.tsu <= windowUs && ce == errCnt)
                      out += SeqOut(b.event_id, uid, c.event_id, c.tsu,
                        b.tsu, b.tsu - c.tsu)
                  }
              }
            }
            out.result().iterator
          } else {
            val prev = state.getOption.getOrElse(SeqState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => SeqBuf(e.tsu, e.event_id, e.etype))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(SeqState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** a35's per-user ordered sweep AT FLUSH TIME (the sequenceMatch
    * state discipline verbatim — capped buffer, monotone TTL anchor):
    * when the watermark closes a user, the (tsu, event_id)-sorted
    * history emits its consecutive (from, to) transition pairs.
    * Flush-time is what makes ORDER safe under disorder: a pair
    * emitted eagerly between two arrivals cannot be retracted when a
    * late event lands between them, and append mode never takes
    * answers back (the st59 negation reasoning, applied to
    * adjacency). The matrix rollup runs ON READ over the emitted
    * pairs. State: one capped buffer per user — rate-bounded.
    */
  def transitionPairs(events: Dataset[SeqEvent],
                      ttlMs: Long = FunnelTimeoutMs,
                      maxEvents: Int = MaxScdEvents): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, TransOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf.sortBy(b => (b.tsu, b.event_id))
            state.remove()
            hist.iterator.zip(hist.iterator.drop(1)).map { case (a, b) =>
              TransOut(uid, a.etype, b.etype)
            }
          } else {
            val prev = state.getOption.getOrElse(SeqState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => SeqBuf(e.tsu, e.event_id, e.etype))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(SeqState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** a44's ORDERED-FUNNEL sweep AT FLUSH TIME (the transitionPairs
    * state discipline verbatim — capped buffer, monotone TTL anchor):
    * when the watermark closes a user, the complete delivered history
    * resolves the chained strictly-after minima — earliest view, then
    * earliest click strictly after it, then earliest purchase strictly
    * after that — and emits the deepest step reached (users with no
    * view emit nothing; they are not in the funnel). Flush-time
    * evaluation is what makes the ORDERING constraint safe under
    * disorder: an eagerly-advanced funnel cannot retract when a
    * late-arriving EARLIER view shifts the chain's anchor backwards
    * (strictly-after against an earlier anchor can only admit MORE
    * clicks — the eager answer is not monotone, the flushed one is
    * simply correct). The 3-row conversion rollup runs ON READ.
    */
  def funnelReach(events: Dataset[SeqEvent],
                  ttlMs: Long = FunnelTimeoutMs,
                  maxEvents: Int = MaxScdEvents): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf
            state.remove()
            val v = hist.collect { case b if b.etype == "view" => b.tsu }
              .minOption
            val c = v.flatMap(vt => hist.collect {
              case b if b.etype == "click" && b.tsu > vt => b.tsu
            }.minOption)
            val p = c.flatMap(ct => hist.collect {
              case b if b.etype == "purchase" && b.tsu > ct => b.tsu
            }.minOption)
            val step =
              if (p.isDefined) 3L else if (c.isDefined) 2L
              else if (v.isDefined) 1L else 0L
            if (step == 0L) Iterator.empty
            else Iterator.single(FunnelOut(uid, step))
          } else {
            val prev = state.getOption.getOrElse(SeqState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => SeqBuf(e.tsu, e.event_id, e.etype))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(SeqState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** a40's session-path extraction AT FLUSH TIME: the flushed
    * (tsu, event_id)-sorted history splits into sessions on the same
    * ≥30-minute gap rule as the batch sid construction (a gap at a
    * timestamp tie is 0, so tie order can't move a boundary — the
    * a16/a29 invariance carried into the sweep), and each session
    * emits its first-three-steps signature. Same flush-time
    * reasoning as transitionPairs: order and session MEMBERSHIP are
    * both retraction-unsafe under eager emission. Rollup on read.
    */
  def sessionPaths(events: Dataset[SeqEvent],
                   gapUs: Long = 30L * 60L * 1000000L,
                   ttlMs: Long = FunnelTimeoutMs,
                   maxEvents: Int = MaxScdEvents): Dataset[PathOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, PathOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val hist = state.get.buf.sortBy(b => (b.tsu, b.event_id))
            state.remove()
            val out = Vector.newBuilder[PathOut]
            var steps = Vector.empty[String]
            var prevTsu = Long.MinValue
            def close(): Unit = if (steps.nonEmpty) {
              val s = steps.padTo(3, "-").take(3)
              out += PathOut(uid, s"${s(0)}>${s(1)}>${s(2)}")
            }
            hist.foreach { b =>
              if (prevTsu != Long.MinValue && b.tsu - prevTsu >= gapUs) {
                close(); steps = Vector.empty
              }
              if (steps.size < 3) steps :+= b.etype
              prevTsu = b.tsu
            }
            close()
            out.result().iterator
          } else {
            val prev = state.getOption.getOrElse(SeqState(Seq.empty, Long.MinValue))
            val buf0 = prev.buf ++
              rows.map(e => SeqBuf(e.tsu, e.event_id, e.etype))
            val buf = if (buf0.size > maxEvents)
              buf0.sortBy(b => (b.tsu, b.event_id)).take(maxEvents)
            else buf0
            val newestMs =
              math.max(prev.newestMs, buf0.map(_.tsu / 1000L).max)
            state.update(SeqState(buf, newestMs))
            state.setTimeoutTimestamp(
              math.max(newestMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** The w03 allocation over one complete order: proportional floor
    * split, last line takes the exact remainder (all integer-cents
    * arithmetic — exact in doubles).
    */
  private def allocate(buf: Seq[AllocLine]): Seq[AllocOut] = {
    val sorted = buf.sortBy(l => (l.line_id, l.line_cents))
    val sumLine = sorted.map(_.line_cents).sum
    val total = sorted.head.total_cents
    val props = sorted.map(l => math.floor(total * l.line_cents / sumLine))
    val lastAlloc = total - (props.sum - props.last)
    sorted.zipWithIndex.map { case (l, i) =>
      val alloc = if (i == sorted.size - 1) lastAlloc else props(i)
      AllocOut(l.order_id, l.line_id, l.line_cents / 100, alloc / 100)
    }
  }

  /** Session windows over user activity — the SURVEY §2.9 north-star
    * the reference has no analog for (its windows are fixed-size). A
    * session = consecutive events of one user with gaps < 30 minutes;
    * `session_window` merges/extends state per key and emits the
    * session once the watermark passes its close. Output bounds are
    * formatted strings (engine-portable types).
    */
  def sessionActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("user_id"), col("n_events"))

  /** a56/st118 — session windows with a DYNAMIC (per-event) gap: a
    * purchase closes its session after 10 idle minutes, anything else
    * after 30 — the engagement-dependent session rule `session_window`'s
    * gap-EXPRESSION overload exists for (a fixed gap treats a
    * checkout ping and an idle browse identically). Sessions are
    * half-open [start, end): an event landing exactly at a session's
    * end opens a new one; a session's end is the MAX over member
    * events of (ts + that event's gap). Shared by the batch query and
    * the streamed twin — identical aggregation, the watermark is a
    * no-op in batch.
    */
  def dynamicSessionActivity(events: DataFrame): DataFrame = {
    // gap strings, not INTERVAL literals: session_window requires
    // CalendarIntervalType and DayTimeInterval is rejected
    val gap = when(col("event_type") === "purchase",
      lit("10 minutes")).otherwise(lit("30 minutes"))
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("user_id"), col("n_events"))
  }

  /** Default dedup window for [[simhashBandClaims]]: how long a band
    * bucket's owner is remembered (the ingest-dedup analog of the
    * known-customers TTL).
    */
  val BandClaimTtlMs: Long = 7L * 24 * 3600 * 1000

  /** D-family streaming — SimHash near-dup claims at ingest (the
    * streaming twin of batch d03): state per (band, bkey) bucket is
    * its OWNER — the smallest doc id that has presented it within the
    * dedup window — plus the owner's fingerprint. A band row is `ok`
    * iff the document IS the owner, or its fingerprint is farther than
    * `maxHamming` from the owner's (a band collision alone is not a
    * near-dup: 8-bit buckets birthday-collide once documents outnumber
    * 256·6, so the verify against the owner's fp is what keeps the
    * false-drop rate flat at scale). A document is a KEEPER iff all 6
    * of its band claims are ok; the caller rolls the 6 rows up (st12).
    * Greedy by design — docs are compared to the bucket owner, not
    * pairwise (that exact sweep is batch d03); earlier docs win, later
    * near-dups are dropped, the ingest rule an LLM pipeline runs.
    *
    * Scale shape: state is two longs per distinct live bucket, keyed
    * by the shuffle key (band, bkey), partition-local, and evicted by
    * event-time timeout once the watermark passes the bucket's newest
    * presentation + `ttlMs` — bounded by the dedup window, not stream
    * length. Requires a watermark on `event_time`.
    */
  def simhashBandClaims(bands: Dataset[BandRow],
                        maxHamming: Int = 5,
                        ttlMs: Long = BandClaimTtlMs): Dataset[BandClaim] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[(Long, Long), BandClaim](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.doc_id)
            // bucket owner = min doc id across prior window + this batch
            val owner = state.getOption match {
              case Some(o) if o._1 < sorted.head.doc_id => o
              case _ => (sorted.head.doc_id, sorted.head.fp)
            }
            val out = sorted.map { r =>
              BandClaim(r.doc_id, r.band,
                r.doc_id == owner._1 ||
                  java.lang.Long.bitCount(r.fp ^ owner._2) > maxHamming)
            }
            state.update(owner)
            val newest = sorted.map(_.event_time.getTime).max
            state.setTimeoutTimestamp(
              math.max(newest + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** P2 streaming — CDC routing (ref ods/KafkaToODS_M.scala:45-74:
    * filter the allow-listed tables, route each row to its `ods_*`
    * topic). The projection is stateless; the fan-out itself happens in
    * the sink (`foreachBatch` in [[StreamQueries.st04_cdc_route]],
    * Kafka `topic` column in production).
    */
  def cdcRoute(events: DataFrame): DataFrame =
    events
      .where(col("event_type").isin("purchase", "signup", "click"))
      .withColumn("route", concat(lit("ods_"), col("event_type")))
      .select(col("event_id"), col("event_type"), col("route"), col("user_id"))
}
