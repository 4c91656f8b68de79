package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming operator surface as driver-checkable queries: each
  * `st_*` entry replays the static testdata through a real Structured
  * Streaming pipeline ([[Replay]] file source → [[Pipelines]] operator
  * → parquet/foreachBatch sink, `Trigger.AvailableNow`) and returns
  * the materialized result, which must hash-match the batch-semantics
  * DuckDB oracle. This is the determinism contract the round-1 verdict
  * asked for: the streaming form provably computes the same answer as
  * its batch twin.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  /** S4/W1/A3 — streaming DAU via watermarked dedup + daily window
    * (batch twin a03).
    */
  val st01_stream_dau: Q = (spark, dir) => {
    val out = Replay.runAppend(spark, Pipelines.dau(Replay.eventsStream(spark, dir)))
    out.where(col("dt") < "2090-01-01")
  }

  /** J4 streaming — watermarked dual-stream inner join (batch twin j04,
    * plus the event-time range bound both engines share).
    */
  val st02_stream_wide_join: Q = (spark, dir) => {
    val out = Replay.runAppend(spark,
      Pipelines.orderWideInner(
        Replay.ordersStream(spark, dir), Replay.lineitemStream(spark, dir),
        Pipelines.ReplayJoinRange),
      bigState = true)
    out.where(col("order_id") >= 0)
  }

  /** J7/W2 streaming — first-order flag via the SURVEY §7.4.2
    * compacted-state-table design (batch twin j07): each micro-batch
    * is flagged against the known-customers table as of the previous
    * batch ([[Pipelines.firstOrderFlagBatch]] — per-batch anti-lookup,
    * deterministic in-batch order), then the batch's customers are
    * upserted into the table (a [[graft.sinks.KeyedUpsertTable]]:
    * compacted, versioned, idempotent under replay — `readBefore`
    * keeps a replayed batch deterministic even if its own upsert
    * already committed). No keyed executor state at all, so memory is
    * bounded regardless of lifetime customer cardinality; the hot-tier
    * fMGWS variant ([[Pipelines.firstOrderFlag]], TTL-evicted) is the
    * low-latency alternative a deployment layers in front of this
    * table, exercised by `StreamingSpec`.
    */
  val st03_first_order_flag: Q = (spark, dir) => {
    val orders = Replay.ordersStream(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val known = new graft.sinks.KeyedUpsertTable(
      spark, graft.Tables.scratchDir("graft_known_"), Seq("o_custkey"), "o_custkey")
    val sink = new graft.sinks.IdempotentBatchAppend(
      spark, graft.Tables.scratchDir("graft_flags_"))
    Replay.runForeachBatch(spark, orders) { (batch, id) =>
      val b = batch.where(col("o_custkey") >= 0) // drop the sentinel row
      sink.append(Pipelines.firstOrderFlagBatch(b, known.readBefore(id)), id)
      known.upsert(b.select(col("o_custkey")).distinct(), id)
    }
    sink.read().select(col("o_orderkey"), col("o_custkey"), col("if_first_order"))
  }

  /** P2/K-layer streaming — CDC routing fan-out through `foreachBatch`:
    * each micro-batch is split by route and appended to the route's own
    * sink (the reference's per-table `ods_*` topic fan-out,
    * ods/KafkaToODS_M.scala:45-74). The batch is cached once so the
    * three filtered writes scan it once each from memory, not thrice
    * from the source.
    */
  val st04_cdc_route: Q = (spark, dir) => {
    val base = graft.Tables.scratchDir("graft_routes_")
    val routes = Seq("purchase", "signup", "click")
    val routed = Pipelines.cdcRoute(Replay.eventsStream(spark, dir))
    Replay.runForeachBatch(spark, routed) { (batch, _) =>
      batch.persist()
      routes.foreach { r =>
        batch.where(col("event_type") === r)
          .write.mode("append").parquet(s"$base/ods_$r")
      }
      batch.unpersist()
    }
    val dirs = routes.map(r => s"$base/ods_$r")
      .filter(d => Files.exists(java.nio.file.Paths.get(d)))
    spark.read.parquet(dirs: _*)
  }

  /** J6 streaming — watermarked dual-stream LEFT OUTER join with
    * completion defaults (batch twin j06's shape over the raw join).
    * The 257 unmatched orders emit as `order_only` rows once the
    * watermark proves no partner can arrive — the streaming analog of
    * the reference's Redis completion cache.
    */
  val st05_outer_wide_join: Q = (spark, dir) => {
    val out = Replay.runAppend(spark,
      Pipelines.orderWideOuter(
        Replay.ordersStream(spark, dir), Replay.lineitemStream(spark, dir),
        Pipelines.ReplayJoinRange),
      bigState = true)
    out.where(col("order_id") >= 0)
  }

  /** J6 streaming, FULL OUTER — both-side completion (ref
    * dws/OrderWiderApp.scala:76, the `fullOuterJoin` variant). The
    * order stream drops every 97th order so the line side genuinely
    * exercises `line_only` completion (TPC-H lineitems always have an
    * order, which would otherwise make that branch vacuous); the DuckDB
    * oracle is the batch FULL OUTER twin over the same filtered orders.
    * The sentinel pair joins itself (both keys −1) and is filtered on
    * read-back.
    */
  val st10_full_outer_join: Q = (spark, dir) => {
    val orders = Replay.ordersStream(spark, dir)
      .where(col("o_orderkey") % 97 =!= 0)
    val out = Replay.runAppend(spark,
      Pipelines.orderWideFull(
        orders, Replay.lineitemStream(spark, dir), Pipelines.ReplayJoinRange),
      bigState = true)
    out.where(col("order_id") >= 0)
  }

  /** W1 — sliding-window activity counts (6h window / 3h slide) in
    * append mode; every window emits exactly once. Window bounds are
    * emitted as formatted strings so both engines agree on type.
    */
  val st06_sliding_window: Q = (spark, dir) => {
    val out = Replay.runAppend(spark,
      Pipelines.slidingActivity(Replay.eventsStream(spark, dir))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
          col("event_type"), col("n_events")))
    out.where(col("window_start") < "2090-01-01")
  }

  /** A1/A5/K2/K5 streaming — post-aggregation transactional sink: a
    * stream-static dim join feeds an update-mode aggregation whose
    * per-batch deltas land in a [[graft.sinks.KeyedUpsertTable]]
    * through `foreachBatch` (the reference's collect→MySQL-transaction
    * sink, ads/TradeMarkAmountApp.scala:59-88, with the atomic commit
    * marker playing the result+offset transaction). The final table
    * state must equal the batch a01 aggregation exactly.
    */
  /** st07/st13's shared pipeline: run the stream-static enrich +
    * update-mode aggregation to completion through the keyed upsert
    * sink, returning the maintained table.
    */
  /** Run an update-mode aggregation to completion through a
    * [[graft.sinks.KeyedUpsertTable]] and return the maintained table —
    * the ads-serving sink shape shared by st07/st13/st23/st24/st26.
    * State is the aggregation's key cardinality (bounded by design in
    * every caller), so the default in-memory provider applies.
    */
  private def upsertServe(spark: SparkSession, base: DataFrame,
                          keyCols: Seq[String], orderCol: String): DataFrame = {
    val table = new graft.sinks.KeyedUpsertTable(
      spark, graft.Tables.scratchDir("graft_upsert_"), keyCols, orderCol)
    upsertServeWith(spark, base, table, graft.Tables.scratchDir("graft_cp_"))
  }

  /** One AvailableNow pass of the upsert-serving writer against an
    * EXPLICIT table + checkpoint — exposed so `StateCapSpec` can kill
    * and resume the exact production path (same trigger, provider,
    * and idempotent upsert) across two passes over one checkpoint.
    */
  private[graft] def upsertServeWith(spark: SparkSession, base: DataFrame,
                                     table: graft.sinks.KeyedUpsertTable,
                                     cp: String): DataFrame = {
    Replay.stateProvider(spark, bigState = false)
    val q = base.writeStream
      .outputMode("update")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => table.upsert(b, id))
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read()
  }

  private def runAggUpsert(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val li = Replay.lineitemStream(spark, dir) // sentinel joins nothing (l_partkey = -1)
    val p = Tables.part(spark, dir)
    val agg = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
    upsertServe(spark, agg, Seq("p_brand"), "n_lines") // 25 brands
  }

  val st07_agg_upsert: Q = (spark, dir) => runAggUpsert(spark, dir)

  /** A5/§2.7 streaming — the reference's ads-serving pattern end to
    * end (ads/TradeMarkAmountApp: stream → aggregated amounts table →
    * ranked consumer): the leaderboard is SERVED from the streaming-
    * maintained upsert table, not recomputed from raw data — reading
    * the top 10 costs a scan of 25 table rows however large the
    * stream history. Must equal the batch ranking (a05's oracle)
    * exactly.
    */
  val st13_leaderboard: Q = (spark, dir) =>
    runAggUpsert(spark, dir)
      .orderBy(col("revenue").desc, col("p_brand"))
      .limit(10)

  /** §2.9 north-star — session windows (30-minute inactivity gap) per
    * user. The DuckDB oracle is the classic gaps-and-islands
    * sessionization over microsecond-truncated timestamps (matching
    * Spark's nanos→micros narrowing): a new session starts when the
    * gap is ≥ the timeout, mirroring `session_window`'s half-open
    * [start, last+gap) merge rule.
    */
  val st08_session_window: Q = (spark, dir) => {
    val out = Replay.runAppend(spark,
      Pipelines.sessionActivity(Replay.eventsStream(spark, dir)))
    out.where(col("user_id") >= 0)
  }

  /** W3 streaming — per-order payment allocation with TTL state
    * (SURVEY §7.4 item 1): lineitem stream → stream-static order
    * lookup → [[Pipelines.paymentAllocation]] (buffer per order,
    * allocate on event-time timeout). Left join so the sentinel
    * survives to drive the watermark; its group is filtered after
    * read-back. Must equal batch w03 exactly.
    */
  val st09_stream_allocation: Q = (spark, dir) => {
    import spark.implicits._
    import graft.Tables
    val li = Replay.lineitemStream(spark, dir)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), Tables.cents(col("o_totalprice")).as("tc"))
    val lines = li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_id"),
        Tables.cents(col("l_extendedprice")).as("line_cents"),
        coalesce(col("tc"), lit(0.0)).as("total_cents"),
        col("l_shipdate").as("event_time"))
      .withWatermark("event_time", "1 hour")
      .as[AllocLine]
    Replay.runAppend(spark, Pipelines.paymentAllocation(lines).toDF(),
        bigState = true)
      .where(col("order_id") >= 0)
  }

  /** K3/D-family streaming — exact dedup at ingest: duplicate events
    * (the at-least-once delivery case) collapse to one row by event id
    * via `dropDuplicatesWithinWatermark`, whose state evicts once the
    * watermark passes the event's time + delay — the streaming twin of
    * d01's content-hash dedup, with bounded state. The replay unions
    * the event stream with a filtered copy of itself (every 100th
    * event), so the dedup provably removes real duplicates: the result
    * must equal the plain events relation.
    */
  val st11_stream_dedup: Q = (spark, dir) => {
    val e1 = Replay.eventsStream(spark, dir)
    val e2 = Replay.eventsStream(spark, dir).where(col("event_id") % 100 === 0)
    val deduped = e1.unionAll(e2)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
    Replay.runAppend(spark, deduped).where(col("event_id") >= 0)
  }

  /** Synthetic per-document event time for the st12 replay: documents
    * carry no timestamp, so ingest order is doc_id seconds after a
    * fixed base — originals first, the +1e6-id near-copies later, the
    * arrival shape an ingest dedup actually sees. Sentinel (doc_id<0)
    * maps far-future to drive the watermark.
    */
  private def docEventTime = when(col("doc_id") < 0,
      lit("2100-01-01 00:00:00").cast("timestamp"))
    .otherwise(timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L))

  /** D-family streaming — near-dup dedup AT INGEST (streaming twin of
    * d03): the document stream (originals ∪ head-truncated near-copies,
    * the d02-d04 corpus) is fingerprinted (codegen'd simhash48), band-
    * exploded (the shared d03 banding) and run through
    * [[Pipelines.simhashBandClaims]] — keyed (band, bkey) state holds
    * each bucket's owner (+ fingerprint) with a TTL dedup window. A
    * document survives iff no band puts it within hamming ≤ 5 of a
    * smaller-id bucket owner; the DuckDB oracle is the same greedy
    * rule in batch form (owner = MIN doc_id per bucket, keep docs that
    * own or hamming-clear every band). The 6-row-per-doc rollup
    * happens on the materialized claims (a batch groupBy after the
    * replay). Determinism contract: each replay source is ONE data
    * file, so all real documents arrive in a single AvailableNow
    * micro-batch and in-batch groups sort by doc id — the exact
    * single-delivery the batch oracle models (across batches the
    * greedy owner rule is arrival-order-dependent, as any ingest
    * dedup is). The cross-batch semantics themselves are load-tested,
    * not assumed: `StreamingSpec."st12 delivery contract"` replays a
    * corpus split across six files/batches and proves the documented
    * behavior (within-window later-batch near-dup drops; a near-dup of
    * a TTL-evicted owner survives).
    */
  val st12_stream_neardup: Q = (spark, dir) => {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val d1 = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id"), col("text"))
    val d2 = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") % 10 === 0 && col("doc_id") >= 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        graft.operators.Dedup.dropHead5(col("text")).as("text"))
    val corpus = d1.unionAll(d2)
      .withColumn("event_time", docEventTime)
      .withWatermark("event_time", "1 hour")
    val bands = graft.operators.Dedup.simhashBands(
        graft.operators.Dedup.simhashFp(corpus.where(col("doc_id") >= 0)))
      .select(col("doc_id"), col("band"), col("bkey"), col("fp"), col("event_time"))
      .as[BandRow]
    val claims = Replay.runAppend(spark,
      Pipelines.simhashBandClaims(bands, graft.operators.Dedup.MaxHamming).toDF())
    claims.groupBy(col("doc_id"))
      .agg(min(when(col("ok"), lit(1)).otherwise(lit(0))).as("allok"))
      .where(col("allok") === 1)
      .select(col("doc_id"))
  }

  /** N-family streaming — the INDEX BUILD AS INGEST: production
    * vector corpora are indexed as vectors arrive, not by re-scanning;
    * this is the streaming path that produces the artifacts the batch
    * searches (n06–n12) read. Each arriving vector is coarse-assigned
    * (argmax cosine against the broadcast TRAINED centroids) and
    * PQ-encoded (argmin squared-L2 per subspace against the broadcast
    * trained codebooks) — two stream-static broadcast joins whose
    * per-vector argmin/argmax collapse BATCH-LOCALLY inside each
    * micro-batch (r18; a vector's M·k join products derive in its own
    * batch, so no cross-batch state exists to keep — see the inline
    * note). Emits the long-form index rows (vec_id, m, code, cell_id);
    * the DuckDB oracle re-derives the same rows from the unrolled
    * training CTEs, so the streamed index must equal the batch-built
    * one bit-for-bit.
    *
    * Scale shape: both joins broadcast ONLY bounded index parameters
    * (k centroids, M·k codebook entries); streaming state is ZERO —
    * the per-vector aggregations are micro-batch-local hash
    * aggregations, and the append is idempotent by batch id (K3's
    * contract), so at-least-once redelivery re-derives identical rows.
    */
  val st14_stream_index: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val S = graft.operators.Similarity
    val books = S.idx(spark, dir, "books")
    val coarse = S.idx(spark, dir, "coarse")
    // r18 (guide §2.4; the st19 lesson on the N-family build leg): a
    // vector is ONE arriving event, so its M·k codebook distances and
    // k centroid scores all derive inside its own micro-batch — the
    // per-(vector[, m]) argmin/argmax never spans batches. The first
    // cut ran TWO separate replays (independent checkpoints) whose
    // windowed aggregations held one struct per open (window, vec[, m])
    // until the sentinel flushed, then batch-joined the two read-backs;
    // now ONE replay computes both legs batch-locally per micro-batch
    // (plain hash aggregations, zero streaming state at any scale) and
    // appends idempotently by batch id (the st84/st109 pattern).
    // Assign and encode still share nothing across batches; the
    // argmin/argmax structs and tiebreaks are verbatim, so the streamed
    // index equals the batch-built one bit-for-bit (the oracle is
    // unchanged). Sentinel pre-filtered — nothing is watermark-driven.
    val path = graft.Tables.scratchDir("graft_bkt_sidx_")
    val tbl = "graft_sidx_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "vec_id")
    def indexOf(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val vecs = b.select(col("vec_id"), col("embedding").as("v"))
      val enc = vecs.join(broadcast(books), lit(true), "inner")
        .select(col("vec_id"), col("m"),
          struct(S.l2micro(S.subM(col("v")), col("bv")).as("d"), col("cid").as("c")).as("dc"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(col("dc")).as("mn"))
        .select(col("vec_id"), col("m"), col("mn.c").as("code"))
      val cells = vecs.join(broadcast(coarse), lit(true), "inner")
        .select(col("vec_id"),
          struct(S.cos6(col("v"), col("cv")).as("s"), (-col("cid")).as("ncid")).as("sc"))
        .groupBy(col("vec_id"))
        .agg(max(col("sc")).as("mx"))
        .select(col("vec_id"), (-col("mx.ncid")).as("cell_id"))
      enc.join(cells, "vec_id")
        .select(col("vec_id"), col("m").cast("long").as("m"),
          col("code"), col("cell_id"))
    }
    val stream = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .where(col("vec_id") >= 0)
      .select(col("vec_id"), col("embedding"))
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(indexOf(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read()
      .select(col("vec_id"), col("m"), col("code"), col("cell_id"))
  }

  /** T-family streaming — CORPUS PREP AT INGEST (streaming twin of
    * t13): documents (∪ planted exact copies of every 10th doc — the
    * at-least-once delivery case) flow through the shared prep gates
    * (quality ≥ 2 + trigram English, [[graft.operators.TextAnalysis
    * .prepQualityCol]]/`prepEnOkCol` — the SAME columns t13 evaluates
    * in batch), a deterministic 80% content-hash sample, and
    * content-hash exact dedup via `dropDuplicatesWithinWatermark`.
    * Every emitted column is text-derived (hash, score, sample
    * bucket), so arrival order cannot leak into the result — original
    * and copy produce identical rows, and the batch oracle is a plain
    * DISTINCT. Output depends only on first-arrival emission (st11's
    * contract), not on watermark closure, so gate placement before the
    * state op is safe (contrast [[st14_stream_index]]'s sentinel
    * note); the sentinel row fails every gate by construction.
    *
    * Scale shape: gates and sample are stateless map-side filters that
    * shrink the stream BEFORE the only stateful op; dedup state is one
    * entry per surviving content hash with watermark TTL eviction —
    * the ingest-side corpus filter a 100 TB/day pipeline runs, where
    * dropping low-quality/duplicate docs before they reach storage is
    * the whole point.
    *
    * Delivery contract (the plain-DISTINCT oracle's premise): a planted
    * copy must arrive while its original's dedup state is still within
    * the 1h watermark TTL. Two defenses: (a) copies carry event times
    * 0.5 s after their originals ([[prepCopyEventTime]] — NOT the
    * shared [[docEventTime]], whose +1e6-id offset would place copies
    * ~11.6 days later, past the TTL under any multi-batch delivery),
    * so eviction of the original before its copy arrives would need
    * the two deliveries >1h of event time apart; and (b) the replay
    * delivers each source as ONE file → one AvailableNow micro-batch
    * (st12's documented contract), under which no eviction can
    * intervene at all. A TTL-expired re-emission under exotic delivery
    * is the documented at-least-once behavior of ANY windowed ingest
    * dedup, not a defect.
    */
  /** st15's event time: copies (doc_id ≥ 1e6) sit 0.5 s after their
    * originals; sentinel far-future. See the delivery-contract note.
    */
  private def prepCopyEventTime = when(col("doc_id") < 0,
      lit("2100-01-01 00:00:00").cast("timestamp"))
    .otherwise(timestamp_micros(
      lit(1700000000000000L) + pmod(col("doc_id"), lit(1000000L)) * 1000000L +
        when(col("doc_id") >= 1000000L, lit(500000L)).otherwise(lit(0L))))

  val st15_stream_corpus_prep: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val T = graft.operators.TextAnalysis
    def docs() = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
    val d2 = docs().where(col("doc_id") % 10 === 0 && col("doc_id") >= 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val gated = docs().select(cols: _*).unionAll(d2)
      .withColumn("event_time", prepCopyEventTime)
      .withWatermark("event_time", "1 hour")
      .withColumn("quality_score", T.prepQualityCol)
      .where(col("quality_score") >= 2 && T.prepEnOkCol)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("u", pmod(graft.functions.Portable.hash60(
        concat(lit("prep:"), col("content_hash"))), lit(100L)))
      .where(col("u") < 80)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("content_hash"), col("quality_score"), col("u"))
    Replay.runAppend(spark, gated)
  }

  /** D-family streaming — DECONTAMINATION AT INGEST (streaming
    * counterpart of d08): the training corpus streams through a
    * BROADCAST index of the eval set's rare shingles — the production
    * shape, since the benchmark set is small and fixed while the
    * corpus is unbounded. Each arriving doc explodes to hashed
    * shingles, equi-joins the eval index, and a windowed count per
    * (doc, eval item) yields the overlap; the post-replay rollup
    * reports contaminated docs like d08.
    *
    * The rare-shingle rule differs from d08 BY NECESSITY: d08 caps on
    * combined train+eval document frequency, which an ingest pipeline
    * cannot know (the stream's df is unbounded and future); the
    * knowable quantity is EVAL-side df, so the index drops shingles
    * frequent within the eval set and the oracle mirrors that rule.
    * Same [[graft.operators.Dedup.MinContamHits]] threshold.
    *
    * Scale shape: the broadcast is |eval shingles| (KBs against a TB
    * corpus); streaming state is ZERO (r18 — a doc's shingle hits all
    * derive inside its own micro-batch, so the per-(doc, eval) count
    * is batch-local; see the inline note). No shuffle of the corpus
    * at all: shingle hits aggregate map-side before the batch-local
    * keyed exchange on (doc, eval) pairs, which only carries actual
    * collisions.
    */
  val st16_stream_decontam: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val D = graft.operators.Dedup
    // r18: persisted — stream-static joins re-evaluate the static side
    // per micro-batch, and this is the standing eval-shingle index (the
    // st51/st89 artifact discipline).
    val evk = {
      val evsh = D.evalSet(spark, dir)
        .select(col("doc_id").as("eval_id"), D.shingles(col("text")).as("shd"))
        .where(size(col("shd")) > 0)
        .select(col("eval_id"),
          explode(graft.functions.Portable.hash60Array(col("shd"))).as("s"))
      evsh.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
        .where(col("df") <= D.DfCap)
        .select(col("eval_id"), col("s"))
        .persist()
    }
    // r18 (the O8 pattern): a document is ONE arriving event — its
    // shingle hits against the broadcast eval index all derive inside
    // its own micro-batch, so the per-(doc, eval) overlap count never
    // spans batches. The windowed aggregation (state: one count per
    // open (window, doc, eval)) is replaced by a batch-local hash
    // aggregation + idempotent batch-id append; the sentinel is
    // pre-filtered (its empty shingle set fed nothing anyway).
    def hitsBatch(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = b
      .select(col("doc_id"), D.shingles(col("text")).as("shd"))
      .select(col("doc_id"),
        explode(graft.functions.Portable.hash60Array(col("shd"))).as("s"))
      .join(broadcast(evk), "s")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_id"), col("eval_id"), col("inter"))
    val path = graft.Tables.scratchDir("graft_bkt_dcon_")
    val tbl = "graft_dcon_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "doc_id")
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"), col("text"))
    val sq = docs.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(hitsBatch(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    table.read()
      .select(col("doc_id"), col("eval_id"), col("inter"))
      .where(col("inter") >= D.MinContamHits)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("inter")).as("max_overlap"))
  }

  /** N-family streaming — ANN QUERY SERVING: the other half of st14's
    * deployment (st14 builds the index at ingest; this SERVES it). A
    * stream of query vectors runs n09's IVFADC plan as stream-static
    * joins against the trained index artifacts: coarse-assign the
    * query (argmax cosine over the broadcast centroid list — folded
    * per-row with a higher-order `aggregate` over a collected centroid
    * array, so assignment is STATELESS; a windowed-argmax aggregation
    * would chain two stateful operators for no gain on a bounded
    * centroid set), expand the broadcast ADC lookup table (|Q|·M·k
    * rows — stateless generate), equi-join the cell-ordered index rows
    * on (m, code, cell), and collapse per-(query, vector) ADC
    * distances BATCH-LOCALLY per micro-batch (r18 — a query event's
    * join products derive in its own batch; see the inline note). The
    * per-query top-k ranking runs on the appended distances after the
    * replay (the st12/st16 rollup pattern) — ranking is a bounded
    * |Q|·cell-size sort, not stream state. The result must equal
    * n09's batch answer exactly (the oracle IS n09's), proving a
    * query served mid-ingest returns the same neighbors the batch
    * index returns.
    *
    * Scale shape: broadcasts carry only bounded index parameters (k
    * centroids as one collected array — index metadata, not data; the
    * M·k codebook LUT); the corpus-side index rows are a static scan
    * equi-joined per arriving query (at scale: the cell-pruned index
    * read a vector store does per probe); streaming state is one sum
    * per (window, query, candidate) within the probed cell —
    * query-rate bounded, never corpus bounded. The interpreted HOF
    * argmax touches |queries|·k rows total (bounded), never the
    * corpus. Streaming state is ZERO (r18); the sentinel is
    * pre-filtered at the scan — nothing is watermark-driven.
    */
  val st17_stream_ann_serve: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val S = graft.operators.Similarity
    val centsArr = S.idx(spark, dir, "coarse")
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val books = S.idx(spark, dir, "books")
    val index = S.indexRows(spark, dir)
    // r18 (the O8 pattern on the serving leg): a query vector is ONE
    // arriving event — its ADC terms over the probed cell's index rows
    // all derive inside its own micro-batch, so the per-(query,
    // candidate) sum never spans batches. The windowed aggregation
    // (state: one sum per open (window, query, candidate)) and the
    // sentinel/watermark flush machinery are replaced by a batch-local
    // hash aggregation + idempotent batch-id append; the sentinel is
    // pre-filtered at the scan (nothing is watermark-driven).
    val q = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .where(col("vec_id") >= 0 && col("vec_id") < S.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // stateless coarse assignment: fold max(struct(cos6, -cid)) over the
    // broadcast centroid array — identical tiebreak to Similarity
    // .assignCells (higher cos6 wins; ties take the smaller cid)
    val qcell = aggregate(col("cents"),
      struct(lit(-2.0).as("s"), lit(Long.MinValue).as("ncid")),
      (acc, c) => {
        val s = S.cos6(col("qv"), c.getField("cv"))
        val nc = -c.getField("cid")
        when(s > acc.getField("s") ||
            (s === acc.getField("s") && nc > acc.getField("ncid")),
          struct(s.as("s"), nc.as("ncid"))).otherwise(acc)
      })
    def adcBatch(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val withCell = b.join(broadcast(centsArr), lit(true), "inner")
        .select(col("query_id"), col("qv"),
          (-qcell.getField("ncid")).as("qcell"))
      val lut = withCell.join(broadcast(books), lit(true), "inner")
        .select(col("query_id"), col("qcell"), col("m"),
          col("cid").as("code"), S.l2micro(S.subM(col("qv")), col("bv")).as("d"))
      lut.alias("l").join(index.alias("i"),
          col("l.m") === col("i.m") && col("l.code") === col("i.code") &&
            col("i.cell_id") === col("l.qcell") && col("i.vec_id") =!= col("l.query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("d")).as("amicro"))
        .select(col("query_id"), col("vec_id"), col("amicro"))
    }
    val path = graft.Tables.scratchDir("graft_bkt_adc_")
    val tbl = "graft_adc_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "query_id")
    val sq = q.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(adcBatch(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    S.adcTopK(table.read()
      .select(col("query_id"), col("vec_id"), col("amicro")))
  }

  /** N-family streaming — ANN SERVING AT THE TUNED DEPTH (st17's
    * single-cell serving upgraded to [[graft.operators.Similarity
    * .PickedNprobe]] probed cells — the serving path running the
    * configuration the n16 sweep chose, closing the tuning loop at
    * ingest the way n17 closes it in batch). The per-query cell
    * ranking is a STATELESS expression: the broadcast centroid array
    * is scored, sorted by (cos6 desc, cid) via a struct `array_sort`
    * (identical tiebreak to the batch quantizer), and sliced to the
    * picked depth; each query explodes to its probed cells, the
    * per-cell LUT rows join the static index on (m, code, cell), and
    * ONE windowed aggregation sums the exact ADC terms per
    * (query, candidate). A candidate's single cell matches at most one
    * probe, so each (query, candidate, m) joins exactly one LUT row —
    * no dedup, the sum is the full M-subspace ADC distance. Oracle is
    * n09's shape with the ranked probe set (n11's P=[[graft.operators
    * .Similarity.PickedNprobe]] slice). Streaming state is ZERO (r18,
    * st17's batch-local note — the per-(query, candidate) sums derive
    * inside the query's own micro-batch); the sentinel is pre-filtered
    * at the scan.
    */
  val st27_tuned_ann_serve: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val S = graft.operators.Similarity
    val centsArr = S.idx(spark, dir, "coarse")
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val books = S.idx(spark, dir, "books")
    val index = S.indexRows(spark, dir)
    val q = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .where(col("vec_id") >= 0 && col("vec_id") < S.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val rankedCells = slice(
      array_sort(transform(col("cents"), c =>
        struct((-S.cos6(col("qv"), c.getField("cv"))).as("ns"),
          c.getField("cid").as("cid")))),
      1, S.PickedNprobe)
    def adcBatch(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val withCells = b.join(broadcast(centsArr), lit(true), "inner")
        .select(col("query_id"), col("qv"),
          explode(rankedCells).as("rc"))
        .select(col("query_id"), col("qv"), col("rc.cid").as("qcell"))
      val lut = withCells.join(broadcast(books), lit(true), "inner")
        .select(col("query_id"), col("qcell"), col("m"),
          col("cid").as("code"), S.l2micro(S.subM(col("qv")), col("bv")).as("d"))
      lut.alias("l").join(index.alias("i"),
          col("l.m") === col("i.m") && col("l.code") === col("i.code") &&
            col("i.cell_id") === col("l.qcell") && col("i.vec_id") =!= col("l.query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("d")).as("amicro"))
        .select(col("query_id"), col("vec_id"), col("amicro"))
    }
    val path = graft.Tables.scratchDir("graft_bkt_tadc_")
    val tbl = "graft_tadc_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "query_id")
    val sq = q.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(adcBatch(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    S.adcTopK(table.read()
      .select(col("query_id"), col("vec_id"), col("amicro")))
  }

  /** st28 — THE REPETITION GATE AT INGEST (streaming twin of the
    * capstone's stage 5, t21's Gopher battery): the document stream
    * (originals ∪ planted copies — st18's at-least-once corpus) is
    * content-hash deduplicated, exploded to tagged 60-bit gram keys
    * (the codegen'd `gram_keys` fold over once-hashed tokens — t21's
    * exact arithmetic), and rolled up per document by repetition
    * family, emitting the three fractions and the composite keep flag
    * as each document's scoring window closes.
    *
    * THREE CHAINED STATEFUL OPERATORS — the frontier the round-8
    * extension point documented (`Curation.scala`), one past st18's
    * two: (1) `dropDuplicatesWithinWatermark` on content hash,
    * (2) the gram-level windowed count (state: one row per open
    * (window, doc, gram-key) — the map-side-collapsed distinct gram
    * set, ingest-rate bounded), (3) the doc-level windowed rollup
    * (state: one row per open (window, doc) — the n ∈ {2,3,5}
    * families collapse into conditional aggregates keyed by the tag
    * bits, so no per-family operator is needed). Each downstream agg
    * groups on the upstream's window (the supported window-of-window
    * chaining); the engine's no-data batches cascade the flush when
    * the sentinel advances the watermark.
    *
    * Sentinel discipline (the round-8 trap note): the watermark node
    * sits directly after the union, BEFORE every gate — the
    * sentinel's 1-token text derives zero gram rows, so it feeds no
    * state, but its 2100 event time still advances the watermark
    * that closes every real window across all three stores. Every
    * output column is text-derived (st15's order-independence
    * argument), so whichever copy survives dedup produces identical
    * rows, and the oracle is t21's battery over the text-distinct
    * corpus keyed by content hash.
    */
  /** st28's three-op stateful chain over an already-watermarked doc
    * stream with (text, event_time) — factored so `StreamingSpec` can
    * drive it through a checkpointed kill/restart on a MemoryStream.
    */
  private[graft] def repGateChain(docs: DataFrame): DataFrame = {
    val P = graft.functions.Portable
    val toksNE = filter(split(col("text"), " "), t => length(t) > 0)
    val deduped = docs
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
    // r18 (guide §2.4 + §4): all three repetition families are
    // DOCUMENT-local — every gram of a doc shares its single event
    // time, so the former gram-level windowed count and doc-level
    // windowed rollup (stateful ops 2 and 3, one open row per
    // (window, doc, gram) — corpus-sized state until the sentinel
    // flushed it) never mixed documents. The codegen'd
    // [[graft.functions.RepStats]] kernel computes the identical
    // tagged-gram-key statistics row-locally, leaving dedup as the
    // chain's ONLY stateful operator: rows emit on first arrival
    // instead of at watermark closure (same rows — every emitted
    // column is text-derived), per-doc gram state disappears, and the
    // flush-cascade of chained no-data batches goes with it. A doc
    // with no bigram position (n_tokens < 2, the sentinel's 1-token
    // text included) produced no gram rows and thus no output row
    // before; the n_tokens >= 2 filter pins that row set. NULL
    // fractions for families longer than the doc (npos = 0) match the
    // old conditional aggregates. Batch parity is CurationSpec's
    // kernel test; the batch twin is [[graft.operators.TextAnalysis
    // .repSignals]] (same kernel) with [[TextAnalysis
    // .repSignalsBuiltin]] as the exploded parity anchor.
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
    deduped
      .withColumn("th", P.hash60Array(toksNE))
      .select(col("content_hash"),
        size(col("th")).cast("long").as("n_tokens"),
        call_function("rep_stats", col("th")).as("rs"))
      .where(col("n_tokens") >= 2)
      .select(col("content_hash"), col("n_tokens"),
        frac(col("rs.top2"), col("rs.n2")).as("top2_frac"),
        frac(col("rs.top3"), col("rs.n3")).as("top3_frac"),
        frac(col("rs.dup5"), col("rs.n5")).as("dup5_frac"))
      .withColumn("rep_keep",
        col("top2_frac") <= graft.operators.TextAnalysis.RepTop2Max &&
          col("top3_frac") <= graft.operators.TextAnalysis.RepTop3Max &&
          col("dup5_frac") <= graft.operators.TextAnalysis.RepDup5Max)
  }

  val st28_stream_repetition: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
    def docs() = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
    val d2 = docs().where(col("doc_id") % 10 === 0 && col("doc_id") >= 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val stream = docs().select(cols: _*).unionAll(d2)
      .withColumn("event_time", prepCopyEventTime)
      .withWatermark("event_time", "1 hour")
    Replay.runAppend(spark, repGateChain(stream))
  }

  /** C-family streaming — THE CURATION PIPELINE AT INGEST (streaming
    * twin of c02's gate stages): documents (∪ planted copies of every
    * 10th doc — at-least-once delivery) flow through quality +
    * language gates, DECONTAMINATION against the eval set, the
    * deterministic content-hash sample and split, per-doc BPE token
    * counts from the TRAINED tokenizer artifact, content-hash exact
    * dedup, and then the TWO TRAINED MODEL GATES — t18's bigram-LM
    * perplexity gate and t20's NB classifier — served against the
    * static model artifacts. What c02 runs as a nightly batch, this
    * runs as the stream the corpus arrives on — the "cure before
    * storage" shape, model gates included.
    *
    * Operator shape: every heuristic stage is a STATELESS per-row
    * expression against a broadcast artifact — the eval set's
    * rare-shingle arrays collapsed to one row (contamination = the
    * codegen'd max_intersect kernel, st16's eval-side-df rule), and
    * the trained BPE vocabulary as a dictionary relation equi-joined
    * in the scoring leg (a tokenizer IS a dictionary; OOV counts 0,
    * t12's semantics — see the vocabTbl note). The model
    * gates are st19's adjudicated serving shape: explode each
    * surviving doc ONCE into (token, bigram) rows, stream-static
    * equi-join the LM pair/left-context tables and the NB weight table
    * on their natural keys (Catalyst broadcasts small models; at
    * 100 TB model size the same plan shuffle-joins), sum the exact
    * integer micro-nat terms per doc in ONE windowed aggregation, and
    * gate on the sums as stateless post-filters. The NB prior rides
    * the aggregation key (a 1-row broadcast constant), so no
    * stream-after-aggregation join is needed. Packing is deliberately
    * absent: a per-shard running offset over an unbounded stream is
    * unbounded state — streaming cures, the batch compactor (c02/t14)
    * packs; that division is the production architecture, not a gap.
    *
    * ONE stateful operator (r18; previously dedup → windowed scoring
    * agg): dedup state is one entry per surviving content hash
    * (ingest-rate bounded, TTL-evicted); the model scoring runs
    * batch-locally per micro-batch — a deduped doc's item rows derive
    * in its own batch, so the former windowed scoring state held
    * nothing cross-batch (see the inline r18 note). The capstone's REPETITION gate
    * (batch stage 5) is deliberately NOT inlined here: its gram-level
    * + doc-level aggregations would push this pipeline to four
    * chained stateful ops whose flush cascades multiply replay
    * batches; [[st28_stream_repetition]] runs the same gate as its
    * own three-op chain (dedup → gram agg → doc rollup) over the
    * same deduped corpus — at deploy, the two pipelines' verdicts
    * join on content_hash (the batch-side signal-table composition,
    * streamed). Every output column is
    * text-derived (st15's order-independence argument), so original
    * and copy produce identical rows whichever arrives first, and the
    * batch oracle composes the same CTE fragments (incl. the shared
    * trained-model CTEs) with a plain DISTINCT. Same delivery contract
    * as st15; the sentinel is pre-filtered at the source (nothing is
    * watermark-driven since the r18 batch-local scoring — the
    * watermark exists only as dedup's TTL clock).
    */
  val st18_stream_curation: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val T = graft.operators.TextAnalysis
    val D = graft.operators.Dedup
    val P = graft.functions.Portable
    val W = org.apache.spark.sql.expressions.Window

    // broadcast artifact 1: the eval set's rare-shingle arrays (one per
    // eval item), collapsed to a single row
    val evalSets = {
      val evsh = D.evalSet(spark, dir)
        .select(col("doc_id").as("eval_id"), D.shingles(col("text")).as("shd"))
        .where(size(col("shd")) > 0)
        .select(col("eval_id"), explode(P.hash60Array(col("shd"))).as("s"))
      evsh.withColumn("df", count(lit(1)).over(W.partitionBy(col("s"))))
        .where(col("df") <= D.DfCap)
        .groupBy(col("eval_id")).agg(collect_list(col("s")).as("es"))
        .agg(collect_list(col("es")).as("eval_sets"))
    }
    // artifact 2: the trained tokenizer vocabulary — joined per batch
    // on the token key (r18: the first cut collapsed it into a 1-row
    // broadcast MAP folded per token with element_at; Spark's MapData
    // lookup is a per-access LINEAR SCAN over the whole vocabulary, so
    // the fold cost |doc|·|vocab| per row — measured ~0.8 s of st18 at
    // sf0.1. The scoring leg already explodes each doc's tokens once,
    // so the vocab rides the same batch-local equi-join lane as the LM
    // and NB models — the t12 "a tokenizer IS a dictionary" semantics
    // on the Spark-native dictionary path, OOV still counting 0.)
    val vocabTbl = T.bpeIdx(spark, dir, "vocab")
      .select(col("token").as("w"), size(split(col("syms"), " ")).cast("long").as("n_sub"))
    // trained model artifacts (t18's LM; t20's NB weights + prior)
    val (c2, c1, v) = T.bigramModelParts(spark, dir)
    val (nbW, nbW0, nbPm) = T.nbModelParts(spark, dir)

    val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
    def docs() = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
    val d2 = docs().where(col("doc_id") % 10 === 0 && col("doc_id") >= 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val toksNE = filter(split(col("text"), " "), t => length(t) > 0)
    // r18 (guide §4): the codegen'd max_intersect kernel — one probe
    // set over ds per document instead of the builtin fold's |eval|
    // array_intersect set-builds per document (the gate's measured
    // share was ~4.4 s of st18's 11.3 s at sf0.1). Semantics pinned
    // to the fold (both sides deduped per item, max over items) by an
    // ExpressionProps property; the equivalent fold stays in this
    // comment as the reference:
    //   aggregate(eval_sets, 0, (acc, es) ->
    //     greatest(acc, size(array_intersect(es, ds))))
    val contamHits = call_function("max_intersect", col("eval_sets"), col("ds"))
    // one explode per doc: (token, adjacent-bigram-or-null) items
    val items = when(size(col("tk")) >= 1,
      transform(sequence(lit(1), size(col("tk"))), i =>
        struct(
          element_at(col("tk"), i).as("w"),
          when(i < size(col("tk")),
            concat(element_at(col("tk"), i), lit(" "), element_at(col("tk"), i + 1)))
            .otherwise(lit(null).cast("string")).as("pair"))))
      .otherwise(array().cast("array<struct<w:string,pair:string>>"))

    // r18 (guide §2.4; the st19/st14 lesson applied to the capstone's
    // scoring leg): a deduped document's (token, bigram) items all
    // derive inside the micro-batch that emitted it from dedup state
    // (dropDuplicatesWithinWatermark emits survivors on first
    // arrival), so the per-doc LM/NB sums never span batches — the
    // former WINDOWED scoring aggregation (one (n, Σlp, Σw) state row
    // per (window, hash), a full exchange of every exploded item row,
    // and the sentinel-driven flush cascade) held nothing cross-batch
    // by construction. The model scoring now runs BATCH-LOCALLY in
    // foreachBatch (plain hash aggregation) with an idempotent
    // batch-id append (the st84/st109 pattern); dedup stays the
    // chain's ONLY stateful operator. With no watermark-driven
    // emission left, the sentinel is pre-filtered at the source and
    // the gates lose their isSentinel escapes (the pushdown trap the
    // old comment documented is moot — nothing downstream needs the
    // 2100 event time; the watermark node remains only as
    // dropDuplicatesWithinWatermark's TTL clock).
    val gated = docs().where(col("doc_id") >= 0).select(cols: _*).unionAll(d2)
      .withColumn("event_time", prepCopyEventTime)
      .withWatermark("event_time", "1 hour")
      .join(broadcast(evalSets), lit(true), "inner")
      .withColumn("quality_score", T.prepQualityCol)
      .where(col("quality_score") >= 2 && T.prepEnOkCol)
      .withColumn("ds", P.hash60Array(D.shingles(col("text"))))
      .where(contamHits < D.MinContamHits)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("u", pmod(P.hash60(concat(lit("prep:"), col("content_hash"))), lit(100L)))
      .where(col("u") < 80)
      .withColumn("split",
        when(P.hash60(concat(lit("split:"), col("content_hash"))) % 100 < T.TrainPct,
          "train").otherwise("val"))
      .dropDuplicatesWithinWatermark("content_hash")
    def scoreBatch(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = b
      .withColumn("tk", toksNE)
      .select(col("content_hash"), col("quality_score"), col("u"), col("split"),
        explode(items).as("it"))
      .select(col("content_hash"), col("quality_score"), col("u"), col("split"),
        col("it.w").as("w"), col("it.pair").as("pair"))
      .join(c2, Seq("pair"), "left")
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .join(broadcast(v), lit(true), "inner")
      .join(nbW, Seq("w"), "left")
      .join(broadcast(nbW0), lit(true), "inner")
      .join(broadcast(nbPm), lit(true), "inner")
      .join(broadcast(vocabTbl), Seq("w"), "left")
      .select(col("content_hash"), col("quality_score"), col("u"), col("split"),
        col("prior_m"),
        when(col("pair").isNotNull,
          floor(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * T.LmMicro)
            .cast("long")).as("lp"),
        coalesce(col("wm"), col("w0")).as("wm"),
        coalesce(col("n_sub"), lit(0L)).as("n_sub"))
      .groupBy(col("content_hash"),
        col("quality_score"), col("u"), col("split"),
        col("prior_m"))
      .agg(count(col("lp")).as("n_bigrams"),
        sum(col("lp")).as("sum_lp_micro"),
        sum(col("wm")).as("sum_w"),
        sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("content_hash"), col("quality_score"), col("u"), col("split"),
        col("n_bpe_tokens"), col("n_bigrams"), col("sum_lp_micro"),
        (col("sum_w") + col("prior_m")).as("log_odds_micro"))
    val path = graft.Tables.scratchDir("graft_bkt_cur_")
    val tbl = "graft_cur_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "content_hash")
    val q = gated.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(scoreBatch(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read()
      .select(col("content_hash"), col("quality_score"), col("u"), col("split"),
        col("n_bpe_tokens"), col("n_bigrams"), col("sum_lp_micro"),
        col("log_odds_micro"))
      .withColumn("avg_lp_micro",
        col("sum_lp_micro").cast("double") / col("n_bigrams").cast("double"))
      .where(col("avg_lp_micro") >= T.PplGateMicro.toDouble &&
        col("log_odds_micro") >= 0)
      .select(col("content_hash"), col("quality_score"), col("u"), col("split"),
        col("n_bpe_tokens"), col("avg_lp_micro"), col("log_odds_micro"))
  }

  /** T-family streaming — THE LM PERPLEXITY GATE AT INGEST (serving
    * twin of t18): arriving documents are scored against the TRAINED
    * bigram model — [[graft.operators.TextAnalysis.lmScore]], t18's
    * scorer VERBATIM (explode to bigrams, equi-join the static
    * pair-count/left-context tables on their natural keys, sum the
    * exact integer micro-nat terms per doc), run BATCH-LOCALLY inside
    * each micro-batch and appended idempotently by batch id (the
    * st84/st109 pattern). A document is ONE arriving event, so every
    * bigram row derives inside its doc's own micro-batch — the per-doc
    * sums never span batches, and cross-batch state would hold nothing.
    * (A broadcast-map `element_at` fold was the first cut — Spark's
    * map lookup is a per-access linear scan, so the interpreted fold
    * cost |doc|·|model| per row; the join formulation is the
    * Spark-native dictionary lookup.)
    *
    * r18 (guide §2.4; the O6 lesson applied to the T-family serving
    * leg): the first cut summed the per-bigram terms in a WINDOWED
    * streaming aggregation — one (count, oov, sum) state row per
    * (window, doc), a full exchange of every exploded bigram row into
    * the state operator, and the sentinel/watermark machinery to
    * flush it (attribution at sf0.1: the explode→windowed-agg path
    * was ~3.5 s of the query's 6.2 s, the stateful-agg machinery
    * ~1.9 s more; the model joins — broadcast — were ~0.2 s). The
    * batch-local form keeps t18's arithmetic term-for-term with ZERO
    * streaming state at any scale; docs with < 2 tokens still drop at
    * the inner aggregation (t18's semantics), and the sentinel is
    * pre-filtered (no watermark to starve — nothing here is
    * watermark-driven). Oracle is t18's, unchanged.
    */
  val st19_stream_lm_gate: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val path = graft.Tables.scratchDir("graft_bkt_lmg_")
    val tbl = "graft_lmg_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "doc_id")
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"), col("text"))
    val q = docs.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(T.lmScore(spark, dir, b)
          .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
            col("sum_lp_micro")), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read()
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"), col("sum_lp_micro"))
      .withColumn("avg_lp_micro",
        col("sum_lp_micro").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("ppl_keep", col("avg_lp_micro") >= T.PplGateMicro.toDouble)
  }

  /** P12 streaming — DQ QUARANTINE AT INGEST (streaming twin of p12):
    * malformed / schema-violating / type-violating envelopes route to
    * the dead-letter stream WITH their machine-readable reason as the
    * events arrive — the deploy shape of p12's gate (the reference
    * try/catches fastjson per record inside its DStream loop; here the
    * verdict battery is one stateless codegen'd projection, so the
    * quarantine costs no shuffle and no state at any scale). Same
    * three planted failure classes and the same STRING-parse +
    * integer-regex taxonomy as p12 (engine-portable by construction);
    * oracle is p12's. The sentinel's empty props quarantines as
    * missing_field by construction and is dropped on read-back by its
    * negative id.
    */
  val st25_stream_quarantine: Q = (spark, dir) => {
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(
      StructField("k", StringType),
      StructField("_corrupt_record", StringType)))
    def ev() = Replay.eventsStream(spark, dir).select(col("event_id"), col("props"))
    val truncated = ev().where(col("event_id") % 20 === 0)
      .select((col("event_id") + 1000000000L).as("event_id"),
        col("props").substr(lit(1), length(col("props")) - 2).as("props"))
    val wrongKey = ev().where(col("event_id") % 20 === 10)
      .select((col("event_id") + 2000000000L).as("event_id"),
        replace(col("props"), lit("\"k\""), lit("\"x\"")).as("props"))
    val wrongType = ev().where(col("event_id") % 20 === 5)
      .select((col("event_id") + 3000000000L).as("event_id"),
        regexp_replace(col("props"), lit("[0-9]+"), lit("\"x\"")).as("props"))
    val quarantined = ev().unionAll(truncated).unionAll(wrongKey).unionAll(wrongType)
      .withColumn("parsed", from_json(col("props"), propsSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("reason",
        when(col("parsed").isNull || col("parsed._corrupt_record").isNotNull,
          "malformed_json")
          .when(col("parsed.k").isNull, "missing_field")
          .when(!col("parsed.k").rlike("^-?[0-9]+$"), "type_mismatch"))
      .where(col("reason").isNotNull)
      .select(col("event_id"), col("props"), col("reason"))
    Replay.runAppend(spark, quarantined).where(col("event_id") >= 0)
  }

  /** A-family streaming — THE REVENUE CUBE AT INGEST (streaming twin
    * of a11): the order stream joins the static dims and maintains the
    * FINEST cube grain — one (region, nation) row — in the keyed
    * upsert table via an update-mode aggregation (st07's
    * exactly-once writer); the rollup's subtotal and grand-total rows
    * are derived ON READ by a batch `rollup` over the bounded
    * 25-row table. That division is the production serving shape: the
    * stream maintains base cells (state = |nations| rows, never
    * corpus-sized), the serving layer computes aggregates over them
    * (st13's served-leaderboard precedent) — a streaming ROLLUP would
    * keep redundant subtotal state Spark's streaming aggregation
    * doesn't support anyway. Money stays exact: the read-side rollup
    * re-derives integer cents from the stored per-cell sums
    * (`moneySum` over already-rounded values), so Σ(cell cents) =
    * Σ(order cents) and the oracle is a11's, unchanged. Sentinel:
    * o_custkey −1 joins no customer — the inner dim join drops it (no
    * watermark to advance: update-mode agg emits every batch).
    */
  val st23_stream_rollup_serve: Q = (spark, dir) => {
    import graft.Tables
    val o = Replay.ordersStream(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val base = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Tables.moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    rollupOnRead(upsertServe(spark, base, Seq("r_name", "n_name"), "n_orders"))
  }

  /** st23's read-side: derive the rollup's subtotal and grand-total
    * rows from the served finest-grain cells (shared with the restart
    * spec so the kill/resume proof exercises the production read
    * path).
    */
  private[graft] def rollupOnRead(served: DataFrame): DataFrame =
    served.rollup(col("r_name"), col("n_name"))
      .agg(graft.Tables.moneySum(col("revenue")).as("revenue"),
        sum(col("n_orders")).as("n_orders"),
        grouping_id().cast("long").as("gid"))

  /** A-family streaming — THE ACTIVITY PIVOT AT INGEST (streaming twin
    * of a12): per-day event-type counts as PINNED conditional
    * aggregates (a12's adjudicated pivot shape — an unpinned streaming
    * pivot would need a distinct-scan planning pass) maintained in the
    * keyed upsert table in update mode, one row per day. The total
    * count is the upsert's monotonic order column and is dropped on
    * read; the sentinel's far-future day is filtered after read-back.
    * Oracle is a12's, unchanged. State: |days| rows — time-bounded,
    * never event-bounded.
    */
  val st24_stream_pivot_serve: Q = (spark, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = Replay.eventsStream(spark, dir)
      .select(to_date(col("ts")).as("dt"), col("event_type"))
    val counts = types.map(t =>
      count(when(col("event_type") === t, 1)).as(t))
    val base = ev.groupBy(col("dt"))
      .agg(counts.head, (counts.tail :+ count(lit(1)).as("n_total")): _*)
    upsertServe(spark, base, Seq("dt"), "n_total") // one row per day
      .where(col("dt") < lit("2100-01-01").cast("date"))
      .select((col("dt") +: types.map(col)): _*)
  }

  /** T-family streaming — THE DOMAIN-MIXTURE DASHBOARD AT INGEST
    * (streaming twin of t19): per-(lang, source) document/token counts
    * maintained in the keyed upsert table by an update-mode
    * aggregation; the temperature weights (α=0.5 sampling shares,
    * boost vs natural share) are derived ON READ over the bounded
    * |domains| table with t19's exact integer-quantized arithmetic —
    * the st23 division of labor (stream maintains base cells, serving
    * derives global-normalized aggregates). No watermark is needed
    * (update-mode agg), so the sentinel is simply pre-filtered by id —
    * the scan-pushdown trap only bites pipelines whose emission NEEDS
    * the sentinel's watermark. Oracle is t19's, unchanged. State:
    * |domains| rows — never corpus-sized.
    */
  val st26_stream_mixture_serve: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val base = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val dom = upsertServe(spark, base, Seq("lang", "source"), "n_docs") // |domains| rows
      .withColumn("s_micro",
        floor(sqrt(col("n_tokens").cast("double")) * T.LmMicro).cast("long"))
    val tot = dom.agg(sum(col("s_micro")).as("tot_s"), sum(col("n_tokens")).as("tot_tok"))
    dom.join(broadcast(tot), lit(true), "inner")
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        (col("s_micro").cast("double") / col("tot_s").cast("double")).as("weight"),
        ((col("s_micro").cast("double") / col("tot_s").cast("double")) /
          (col("n_tokens").cast("double") / col("tot_tok").cast("double"))).as("boost"))
  }

  /** A-family streaming — THE QUANTILE SKETCH AT INGEST (streaming
    * twin of a14, closing the a13→a14→st29 chain): per-event-type
    * p50/p90/p99 maintained incrementally by
    * [[graft.functions.QuantileSketchAgg]] inside an update-mode
    * streaming aggregation and SERVED from the keyed upsert table.
    * This is the latency-percentile dashboard shape: each micro-batch
    * folds its values into the per-key sketch buffer held in state
    * (map-side partials reduce a partition to one O(k·log(n/k))
    * sketch before the exchange, exactly a14's batch shape), and
    * reading current percentiles costs a |event_types|-row table
    * scan, never a re-aggregation of history.
    *
    * State: ONE ~100 KB sketch buffer per event type — key-bounded,
    * never event-bounded; n_events (exact count, the sketch's carried
    * counter) is the upsert's monotonic order column. No watermark is
    * needed (update-mode agg, st26's rule), so the sentinel is
    * pre-filtered by id. Correctness follows the a07/a14 precedent:
    * the result depends on the merge tree, so there is no cross-engine
    * oracle — the driver records the rows-only check, and
    * `QuantileSketchSpec` bounds the SERVED quantiles against exact
    * order statistics across a kill/resume of this exact path
    * (upsertServeWith), proving the sketch state recovers from the
    * checkpoint and n_events stays exact.
    */
  val st29_stream_quantile_serve: Q = (spark, dir) => {
    val base = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0 && col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(graft.functions.QuantileSketch.quantileSketch(2048)(col("value")).as("s"))
      .select(col("event_type"), col("s.n_events").as("n_events"),
        col("s.p50").as("p50"), col("s.p90").as("p90"), col("s.p99").as("p99"))
    upsertServe(spark, base, Seq("event_type"), "n_events")
  }

  /** J-family streaming — REALTIME ATTRIBUTION (streaming twin of
    * j12): the event stream feeds [[Pipelines.attribution]]'s per-user
    * buffered state; each conversion's last-touch click is assigned
    * when the watermark proves the user's history closed, over the
    * complete delivered history — so out-of-order arrival (a click
    * delivered after the purchase it precedes) attributes correctly,
    * which no eager per-batch join can do. State: capped per-user
    * event list (scd2's prefix truncation + monotone TTL anchor),
    * RocksDB-backed. The sentinel rides the `user_id < 0` branch to
    * keep driving the watermark and is dropped after read-back.
    * Oracle is j12's — the batch as-of must be reproduced EXACTLY.
    */
  val st32_stream_attribution: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .where(col("event_type").isin("click", "purchase") || col("user_id") < 0)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
        (col("event_type") === "click").as("is_click"), col("ts").as("event_time"))
      .as[graft.streaming.AttrEvent]
    Replay.runAppend(spark, Pipelines.attribution(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
  }

  /** J-family streaming — MULTI-TOUCH ATTRIBUTION AT INGEST
    * (streaming twin of j14, st32's machinery): clicks and purchases
    * buffer in per-user capped state; when the watermark proves a
    * user's history closed, ONE sorted sweep splits every purchase's
    * cents equally across its strictly-prior-7-day clicks
    * ([[Pipelines.multiTouch]] — j14's exact integer credit rule, so
    * conservation holds per purchase). Flush-time assignment over the
    * complete delivered history means a late-arriving earlier click
    * joins the split it belongs to — the same out-of-order guarantee
    * as st32, now for the one-to-many credit shape. State: capped
    * per-user event list + monotone TTL anchor, RocksDB-backed. The
    * sentinel rides the `user_id < 0` branch to keep the watermark
    * alive and drops after read-back. Oracle is j14's verbatim.
    */
  val st44_stream_multitouch: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .where(col("event_type").isin("click", "purchase") || col("user_id") < 0)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
        (col("event_type") === "click").as("is_click"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("cents"),
        col("ts").as("event_time"))
      .as[graft.streaming.MtEvent]
    Replay.runAppend(spark, Pipelines.multiTouch(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
  }

  /** J-family streaming — CDC APPLY AT INGEST (streaming twin of
    * j17, the reference's actual runtime shape: Maxwell rows stream
    * in and the current state serves immediately, dim/User_info_APP
    * row-at-a-time against Phoenix; here ONE update-mode
    * aggregation). The key design move vs st32/st44's buffered
    * history: because inserts carry the FULL image, j17's
    * generation-reset semantics collapse to three mergeable
    * per-key maxes — the last boundary marker max(tsu,eid,op over
    * insert|delete), and per column the last non-null
    * max(tsu,eid,col) (any post-reset row ≥ the reset's image, so
    * the global last-non-null IS the last-generation last-non-null)
    * — all commutative/associative/idempotent-under-replay order
    * structs, so state is O(1) PER KEY (three small structs), never
    * the user's history, and arrival order cannot matter. Keys whose
    * boundary is a delete serve op='delete' with null columns — the
    * tombstone stays VISIBLE in the serving table (a consumer must
    * distinguish "deleted" from "never existed"); j17's batch rows
    * are exactly the op='insert' slice (spec-locked), which also
    * means st55 deliberately omits j17's n_ops — a count "since the
    * last boundary" is the one piece that is NOT order-free, and
    * trading it away is what buys the O(1) state.
    *
    * Serving: keyed upsert on user_id ordered by the monotone
    * last_tsu; sentinel pre-filtered (update-mode agg needs no
    * watermark, st26's rule). Oracle: the same order-free aggregates
    * in DuckDB (arg_max FILTER) — fully hash-checked.
    */
  /** [[st55_stream_cdc_apply]]'s order-free state aggregation over an
    * arbitrary changelog — exposed so `StateCapSpec` can kill/resume
    * the exact serving path over a MemoryStream.
    */
  private[graft] def cdcServeAgg(log: DataFrame): DataFrame = {
    def lastOf(cond: Column, c: Column) = max(when(cond, struct(col("tsu"), col("eid"), c)))
    log.groupBy(col("user_id"))
      .agg(lastOf(col("op").isin("insert", "delete"), col("op")).as("b"),
        lastOf(col("balance_c").isNotNull, col("balance_c")).as("cb"),
        lastOf(col("segment").isNotNull, col("segment")).as("cs"),
        max(col("tsu")).as("last_tsu"))
      .where(col("b").isNotNull)
      .select(col("user_id"), col("b.op").as("op"),
        when(col("b.op") === "insert", col("cb.balance_c")).as("balance_c"),
        when(col("b.op") === "insert", col("cs.segment")).as("segment"),
        col("last_tsu"))
  }

  val st55_stream_cdc_apply: Q = (spark, dir) => {
    val log = graft.operators.Relational.cdcLog(
      Replay.eventsStream(spark, dir).where(col("user_id") >= 0))
    upsertServe(spark, cdcServeAgg(log), Seq("user_id"), "last_tsu")
  }

  /** W-family streaming — SEQUENCE-PATTERN MATCH AT INGEST (streaming
    * twin of w07, st32/st44's flush-time machinery): click/error/
    * purchase events buffer in per-user capped state; when the
    * watermark proves the user's history closed, ONE sorted sweep
    * emits the matched pattern instances ([[Pipelines.sequenceMatch]]
    * — w07's exact rule under the same total order). Flush-time
    * matters doubly for a pattern with NEGATION: a late in-between
    * error must retroactively kill a match, which an eager per-batch
    * emit can never take back in append mode. State: capped per-user
    * event list + monotone TTL anchor, RocksDB-backed; sentinel rides
    * `user_id < 0`. Oracle is w07's verbatim.
    */
  val st59_stream_sequence_match: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .where(col("event_type").isin("click", "purchase", "error") || col("user_id") < 0)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
        col("event_type").as("etype"), col("ts").as("event_time"))
      .as[graft.streaming.SeqEvent]
    Replay.runAppend(spark, Pipelines.sequenceMatch(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
  }

  /** P-family streaming — SNAPSHOT DIFF AT INGEST (streaming twin of
    * p17, the count-at-ingest/judge-on-read discipline of st40/st41):
    * the new snapshot's rows stream in and are classified added /
    * changed / unchanged FULLY STATELESSLY — one stream-static left
    * join against the standing base on the key, verdict computed
    * within the row — and the complete arrived-key MANIFEST (id,
    * verdict, lengths; never the text) upserts to the serving table.
    * 'unchanged' rows land in the manifest too, deliberately: REMOVAL
    * is the one verdict ingest cannot emit (absence has no arrival
    * event), so it is judged ON READ as base ∖ manifest — and that
    * anti-join can only distinguish "removed" from "arrived unchanged"
    * if the manifest is complete. The serving table is O(|snapshot|)
    * ids — the manifest IS the product (it doubles as the fingerprint
    * table p17's docstring says a production diff keeps per version);
    * the read-back emits the delta only. No state store, no
    * watermark; the sentinel rides `doc_id < 0` and is pre-filtered.
    * Oracle is p17's verbatim.
    */
  val st56_stream_snapshot_diff: Q = (spark, dir) => {
    val base = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val docs = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
    // the arriving NEW snapshot, derived row-locally in ONE stateless
    // pass (p17's removal/mutation/re-add fixture): each source doc
    // emits its next-version row unless removed, plus the re-add
    val nextRows = docs.select(explode(array(
        when(!(col("doc_id") % 11 === 5),
          struct(col("doc_id"),
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" [v2]")))
              .otherwise(col("text")).as("text"))),
        when(col("doc_id") % 13 === 2,
          struct((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" [new]")).as("text"))))).as("r"))
      .where(col("r").isNotNull)
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("new_text"))
    val verdicts = nextRows
      .join(base.select(col("doc_id"), col("text").as("old_text")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("old_text").isNull, "added")
          .when(col("old_text") =!= col("new_text"), "changed")
          .otherwise("unchanged").as("change"),
        length(col("old_text")).cast("long").as("old_len"),
        length(col("new_text")).cast("long").as("new_len"))
    val served = upsertServe(spark, verdicts, Seq("doc_id"), "new_len")
    val removed = base.join(served.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("removed").as("change"),
        length(col("text")).cast("long").as("old_len"),
        lit(null).cast("long").as("new_len"))
    served.where(col("change") =!= "unchanged")
      .select(col("doc_id"), col("change"), col("old_len"), col("new_len"))
      .unionByName(removed)
  }

  /** J-family streaming — RANGE JOIN AT INGEST (streaming twin of
    * j10): each arriving event is assigned to every campaign whose
    * [start, end) period contains it, via the SAME interval→day-bucket
    * decomposition ([[graft.operators.Relational.campaignBuckets]] —
    * one shared relation, both engines, both modes). The join is
    * STATELESS: stream-static equi-join on the day bucket (the small
    * bucket side broadcasts) + the exact range residual — no
    * watermark, no state store, every micro-batch joins and emits.
    * That statelessness is the point: the scale-safe batch
    * decomposition carries to ingest unchanged, where the naive theta
    * join would be a per-batch nested loop. The sentinel's year-2100
    * rows match no bucket and drop in the join itself. Oracle is
    * j10's — the assignment must be identical to the batch relation.
    */
  val st33_stream_range_join: Q = (spark, dir) => {
    val buckets = graft.operators.Relational.campaignBuckets(spark)
    val ev = Replay.eventsStream(spark, dir)
      .select(col("event_id"), col("ts"), to_date(col("ts")).as("day"))
    val out = ev.join(broadcast(buckets), Seq("day"))
      .where(col("ts") >= col("cstart") && col("ts") < col("cend"))
      .select(col("event_id"), col("campaign_id"))
    Replay.runAppend(spark, out)
  }

  /** C-family streaming — MIXTURE RESAMPLING AT INGEST (streaming twin
    * of c07, closing the third monitor→decide→act loop across modes):
    * the nightly batch DECIDES per-domain acceptance rates
    * ([[graft.operators.TextAnalysis.mixtureRates]] — t19's
    * temperature mixture floored to integer basis points) and the
    * stream ACTS on them — each arriving document joins its domain's
    * rate from the broadcast |domains|-row decision table and passes
    * iff its keyed hash falls under the rate. The pickNprobe/st27
    * decide-batch-serve-stream discipline, applied to corpus
    * composition: ingest enforces LAST night's mixture (a stream
    * cannot know tonight's corpus totals — the same
    * cannot-know-future-df reasoning as st16's decontamination rule);
    * the nightly c07 run re-decides, and the served rates roll
    * forward.
    *
    * Fully STATELESS: broadcast equi-join on (lang, source) + one
    * integer compare per row — no watermark, no state store, every
    * micro-batch filters and appends. At 100 TB ingest rates this is
    * the front-door mixture governor: over-crawled domains are shed
    * at the scan task, before any shuffle or state sees them. The
    * sentinel's ("x","x") domain matches no decision row and drops in
    * the join. Oracle is c07's — the kept set must be identical to
    * the batch resample because rates and hashes are both
    * deterministic.
    */
  val st39_stream_mixture_resample: Q = (spark, dir) => {
    val P = graft.functions.Portable
    val rates = graft.operators.TextAnalysis.mixtureRates(spark, dir)
    val docs = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id"), col("lang"), col("source"))
    val out = docs.join(broadcast(rates), Seq("lang", "source"))
      .where(pmod(P.hash60(concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(10000L)) < col("rate_micro"))
      .select(col("doc_id"), col("lang"), col("source"), col("rate_micro"))
    Replay.runAppend(spark, out)
  }

  /** T-family streaming — DRIFT MONITOR AT INGEST (streaming twin of
    * t24): the arriving delta batch's feature distributions are
    * counted INCREMENTALLY — a stateless 3-rows-per-doc feature
    * explode (the shared [[graft.operators.TextAnalysis
    * .driftFeatures]] projection, so both modes bucket identically)
    * into ONE windowed aggregation whose state is one counter per
    * open (window, feature, bucket) — dozens of rows, ingest-rate
    * independent. The PSI verdict is computed ON READ against the
    * standing corpus's batch-side reference counts via the shared
    * [[graft.operators.TextAnalysis.driftScore]] arithmetic — count
    * at ingest, judge on read, the upsert-serving division of labor.
    * This is the alerting mode of the drift monitor: the nightly t24
    * scores the full delta, the stream scores it as it lands, and
    * both produce the identical statistic (oracle is t24's verbatim)
    * because counting is the only stateful step and counts are
    * delivery-order free.
    *
    * Sentinel discipline: the delta filter keeps the sentinel's
    * `doc_id < 0` branch alive (st32's pattern — a predicate that
    * drops the sentinel row below the watermark node starves the
    * watermark and no window ever closes); the sentinel's features
    * land in the one year-2100 window, which the watermark never
    * passes, so they stay in state and never reach the read-back.
    * The full-outer bucket join on read reproduces t24's bucket
    * union (a bucket seen only on one side still contributes its
    * smoothed term).
    */
  val st40_stream_drift: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val docs = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .withColumn("event_time", prepCopyEventTime)
      .withWatermark("event_time", "1 hour")
      .where(col("doc_id") % 10 === 0 || col("doc_id") < 0)
    val counts = T.driftFeatures(docs, col("event_time"))
      .groupBy(window(col("event_time"), "1 hour"), col("feature"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val perWin = Replay.runAppend(spark, counts.drop("window"))
    val cur = perWin.groupBy(col("feature"), col("bucket"))
      .agg(sum(col("c")).as("cur_n"))
    val ref = T.driftFeatures(
      graft.Tables.documents(spark, dir).where(col("doc_id") % 10 =!= 0))
      .groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("ref_n"))
    val joined = ref.join(cur, Seq("feature", "bucket"), "full")
      .select(col("feature"), col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    T.driftScore(joined)
  }

  /** N-family streaming — INDEX DELETES AT INGEST (streaming twin of
    * n20): tombstone events (takedowns, dedup verdicts, retention
    * expiries) arrive on the vector firehose and the compaction
    * planner's counters are maintained INCREMENTALLY — the tombstone
    * filter and the cell lookup are STATELESS (an id-only
    * stream-static equi-join against the cells artifact; payloads
    * never ride), and the only stateful step is ONE running
    * update-mode count per touched cell, upserted to the serving
    * table each batch (state = one counter per touched cell — k rows
    * at most, ingest-rate independent). The compaction PLAN is
    * assembled ON READ: the standing per-cell member counts
    * left-join the served tombstone counters, a never-touched cell
    * coalescing to zero — count at ingest, plan on read, the
    * upsert-serving division of labor. Oracle is n20's verbatim
    * (counting is the only stateful step and counts are
    * delivery-order free); the sentinel's vec_id = −1 fails the
    * tombstone predicate at the stateless front door (no watermark
    * in this pipeline, so no sentinel-starvation trap).
    */
  val st41_stream_index_delete: Q = (spark, dir) => {
    val S = graft.operators.Similarity
    graft.plans.GraftExtensions.register(spark)
    val cells = S.idx(spark, dir, "cells").select(col("vec_id"), col("cell_id"))
    val tomb = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .select(col("vec_id"))
      .where(col("vec_id") % S.DeleteMod === 3)
      .join(cells, "vec_id")
    val counts = tomb.groupBy(col("cell_id")).agg(count(lit(1)).as("n_deleted"))
    val served = upsertServe(spark, counts, Seq("cell_id"), "n_deleted")
    cells.groupBy(col("cell_id")).agg(count(lit(1)).as("n_before"))
      .join(served.select(col("cell_id"), col("n_deleted")), Seq("cell_id"), "left")
      .select(col("cell_id"), col("n_before"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .select(col("cell_id"), col("n_before"), col("n_deleted"),
        (col("n_before") - col("n_deleted")).as("n_after"),
        (col("n_deleted") > 0).as("touched"))
  }

  /** A-family streaming — THE KMV SKETCH MAINTAINED AT INGEST
    * (streaming twin of a17, completing the sketch-serving family
    * st29 quantiles / st30 heavy hitters / st36 bloom / this): the
    * per-type bottom-k user-hash set is carried as ONE update-mode
    * aggregation over [[graft.functions.MinK]] — a SET-semantics
    * mergeable summary, so the raw event firehose needs no distinct
    * pass in front (re-deliveries of a user are absorbed by the
    * buffer, `MinKSpec`'s idempotence law) and state is one ≤ k-item
    * buffer per event type, ingest-rate independent. Each batch
    * upserts the buffer to the serving table; the sample rows and the
    * distinct-count estimate (a17's exact arithmetic) are unpacked ON
    * READ. Because min-k ∘ union is associative, commutative and
    * idempotent, the streamed buffer is BIT-IDENTICAL to the batch
    * order statistic — oracle is a17's verbatim. The sentinel drops
    * on the stateless user_id ≥ 0 front door (no watermark here).
    */
  val st43_stream_kmv_serve: Q = (spark, dir) => {
    val R = graft.operators.Relational
    val k = R.KmvK
    val P = graft.functions.Portable
    val ev = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(col("event_type"), col("user_id"),
        P.hash60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
    val build = ev.groupBy(col("event_type"))
      .agg(graft.functions.MinK.minK(k)(col("h"), col("user_id")).as("s"))
      .select(col("event_type"), col("s.items").as("items"),
        size(col("s.items")).as("n_kept"))
    val served = upsertServe(spark, build, Seq("event_type"), "n_kept")
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    served.select(col("event_type"), posexplode(col("items")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("user_id"), col("col.h").as("h"))
      .withColumn("n_kept", max(col("rank")).over(wt))
      .withColumn("kth", max(col("h")).over(wt))
      .select(col("event_type"), col("rank"), col("user_id"), col("h"),
        when(col("n_kept") < k, col("n_kept")).otherwise(
          floor(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
            col("kth").cast("double"))).as("est_distinct"))
  }

  /** A-family streaming — THE ROBUST OUTLIER GATE AT INGEST
    * (streaming twin of a24, st16/st39's decide-batch-serve-stream
    * discipline): the batch nightly DECIDES the per-type (median,
    * MAD) thresholds — a |types|-row relation — and ingest ENFORCES
    * them FULLY STATELESSLY: one stream-static broadcast join, the
    * deviation and the 3-robust-sigma cross-multiplied compare
    * computed within the row, flagged events append straight through
    * (no state store, no watermark; the sentinel rides `user_id <
    * 0`). A stream cannot know tonight's medians (st16's
    * cannot-know-future reasoning), and an anomaly gate judged
    * against LAST night's baseline is exactly how production
    * monitors run; replaying the corpus the thresholds were decided
    * from proves gate ≡ a24 — the oracle is a24's verbatim.
    */
  val st58_stream_outlier_gate: Q = (spark, dir) => {
    val thr = graft.operators.Relational.madThresholds(spark, dir)
    val ev = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(col("event_id"), col("event_type"),
        graft.Tables.cents(col("value")).cast("long").as("xc"))
    val out = ev.join(broadcast(thr), Seq("event_type"))
      .withColumn("dev", abs(col("xc") - col("med")))
      .where(col("dev") * 10000 > col("mad") * 44478)
      .select(col("event_id"), col("event_type"), col("xc"),
        col("med"), col("mad"), col("dev"))
    Replay.runAppend(spark, out)
  }

  /** T-family streaming — THE WEIGHTED SAMPLE AT INGEST (streaming
    * twin of t28, completing the mergeable-summary serving family
    * st29/st30/st43): the k highest priorities ride ONE bounded
    * [[graft.functions.TopKAggregator]] buffer in a single-group
    * update-mode aggregation — top-k of a union is the top-k of
    * per-partial top-ks (total order (pri desc, id asc), so the
    * streamed buffer is bit-identical to the batch order statistic
    * whatever the merge tree) — and the sample unpacks ON READ
    * (explode + the k-row broadcast weight join, t28's tail). State:
    * ONE ≤k-item buffer, ingest-rate independent; n_seen (exact
    * count) is the upsert's monotone order column. Like st29/st30
    * (and unlike st43's set-semantics MinK), the buffer assumes the
    * replay's exactly-once delivery — an at-least-once upstream
    * would double-insert a re-delivered doc, and the fix is st43's
    * discipline (dedupe on the sampled id inside the buffer).
    * Oracle is t28's verbatim.
    */
  val st57_stream_sample_serve: Q = (spark, dir) => {
    val k = graft.operators.TextAnalysis.WSampleK
    val P = graft.functions.Portable
    val docs = Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"),
        ((col("n_chars").cast("double") * lit(1152921504606846976.0)) /
          (P.hash60(concat(lit("wsample:"), col("doc_id").cast("string"))) + lit(1L))
            .cast("double")).as("pri"))
    val build = docs.groupBy(lit(1L).as("g"))
      .agg(graft.functions.TopK.topK(k)(col("pri"), col("doc_id")).as("tk"),
        count(lit(1)).as("n_seen"))
      .select(col("g"), col("tk.items").as("items"), col("n_seen"))
    val served = upsertServe(spark, build, Seq("g"), "n_seen")
    val sample = served.select(posexplode(col("items")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("doc_id"), col("col.score").as("pri"))
    graft.Tables.documents(spark, dir).select(col("doc_id"), col("n_chars").as("w"))
      .join(broadcast(sample), "doc_id")
      .select(col("rnk"), col("doc_id"), col("w"), col("pri"))
  }

  /** A-family streaming — THE SEASONAL MONITOR AT INGEST (streaming
    * twin of a30, st40's count-at-ingest/judge-on-read taken whole):
    * the ONLY stateful step is one update-mode (type, hour) count —
    * counts are delivery-order free, so the served table equals the
    * batch count relation exactly — and the ENTIRE judgment
    * (24h-shifted self-join, median/MAD thresholds, the robust
    * flags) runs ON READ over the bounded served relation through
    * the shared [[graft.operators.Relational.residualJudge]]. State:
    * one counter per open (type, hour) — dozens of rows,
    * ingest-rate independent. Sentinel pre-filtered (update-mode
    * agg, no watermark). Oracle is a30's verbatim.
    */
  val st66_stream_seasonal_monitor: Q = (spark, dir) => {
    val counts = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val served = upsertServe(spark, counts, Seq("event_type", "hr"), "n")
    graft.operators.Relational.residualJudge(
      served.select(col("event_type"), col("hr"), col("n")))
  }

  /** W-family streaming — THE COMPLETENESS AUDIT OVER INGEST COUNTERS
    * (streaming twin of w10, and st66's second consumer): the SAME
    * served (type, hour) counter table st66 maintains is audited ON
    * READ for silent hours — spine, anti-join and island rollup all
    * run over the bounded served relation via the shared
    * [[graft.operators.Relational.gapIslands]]. One counter table,
    * two read-side verdicts (anomalous hours AND absent hours) — the
    * monitoring pair a production pipeline wants from one piece of
    * state. The spine's span is the batch corpus's (an audit must
    * know the expected range; the stream alone cannot — st16's
    * cannot-know reasoning). Oracle is w10's verbatim.
    */
  val st67_stream_gap_audit: Q = (spark, dir) => {
    val counts = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val served = upsertServe(spark, counts, Seq("event_type", "hr"), "n")
    val ev = graft.Tables.events(spark, dir)
    graft.operators.Relational.gapIslands(
      served.select(col("event_type"), col("hr"), col("n")),
      ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi")),
      ev.select(col("event_type")).distinct())
  }

  /** A-family streaming — THE VALUE HISTOGRAM AT INGEST (streaming
    * twin of a31, st66's count-at-ingest/shape-on-read discipline):
    * the bucket id derives row-locally (integer cents div the pinned
    * width — delivery-order free), ONE update-mode (type, bucket)
    * count is the only stateful step, and the per-mille shares run ON
    * READ over the served bucket relation through the shared
    * [[graft.operators.Relational.histShares]]. State: one counter
    * per occupied (type, bucket) — O(types·buckets), ingest-rate
    * independent. Sentinel pre-filtered (update-mode agg, no
    * watermark). Oracle is a31's verbatim.
    */
  val st68_stream_hist: Q = (spark, dir) => {
    val counts = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(col("event_type"), graft.Tables.cents(col("value")).cast("long").as("c"))
      .select(col("event_type"), expr("(c div 5000) * 5000").as("bucket_lo_cents"))
      .groupBy(col("event_type"), col("bucket_lo_cents"))
      .agg(count(lit(1)).as("n"))
    val served = upsertServe(spark, counts,
      Seq("event_type", "bucket_lo_cents"), "n")
    graft.operators.Relational.histShares(
      served.select(col("event_type"), col("bucket_lo_cents"), col("n")))
  }

  /** A-family streaming — ROLLING Z-FLAGS OVER INGEST COUNTERS
    * (streaming twin of w12, and the (type, hour) counter table's
    * THIRD read-side consumer after st66's seasonal residuals and
    * st67's gap audit): the identical update-mode count is the only
    * stateful step, and the exact-integer rolling-z judgment —
    * (cnt·x−S)² > 9(cnt·Q−S²), no float anywhere — runs ON READ
    * through the shared
    * [[graft.operators.Relational.rollingZJudge]]. One piece of
    * ingest state now feeds three independent monitors — the
    * one-state-many-verdicts economics that make count-at-ingest the
    * right door-side investment. Sentinel pre-filtered. Oracle is
    * w12's verbatim.
    */
  /** T-family streaming — STREAM-MAINTAINED INVERTED INDEX (streaming
    * twin of t36, and [[graft.sinks.BucketedStreamTable]]'s first
    * query-level consumer — the stream-maintains / nightly-compacts
    * split the n22 docstring promises, realized for text): every
    * arriving document explodes into its (token, doc_id, tf) postings
    * WITHIN its micro-batch (a doc's text is one row, so postings
    * never span batches — no cross-batch state, no watermark) and
    * appends into the SAME token-bucketed layout the batch build
    * lands, idempotently by batch id (an at-least-once redelivery
    * re-writes nothing — the commit-marker contract `SinkSpec`
    * kill/resume-locks). The t36 probe then runs ON READ against the
    * maintained catalog table — same bucket pruning, same bounded
    * TopK rank. Oracle is t36's verbatim: stream-maintained must
    * serve exactly what the nightly build serves.
    */
  val st79_stream_postings: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val T = graft.operators.TextAnalysis
    val path = graft.Tables.scratchDir("graft_bkt_spost_")
    val tbl = "graft_spost_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "token")
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"), col("text"))
    val q = docs.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(T.postingsOf(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    T.termProbe(table.read())
  }

  /** D-family streaming — THE SOURCE-OVERLAP MATRIX AT INGEST from
    * BOUNDED per-source KMV sketches (streaming twin of d26's
    * quantities, served sketch-first): each source's state is ONE
    * MinK bottom-k buffer over its distinct shingle hashes (set
    * semantics — repeats and re-deliveries absorb; min-k ∘ union is
    * order-free, idempotent and mergeable), so state is
    * O(|sources| · k) — ingest-rate- and overlap-INDEPENDENT. The r12
    * shape kept one state row per common shingle, which at 100 TB is
    * the overlap itself (two mirrored sources ⇒ corpus-sized state);
    * here the served summaries are k-row regardless, and the ENTIRE
    * pairwise algebra (merge, re-rank, common-survivor count →
    * union/Jaccard/intersection estimates, a39's
    * [[graft.operators.Relational.kmvOverlap]]) plus per-source size
    * estimates and the d26 containment per-milles run ON READ. Exact
    * regime (every source under k distinct shingles) short-circuits
    * to exact counts — the a17/a20x discipline; at scale the exact
    * nightly d26 stays the anchor and this serves the live estimate.
    * Oracle replicates the full hash-derived arithmetic, so the row
    * is hash-checked in EVERY regime, not no_oracle.
    */
  val st83_stream_source_overlap: Q = (spark, dir) => {
    val D = graft.operators.Dedup
    val R = graft.operators.Relational
    val P = graft.functions.Portable
    val k = R.KmvK
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("source"), explode(D.shingles(col("text"))).as("sh"))
      .select(col("source"), P.hash60(concat(lit("sov:"), col("sh"))).as("h"))
    val build = docs.groupBy(col("source"))
      .agg(graft.functions.MinK.minK(k)(col("h"), col("h")).as("s"))
      .select(col("source"), col("s.items").as("items"),
        size(col("s.items")).cast("long").as("n_kept_src"))
    val served = upsertServe(spark, build, Seq("source"), "n_kept_src")
    // per-source set-size estimate from the sketch's own kth order
    // statistic (exact below k — the a17 short-circuit)
    val sz = served.select(col("source"), col("n_kept_src"),
      element_at(col("items"), -1).getField("h").as("kth_s"))
      .select(col("source"),
        when(col("n_kept_src") < k, col("n_kept_src")).otherwise(
          floor(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
            col("kth_s").cast("double")).cast("long")).as("size_est"))
    val pairs = R.kmvOverlap(
      served.select(col("source").as("event_type"),
        explode(col("items")).as("it"))
        .select(col("event_type"), col("it.h").as("h")).distinct())
    pairs
      .select(col("ta").as("src_a"), col("tb").as("src_b"), col("n_kept"),
        col("n_common"), col("union_est"), col("jaccard_pm"),
        col("inter_est"))
      .join(broadcast(sz.select(col("source").as("src_a"),
        col("size_est").as("size_a_est"))), Seq("src_a"))
      .join(broadcast(sz.select(col("source").as("src_b"),
        col("size_est").as("size_b_est"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_kept"), col("n_common"),
        col("union_est"), col("jaccard_pm"), col("inter_est"),
        col("size_a_est"), col("size_b_est"),
        // decimal-promoted per-milles: inter_est · 1000 would overflow
        // long at extreme union estimates (the a42 discipline)
        expr("cast(cast(inter_est as decimal(38,0)) * 1000" +
          " div size_a_est as bigint)").as("contain_a_pm"),
        expr("cast(cast(inter_est as decimal(38,0)) * 1000" +
          " div size_b_est as bigint)").as("contain_b_pm"))
  }

  /** A-family streaming — THE ROLLUP SERVED FROM ITS FINEST GRAIN
    * (streaming twin of a49): grouping sets don't exist in streaming
    * aggregation — and don't need to. The stream maintains ONE
    * update-mode aggregation at the finest (region, nation) grain
    * (orders enrich by a stream-static customer⋈nation⋈region join —
    * stateless; state = |nations| rows), and every coarser grain is
    * DERIVED ON READ by re-aggregating the served table (exact:
    * subtotals of sums are sums — the rollup is a view, not state).
    * Spark's batch ROLLUP over the ≤|nations|-row served relation
    * reproduces a49's grouping-id bitmask bit-for-bit. Oracle is
    * a49's verbatim.
    */
  val st85_stream_rollup_serve: Q = (spark, dir) => {
    val T = graft.Tables
    val dims = T.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(T.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"), col("n_name"))
    val base = Replay.ordersStream(spark, dir)
      .where(col("o_custkey") >= 0)
      .select(col("o_custkey"), T.cents(col("o_totalprice")).cast("long").as("c"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("rev_cents"))
    upsertServe(spark, base, Seq("r_name", "n_name"), "n_orders")
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("rev_cents")).as("rev_cents"),
        grouping_id().cast("long").as("gid"))
  }

  /** T-family streaming — CHAR-ENTROPY SCORING AT INGEST (streaming
    * twin of t37, the st79 pattern for a per-document SCORE): a
    * document is one row, so its entropy is batch-local — the whole
    * t37 computation runs INSIDE each micro-batch (zero cross-batch
    * state, no watermark) and appends idempotently by batch id into a
    * doc_id-bucketed table; a quality gate then reads scores with
    * doc_id bucket pruning for free. Oracle is t37's verbatim: the
    * incrementally-scored table must equal the nightly scan.
    */
  val st84_stream_entropy: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val path = graft.Tables.scratchDir("graft_bkt_sent_")
    val tbl = "graft_sent_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "doc_id")
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"), col("text"))
    val q = docs.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(T.entropyOf(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read().select(col("doc_id"), col("n_chars"), col("n_distinct"),
      col("ent_mn"))
  }

  /** A-family streaming — CHANGEPOINT MONITOR OVER INGEST COUNTERS
    * (streaming twin of a41, the fourth consumer of the
    * count-at-ingest door): ONE update-mode daily-revenue aggregation
    * is the only stateful step (state = |days|, calendar-bounded;
    * per-day sums only GROW as orders arrive, so the upsert order
    * column is monotone by construction), and a41's exact
    * cross-multiplied binary-segmentation scan runs ON READ through
    * the shared [[graft.operators.Relational.changepointScan]] —
    * "did the level shift, and when?" answered from kilobytes of
    * served state instead of a raw-history rescan. Sentinel
    * pre-filtered. Oracle is a41's verbatim.
    */
  val st76_stream_changepoint: Q = (spark, dir) => {
    val daily = Replay.ordersStream(spark, dir)
      .where(col("o_orderkey") >= 0)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(graft.Tables.cents(col("o_totalprice")).cast("long"))
        .as("rev_cents"))
    val served = upsertServe(spark, daily, Seq("dt"), "rev_cents")
    graft.operators.Relational.changepointScan(
      served.select(col("dt"), col("rev_cents")))
  }

  /** W-family streaming — PERIOD-OVER-PERIOD REPORT OVER INGEST
    * COUNTERS (streaming twin of w14, the daily-revenue door's second
    * read-side consumer beside st76 — the one-state-many-verdicts
    * economics yet again): the identical update-mode daily sum is the
    * only stateful step; the WoW/YoY calendar self-joins run ON READ
    * through the shared
    * [[graft.operators.Relational.periodShifts]]. Sentinel
    * pre-filtered. Oracle is w14's verbatim.
    */
  val st77_stream_period_report: Q = (spark, dir) => {
    val daily = Replay.ordersStream(spark, dir)
      .where(col("o_orderkey") >= 0)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(graft.Tables.cents(col("o_totalprice")).cast("long"))
        .as("rev_cents"))
    val served = upsertServe(spark, daily, Seq("dt"), "rev_cents")
    graft.operators.Relational.periodShifts(
      served.select(col("dt"), col("rev_cents")))
  }

  /** W-family streaming — LOCF REPORT OFF THE DAILY-SUMS DOOR
    * (streaming twin of w19, and the third consumer of the served
    * daily-revenue relation st76/st77 maintain): ONE update-mode
    * daily aggregation serves (dt, rev_cents); the calendar densify
    * and last-observation carry run ON READ over the served
    * calendar-bounded table — fill is a VIEW of the door, not state
    * (a late-arriving day's revenue updates its key and every carry
    * derived from it, with nothing to retract). Oracle is w19's
    * verbatim.
    */
  val st86_stream_locf: Q = (spark, dir) => {
    val daily = Replay.ordersStream(spark, dir)
      .where(col("o_orderkey") >= 0)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(graft.Tables.cents(col("o_totalprice")).cast("long"))
        .as("rev_cents"))
    val served = upsertServe(spark, daily, Seq("dt"), "rev_cents")
    graft.operators.Relational.locfFill(
      served.select(col("dt"), col("rev_cents")))
  }

  /** A-family streaming — NEW-vs-RETURNING SPLIT AT INGEST (streaming
    * twin of a50, st83's standing-artifact discipline on the cohort
    * axis): each arriving order classifies against the STANDING
    * cohort relation (the batch min-month per customer) by a
    * stateless stream-static equi-join — a replayed order's verdict
    * equals the batch rule because the standing relation derives from
    * the same corpus the stream replays — then ONE update-mode
    * monthly aggregation maintains the four split sums
    * (calendar-bounded state) and the share derives ON READ. Oracle
    * is a50's verbatim.
    */
  val st88_stream_new_vs_ret: Q = (spark, dir) => {
    val T = graft.Tables
    val cohort = T.orders(spark, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(min(trunc(to_date(col("o_orderdate")), "month")).as("m0"))
    val base = Replay.ordersStream(spark, dir)
      .where(col("o_custkey") >= 0)
      .select(col("o_custkey").as("custkey"),
        trunc(to_date(col("o_orderdate")), "month").as("m"),
        T.cents(col("o_totalprice")).cast("long").as("c"))
      .join(cohort, Seq("custkey"))
      .withColumn("is_new", col("m") === col("m0"))
      .groupBy(date_format(col("m"), "yyyy-MM").as("m"))
      .agg(sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_ret"),
        sum(when(col("is_new"), col("c")).otherwise(0L)).as("rev_new"),
        sum(when(!col("is_new"), col("c")).otherwise(0L)).as("rev_ret"))
    upsertServe(spark, base, Seq("m"), "n_new")
      .select(col("m"), col("n_new"), col("n_ret"), col("rev_new"),
        col("rev_ret"),
        expr("cast(cast(rev_new as decimal(38,0)) * 1000" +
          " div (rev_new + rev_ret) as bigint)").as("new_share_pm"))
  }

  /** MM-family streaming — THE CONSTELLATION FINGERPRINT PROBE AT
    * INGEST (streaming twin of mm13, the Shazam serving shape): each
    * arriving clip-owner document fingerprints STATELESSLY (payload →
    * window-peak series → packed landmark pairs, all row-local inside
    * the array — [[graft.operators.Multimodal.peakSeries]]/`clipPairs`
    * verbatim), probes the STANDING df-capped corpus landmark index by
    * one stream-static equi-join on the hash, and ONE update-mode
    * aggregation counts hits per (clip, candidate, offset) — the
    * count-at-ingest/judge-on-read discipline: the argmax over offsets,
    * the total-hit rollup and the [[graft.operators.Multimodal
    * .FpMinAligned]] threshold all run ON READ through the shared
    * [[graft.operators.Multimodal.fingerprintVerdict]]. Oracle is
    * mm13's verbatim.
    *
    * Scale shape: state is one counter per MATCHED (clip, doc, offset)
    * triple — bounded by |arriving clips| · the df-capped probe
    * fan-out (≤ [[graft.operators.Multimodal.FpDfCap]] per landmark),
    * delta-bounded and corpus-independent; the standing index is the
    * nightly artifact the batch side already prices.
    */
  val st89_stream_fingerprint: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val M = graft.operators.Multimodal
    // stream-static joins re-evaluate the static side per micro-batch:
    // persist the standing index so the corpus decode + df-cap runs
    // once, not once per replay batch (at 100 TB this is the nightly
    // artifact, not a per-batch recompute — the st51 sBuckets note)
    val standing = M.fingerprintIndex(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val series = M.peakSeries(Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0 && col("doc_id") % 17 === 5))
    val hits = M.clipPairs(series)
      .join(standing, Seq("hkey"))
      .select(col("clip_id"), col("doc_id"), (col("f") - col("q")).as("off"))
    val counts = hits
      .groupBy(col("clip_id"), col("doc_id"), col("off"))
      .agg(count(lit(1)).as("n_aligned"))
    M.fingerprintVerdict(
      upsertServe(spark, counts, Seq("clip_id", "doc_id", "off"), "n_aligned"))
  }

  /** N-family streaming — SQ8 QUANTIZED ANN SERVED AT INGEST
    * (streaming twin of n33's ranking leg; the quantized tier of
    * st27/st35's serving family): the standing SQ8 codebook (ONE
    * 64-struct row, trained on the corpus the stream replays) and the
    * encoded query set both broadcast; each arriving vector encodes
    * STATELESSLY (⌊(x−mn)·255/(mx−mn)⌋ per dim riding the scan) and
    * scores every query by the EXACT INTEGER uint8 dot — so state and
    * serving never touch a float — and ONE update-mode aggregation
    * maintains per-query top-K in the bounded [[graft.functions.TopK]]
    * buffer (incremental top-k ≡ batch top-k: take-k of a totally
    * ordered multiset is merge-order-free, the st35 argument). Served
    * exploded as (query, rank, neighbor, dot); oracle is the same
    * ranking derived from n33's CTE chain.
    *
    * Scale shape: state is |queries| buffers of K entries —
    * ingest-rate- and corpus-independent; the codebook artifact is 64
    * structs however large the corpus.
    */
  val st90_stream_sq8_serve: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val S = graft.operators.Similarity
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
    val book = S.sq8Codebook(e)
    val qq = e.where(col("vec_id") < S.NumQueries)
      .join(broadcast(book), lit(true), "inner")
      .select(col("vec_id").as("query_id"), S.sq8Col(col("v")).as("cq"))
    val scored = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .where(col("vec_id") >= 0)
      .select(col("vec_id"), col("embedding").as("v"))
      .join(broadcast(book), lit(true), "inner")
      .select(col("vec_id"), S.sq8Col(col("v")).as("q"))
      .join(broadcast(qq), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        S.sq8Dot(col("cq"), col("q")).cast("double").as("s"))
    val top = scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(S.K)(col("s"), col("vec_id")).as("tk"))
      .select(col("query_id"), col("tk.items").as("items"),
        size(col("tk.items")).cast("long").as("n"))
    upsertServe(spark, top, Seq("query_id"), "n")
      .select(col("query_id"), posexplode(col("items")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("neighbor_id"),
        col("col.score").cast("long").as("dot"))
  }

  /** P-family streaming — THE DISTRIBUTION-DRIFT AUDIT AT INGEST
    * (streaming twin of p25; the data-contract monitor the door
    * consults): arriving documents explode into the SAME per-column
    * long form ([[graft.operators.Relational.driftProfileLongForm]]
    * verbatim) and ONE update-mode aggregation maintains the
    * (column, value) split counters — state bounded by the VALUE
    * DOMAIN (langs × sources × 10 length deciles), never by ingest
    * volume; the per-column totals, floored per-milles, TVD and
    * top-moved value all derive ON READ through the shared
    * [[graft.operators.Relational.driftAuditTail]]. Oracle is p25's
    * verbatim.
    */
  val st91_stream_drift_audit: Q = (spark, dir) => {
    val R = graft.operators.Relational
    val counts = R.driftProfileLongForm(Replay
        .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
        .where(col("doc_id") >= 0))
      .groupBy(col("col_name"), col("value"))
      .agg(sum(when(!col("is_delta"), 1L).otherwise(0L)).as("cnt_s"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("cnt_d"))
    R.driftAuditTail(
      upsertServe(spark, counts, Seq("col_name", "value"), "cnt_s"))
  }

  /** W-family streaming — THE WEEKLY HEATMAP AT INGEST (streaming
    * twin of w20): (dow, hour) derive row-locally at the door, ONE
    * update-mode aggregation maintains the ≤168-cell counts (state
    * bounded by the clock, not the rate), and the share arithmetic
    * runs ON READ against the served total — the a49/w19 discipline:
    * ratios are views of the door, never state. Oracle is w20's
    * verbatim.
    */
  val st87_stream_heatmap: Q = (spark, dir) => {
    val cells = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow1"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n_events"))
    val served = upsertServe(spark, cells, Seq("dow1", "hr"), "n_events")
      .select(col("dow1"), col("hr"), col("n_events"))
    val tot = served.agg(sum(col("n_events")).as("n_total"))
    served.join(broadcast(tot), lit(true), "inner")
      .select(col("dow1"), col("hr"), col("n_events"),
        expr("cast(cast(n_events as decimal(38,0)) * 1000 div n_total" +
          " as bigint)").as("share_pm"))
  }

  val st72_stream_zscore: Q = (spark, dir) => {
    val counts = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val served = upsertServe(spark, counts, Seq("event_type", "hr"), "n")
    graft.operators.Relational.rollingZJudge(
      served.select(col("event_type"), col("hr"), col("n")))
  }

  /** T-family streaming — NORMALIZATION GROUPS AT INGEST (streaming
    * twin of t33): the canonical form and its md5 key derive
    * row-locally at the door (idempotent — re-normalizing a replayed
    * row is a no-op, which is exactly why this transform is safe at
    * ingest); the GROUP SIZE is the one thing a single row cannot
    * know, so one update-mode (norm_hash → count) aggregation is the
    * only stateful step and the per-doc shape joins the served
    * counts ON READ. State: one counter per distinct canonical form
    * (the st11 content-hash-state contract). Sentinel pre-filtered.
    * Oracle is t33's verbatim.
    */
  val st73_stream_norm_groups: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val counts = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(md5(T.normText(col("text"))).as("norm_hash"))
      .groupBy(col("norm_hash")).agg(count(lit(1)).as("n"))
    val served = upsertServe(spark, counts, Seq("norm_hash"), "n")
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        (!(T.normText(col("text")) <=> col("text"))).as("changed"),
        length(col("text")).cast("long").as("len_raw"),
        length(T.normText(col("text"))).cast("long").as("len_norm"),
        md5(T.normText(col("text"))).as("norm_hash"))
      .join(served.select(col("norm_hash"), col("n").as("n_same_norm")),
        Seq("norm_hash"))
      .select(col("doc_id"), col("changed"), col("len_raw"), col("len_norm"),
        col("norm_hash"), col("n_same_norm"))
  }

  /** A-family streaming — SESSION PATHS AT FLUSH TIME (streaming twin
    * of a40, `Pipelines.sessionPaths`): both the step ORDER and the
    * session MEMBERSHIP are retraction-unsafe under eager emission (a
    * late event can re-order the first three steps OR split a session
    * in two), so paths emit only when the watermark closes the user —
    * the st59/st69 machinery with the batch gap rule folded into the
    * sweep. The (path, n_sessions, share) rollup runs ON READ through
    * the shared [[graft.operators.Relational.pathShares]]. State: one
    * capped buffer per user. Oracle is a40's verbatim.
    */
  /** st69/st74 are differentially checked against the UNCAPPED batch
    * sweeps (a35/a40), but `Pipelines.transitionPairs`/`sessionPaths`
    * cap per-user state at [[Pipelines.MaxScdEvents]] and keep the
    * EARLIEST rows when the cap trims — a user past the cap would
    * silently drop its newest events and the differential would
    * mismatch opaquely. So the rate-bound contract the docstrings
    * assume is ASSERTED once per dir (one aggregate over the replayed
    * table, the assertIdHeadroom discipline): if a future fixture
    * breaks the bound, this fails loudly with the hot user's count
    * instead of shipping a hash mismatch. At production scale the cap
    * is the documented degradation, not an error.
    */
  private val rateBoundChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def assertSeqRateBound(spark: SparkSession, dir: String): Unit = {
    rateBoundChecked.computeIfAbsent(dir, _ => {
      val r = graft.Tables.events(spark, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("mx")).head()
      require(r.getLong(0) < Pipelines.MaxScdEvents,
        s"hottest user has ${r.getLong(0)} events >= MaxScdEvents " +
          s"${Pipelines.MaxScdEvents} in $dir: the capped flush buffers " +
          "would trim newest events and diverge from the uncapped batch " +
          "oracles; raise the cap or re-pin the fixture")
      java.lang.Boolean.TRUE
    }): Unit
  }

  /** A-family streaming — THE ORDERED FUNNEL AT FLUSH TIME (streaming
    * twin of a44, `Pipelines.funnelReach`): the strictly-after chain
    * view → click → purchase is retraction-unsafe under eager
    * evaluation (a late-arriving EARLIER view moves the chain's anchor
    * backwards and can only widen later steps — an eager verdict is
    * not monotone), so each user's deepest step emits only when the
    * watermark closes the user; the 3-row conversion rollup (one
    * sum-aggregate over the flushed per-user verdicts, then the shared
    * [[graft.operators.Relational.funnelStack]]) runs ON READ. State:
    * one capped buffer per user — rate-bounded, asserted per dir.
    * Oracle is a44's verbatim.
    */
  val st82_stream_funnel: Q = (spark, dir) => {
    import spark.implicits._
    assertSeqRateBound(spark, dir)
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
        col("event_type").as("etype"), col("ts").as("event_time"))
      .as[graft.streaming.SeqEvent]
    val reach = Replay
      .runAppend(spark, Pipelines.funnelReach(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
    graft.operators.Relational.funnelStack(reach.agg(
      sum(when(col("step_reached") >= 1, 1L).otherwise(0L)).as("nv"),
      sum(when(col("step_reached") >= 2, 1L).otherwise(0L)).as("nc"),
      sum(when(col("step_reached") >= 3, 1L).otherwise(0L)).as("np")))
  }

  val st74_stream_session_paths: Q = (spark, dir) => {
    import spark.implicits._
    assertSeqRateBound(spark, dir)
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
        col("event_type").as("etype"), col("ts").as("event_time"))
      .as[graft.streaming.SeqEvent]
    val paths = Replay
      .runAppend(spark, Pipelines.sessionPaths(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
    graft.operators.Relational.pathShares(paths.select(col("path")))
  }

  /** A-family streaming — KMV OVERLAP ALGEBRA OVER SERVED SKETCHES
    * (streaming twin of a39, and st43's second consumer — the st67
    * one-state-two-verdicts pattern on the sketch family): the SAME
    * per-type MinK buffer st43 maintains at ingest (≤k distinct
    * (h, user) pairs, set semantics — raw re-deliveries absorbed) is
    * read back and the ENTIRE pairwise set-operation algebra (merge,
    * re-rank, common-survivor count, union/Jaccard/intersection
    * estimates) runs ON READ through the shared
    * [[graft.operators.Relational.kmvOverlap]]. This is the mergeable
    * promise made physical: type-level audience overlap from k-row
    * summaries, never the raw user sets. State: one ≤k buffer per
    * type. Sentinel drops on the stateless user_id ≥ 0 door (no
    * watermark). Oracle is a39's verbatim.
    */
  val st70_stream_kmv_overlap: Q = (spark, dir) => {
    val R = graft.operators.Relational
    val P = graft.functions.Portable
    val ev = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(col("event_type"), col("user_id"),
        P.hash60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
    val build = ev.groupBy(col("event_type"))
      .agg(graft.functions.MinK.minK(R.KmvK)(col("h"), col("user_id")).as("s"))
      .select(col("event_type"), col("s.items").as("items"),
        size(col("s.items")).as("n_kept"))
    val served = upsertServe(spark, build, Seq("event_type"), "n_kept")
    R.kmvOverlap(
      served.select(col("event_type"), explode(col("items")).as("it"))
        .select(col("event_type"), col("it.h").as("h")).distinct())
  }

  /** T-family streaming — THE STRATIFIED SAMPLE AT INGEST (streaming
    * twin of t32): per-language state is ONE MinK buffer (the
    * min-wise quota sample — bottom-k of a union is order-free,
    * idempotent, mergeable, so the streamed sample is bit-identical
    * to the batch hash order statistic) plus ONE count (n_stratum,
    * delivery-order free); both ride a single update-mode groupBy.
    * The rank/fraction shape runs ON READ through the shared
    * [[graft.operators.TextAnalysis.stratifiedShape]]. State: ≤quota
    * pairs + one counter per stratum — |languages|-bounded, never
    * corpus-bounded. Sentinel pre-filtered. Oracle is t32's verbatim.
    */
  val st71_stream_stratified: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val P = graft.functions.Portable
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("lang"), col("doc_id"),
        P.hash60(concat(lit("strat:"), col("doc_id").cast("string"))).as("h"))
    val build = docs.groupBy(col("lang"))
      .agg(graft.functions.MinK.minK(T.StratQuota)(col("h"), col("doc_id")).as("s"),
        count(lit(1)).as("n_stratum"))
      .select(col("lang"), col("s.items").as("items"), col("n_stratum"))
    val served = upsertServe(spark, build, Seq("lang"), "n_stratum")
    T.stratifiedShape(
      served.select(col("lang"), col("n_stratum"), explode(col("items")).as("it"))
        .select(col("lang"), col("it.id").as("doc_id"), col("it.h").as("h"),
          col("n_stratum")))
  }

  /** A-family streaming — THE TRANSITION MATRIX AT INGEST (streaming
    * twin of a35): adjacency needs ORDER, and order under disorder
    * means flush-time (`Pipelines.transitionPairs` — the st59
    * machinery applied to consecutive pairs: an eagerly-emitted pair
    * cannot be retracted when a late event lands between its
    * endpoints, so pairs emit only when the watermark closes the
    * user). The matrix rollup — pair counts, row-normalized integer
    * per-mille — runs ON READ over the emitted pairs through the
    * shared [[graft.operators.Relational.transitionMatrix]]. State:
    * one capped event buffer per user, rate-bounded (the st28/st59
    * contract). Oracle is a35's verbatim.
    */
  val st69_stream_transition: Q = (spark, dir) => {
    import spark.implicits._
    assertSeqRateBound(spark, dir)
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
        col("event_type").as("etype"), col("ts").as("event_time"))
      .as[graft.streaming.SeqEvent]
    val pairs = Replay
      .runAppend(spark, Pipelines.transitionPairs(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
    graft.operators.Relational.transitionMatrix(
      pairs.select(col("from_type"), col("to_type")))
  }

  /** J-family streaming — FALLBACK RESOLUTION AT INGEST (streaming
    * twin of j18): last night's rate cards (pair / lang / global —
    * |keys|-row relations) broadcast onto the firehose and every
    * arriving row resolves its most-specific level FULLY STATELESSLY
    * — the config/rate-card lookup as it actually runs in serving.
    * No state, no watermark; sentinel rides `doc_id < 0`. Oracle is
    * j18's verbatim.
    */
  val st64_stream_fallback_resolve: Q = (spark, dir) => {
    val R = graft.operators.Relational
    val arriving = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"), col("lang"), col("source"))
    Replay.runAppend(spark,
      R.fallbackResolve(arriving, R.fallbackCards(spark, dir)))
  }

  /** P-family streaming — THE MASKING POLICY AT INGEST (streaming
    * twin of p18): the policy relation reads once at pipeline build
    * (the same bounded ≤|columns|-row contract) and the masking
    * projection applies row-locally to the firehose — governance
    * enforced AT the door, so nothing downstream ever sees the raw
    * columns. Fully stateless; sentinel pre-filtered. Oracle is
    * p18's verbatim.
    */
  val st65_stream_masking: Q = (spark, dir) => {
    val masked = graft.operators.Relational.maskWith(spark,
      Replay.eventsStream(spark, dir).where(col("user_id") >= 0))
    Replay.runAppend(spark, masked)
  }

  /** W-family streaming — GROWTH ACCOUNTING AT INGEST (streaming twin
    * of w08): per-user FIRST-SEEN day maintained as one update-mode
    * min-aggregation — min is order-free, which is the whole design:
    * a late-delivered EARLIER event must take over a user's first-day
    * (the dropDuplicates/first-arrival formulation silently keeps the
    * wrong day under disorder; min cannot). State: one date per user
    * (rate-bounded entity, the st01 contract); served keyed by user
    * with the NEGATED epoch-day as the monotone upsert order (the
    * first-seen day only ever moves EARLIER, so its negation only
    * ever grows). The growth curve — n_new per first-day, running
    * n_cum — is assembled ON READ over the bounded served table
    * (count at ingest, curve on read; st40's discipline). Sentinel
    * pre-filtered. Oracle is w08's verbatim.
    */
  val st63_stream_first_seen: Q = (spark, dir) => {
    val firstSeen = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
      .select(col("user_id"), col("first_day"),
        (-datediff(col("first_day"), lit("1970-01-01").cast("date")))
          .cast("long").as("neg_epoch_day"))
    val served = upsertServe(spark, firstSeen, Seq("user_id"), "neg_epoch_day")
    val daily = served.groupBy(col("first_day"))
      .agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("first_day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily.withColumn("n_cum", sum(col("n_new")).over(w))
      .select(date_format(col("first_day"), "yyyy-MM-dd").as("dt"),
        col("n_new"), col("n_cum").cast("long").as("n_cum"))
  }

  /** N-family streaming — EMBEDDING CENTERING AT INGEST (streaming
    * twin of n26, st39's decide-batch/apply-stream split): the batch
    * nightly DECIDES the per-dimension mean vector (one 64-double
    * row), and ingest applies it FULLY STATELESSLY — one broadcast
    * of the 1-row means relation, centering and both norms computed
    * within the row. This split is the operator's own correctness
    * rule made physical: index vectors and query vectors MUST be
    * centered by the same means, so the means are an artifact, not
    * a per-batch recomputation. No state, no watermark; sentinel
    * rides `vec_id < 0`. Oracle is n26's verbatim (replaying the
    * corpus the means were decided from).
    */
  val st62_stream_center: Q = (spark, dir) => {
    val S = graft.operators.Similarity
    graft.plans.GraftExtensions.register(spark)
    val batch = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val arriving = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .where(col("vec_id") >= 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    Replay.runAppend(spark, S.centerApply(arriving, S.dimMeans(batch)))
  }

  /** N-family streaming — CO-MOMENT SUFFICIENT STATISTICS AT INGEST
    * (streaming twin of n35; st62's family, one moment higher): each
    * arriving vector laterally expands to its d(d+1)/2 = 2080 index
    * pairs (n35's flatMap-outer-product, stateless) and ONE
    * update-mode aggregation maintains the running integer sums
    * (n, Σxᵢxⱼ, Σxᵢ, Σxⱼ) per pair — count and sums of
    * milli-quantized BIGINTs, all order-free, so the served table is
    * exact under any replay order. State is HARD-BOUNDED at 2080
    * rows (the dimension grid, corpus-independent — the st07
    * ≤|brands| contract, not a rate bound); n_vec strictly grows per
    * key (every vector touches every pair), so it is the monotone
    * upsert order. This is how a whitening/OPQ trainer stays CURRENT
    * against a firehose: the nightly consumes the served sufficient
    * statistics instead of re-scanning the corpus. Sentinel rides
    * `vec_id < 0`. Oracle is n35's verbatim.
    */
  val st92_stream_gram_serve: Q = (spark, dir) => {
    val pairs = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
      .where(col("vec_id") >= 0)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(1000.0))).as("q"))
      .select(col("q"), posexplode(col("q")))
      .select(col("q"), col("pos").as("i"), col("col").as("qi"))
      .select(col("i"), col("qi"), posexplode(col("q")))
      .select(col("i"), col("qi"), col("pos").as("j"), col("col").as("qj"))
      .where(col("j") >= col("i"))
    val agg = pairs
      .groupBy(col("i").cast("long").as("dim_i"),
        col("j").cast("long").as("dim_j"))
      .agg(count(lit(1)).as("n_vec"),
        sum(col("qi") * col("qj")).as("s_ij"),
        sum(col("qi")).as("s_i"),
        sum(col("qj")).as("s_j"))
    upsertServe(spark, agg, Seq("dim_i", "dim_j"), "n_vec")
      .select(col("dim_i"), col("dim_j"), col("n_vec"),
        col("s_ij"), col("s_i"), col("s_j"))
  }

  /** J-family streaming — ORDER-COUNT DISTRIBUTION SERVED FROM ITS
    * FINEST GRAIN (streaming twin of j30, the st85 discipline): the
    * Q13 histogram is a two-level aggregate, and only the FIRST level
    * (per-customer qualifying-order count) is maintained as streaming
    * state — update-mode, one row per customer who has ordered, the
    * standard keyed-agg state shape. The histogram, INCLUDING the
    * zero bucket, is derived ON READ: a static-customer left join
    * coalesces never-ordered customers to count 0, then the ≤dozens-
    * bucket rollup runs over the served table. Maintaining the
    * histogram itself as state would be wrong twice over — a
    * customer's +1 moves it BETWEEN buckets (a non-monotone
    * transition requiring read-modify-write of two rows), and the
    * zero bucket shrinks as silent customers first appear; deriving
    * on read makes both exact for free. Oracle is j30's verbatim.
    */
  val st93_stream_custdist: Q = (spark, dir) => {
    val base = Replay.ordersStream(spark, dir)
      .where(col("o_custkey") >= 0 &&
        col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c_count"))
    val served = upsertServe(spark, base, Seq("o_custkey"), "c_count")
    graft.Tables.customer(spark, dir).select(col("c_custkey"))
      .join(served, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** J-family streaming — THE CORRELATED-AVERAGE GATE SERVED FROM ITS
    * FINEST SUFFICIENT GRAIN (streaming twin of j29): a line's verdict
    * ("below 20% of my part's average quantity") is NON-MONOTONE — it
    * can flip either way as later arrivals move the average — so no
    * at-ingest verdict can be final, and per-line state would be
    * fact-sized. The sufficient statistic is smaller: quantity is a
    * bounded integer domain (1..50), so ONE update-mode aggregation at
    * (part, quantity) grain — n_lines + revenue cents — captures
    * everything the gate needs, with state ∝ |parts|·|qty domain|
    * (dimension-sized, never fact-sized). ON READ, the per-part
    * totals re-derive from the served grain (Σ qty·n, Σ n — sums of
    * sums), the exact-integer gate `qty·cnt·5 < Σqty` re-judges every
    * cell against the FINAL average, and the brand rollup joins the
    * static part dim. Oracle is j29's verbatim — including its
    * correlated-subquery form, so the stream must reproduce the batch
    * de-correlation bit-for-bit.
    */
  val st94_stream_small_qty: Q = (spark, dir) => {
    val T = graft.Tables
    val base = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0)
      .groupBy(col("l_partkey"), col("l_quantity"))
      .agg(count(lit(1)).as("n_lines"),
        sum(T.cents(col("l_extendedprice")).cast("long")).as("rev_cents"))
    val served =
      upsertServe(spark, base, Seq("l_partkey", "l_quantity"), "n_lines")
    val perPart = served.groupBy(col("l_partkey").as("pp"))
      .agg(sum(col("l_quantity") * col("n_lines")).as("sum_qty"),
        sum(col("n_lines")).as("cnt"))
    served.join(perPart, col("l_partkey") === col("pp"))
      .where(col("l_quantity") * col("cnt") * 5 < col("sum_qty"))
      .join(T.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((sum(col("rev_cents")) / 100).as("small_rev"),
        sum(col("n_lines")).as("n_lines"))
  }

  /** W-family streaming — EWMA SERVED FROM STREAMED DAILY SUMS
    * (streaming twin of w21, the st86-on-read discipline): the
    * recurrence itself is the wrong thing to stream — a late-arriving
    * order changes ONE day's sum but EVERY subsequent day's EWMA, so
    * streamed smoothed values could never be final. The stream
    * maintains only the finest additive grain (per priority×day sums,
    * update mode, calendar-bounded state) and the 16-term dyadic
    * smoother — exact in any order, w21's argument — is a VIEW over
    * the served table. Oracle is w21's verbatim.
    */
  val st95_stream_ewma: Q = (spark, dir) => {
    val R = graft.operators.Relational
    val base = Replay.ordersStream(spark, dir)
      .where(col("o_custkey") >= 0)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("dt"))
      .agg(sum(graft.Tables.cents(col("o_totalprice")).cast("long"))
        .as("rev_cents"))
    val served = upsertServe(spark, base, Seq("priority", "dt"), "rev_cents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority")).orderBy(col("dt"))
    val ewma = (0 until R.EwmaDepth).map { i =>
      coalesce(lag(col("rev_cents"), i).over(w), lit(0L)).cast("double") /
        lit(1L << (i + 1))
    }.reduce(_ + _)
    served.select(col("priority"), col("dt"), col("rev_cents"),
      ewma.as("ewma16"))
  }

  /** J-family streaming — THE MONOTONE EXISTS FINALIZED AT INGEST
    * (streaming twin of j34, and the deliberate CONTRAST to st94):
    * "this order has at least one late line" only ever flips
    * false→true as lines arrive — the quantifier is MONOTONE — so the
    * at-ingest verdict IS final and no on-read re-judging is needed
    * (st94's average-gate had to re-judge because its predicate moves
    * both ways). Each arriving line joins the static quarter slice of
    * orders (stream-static inner with the same non-equi lateness
    * residual as the batch semi join), and one update-mode aggregation
    * keyed by order holds the verdict; the per-priority count is a
    * ≤5-group read over the served table. State ∝ orders in the
    * quarter slice with ≥1 late line — the predicate-bounded subset,
    * never the fact. Oracle is j34's correlated EXISTS verbatim.
    */
  val st96_stream_priority_check: Q = (spark, dir) => {
    val o = graft.Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Replay.lineitemStream(spark, dir).where(col("l_partkey") >= 0)
    val late = li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderkey").as("ok"),
        col("o_orderpriority").as("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
    upsertServe(spark, late, Seq("ok"), "n_late")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** J-family streaming — THE REVOCABLE QUANTIFIER (streaming twin of
    * j33, completing the verdict-dynamics trilogy): st96's EXISTS was
    * monotone (verdicts final at ingest), st94's average gate was
    * non-monotone through a dimension-sized statistic — Q21's
    * NOT-EXISTS leg is REVOCABLE through the fact itself: another
    * supplier's late line arriving later REVOKES this supplier's
    * waiting verdict, and a new supplier on the order can CREATE the
    * n_supp ≥ 2 witness. The irreducible sufficient statistic is the
    * per-(order, supplier) lateness flag — no coarser grain can
    * answer "exactly one late supplier" — so that is what the stream
    * maintains (update mode, keyed by the pair, bounded by the
    * completed-order slice's pair count), and BOTH order-level
    * quantifiers plus the supplier rollup are derived on read.
    * Oracle is j33's double-quantifier form verbatim.
    */
  val st97_stream_waiting_supplier: Q = (spark, dir) => {
    val o = graft.Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Replay.lineitemStream(spark, dir).where(col("l_partkey") >= 0)
    val perSupp = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L).otherwise(0L))
        .as("supp_late"))
    val served = upsertServe(spark, perSupp, Seq("ok", "sk"), "supp_late")
    val perOrder = served.groupBy(col("ok").as("ok2"))
      .agg(count(lit(1)).as("n_supp"), sum(col("supp_late")).as("n_late"))
    served.where(col("supp_late") === 1L)
      .join(perOrder, col("ok") === col("ok2"))
      .where(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("sk").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** J-family streaming — THE MONOTONE REVOCATION SET (streaming twin
    * of j31, the fourth verdict dynamic after st96/st94/st97): Q22's
    * "silent customer" verdict is REVOCABLE — an arriving urgent order
    * silences the silence — but the revocation itself is MONOTONE
    * (once revoked, never un-revoked) and the balance threshold is a
    * property of the STATIC dim, fixed for the whole run. So the only
    * state worth keeping is the revocation set: one update-mode row
    * per customer seen with an urgent order (predicate-bounded — the
    * urgent slice, never all orders), and the read side applies the
    * static threshold and SUBTRACTS the revocations (a left_anti
    * against served state — the batch j31's anti-join with the stream
    * as the build side). Oracle is j31's scalar-subquery + NOT EXISTS
    * form verbatim.
    */
  val st98_stream_silent_rich: Q = (spark, dir) => {
    val revoked = Replay.ordersStream(spark, dir)
      .where(col("o_custkey") >= 0 &&
        col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_urgent"))
    val served = upsertServe(spark, revoked, Seq("o_custkey"), "n_urgent")
    val c = graft.Tables.customer(spark, dir)
    val threshold = c.where(col("c_acctbal") > 0)
      .agg(avg(graft.Tables.cents(col("c_acctbal"))).as("avg_cents"))
    c.join(served, c("c_custkey") === served("o_custkey"), "left_anti")
      .join(broadcast(threshold), lit(true))
      .where(graft.Tables.cents(col("c_acctbal")) > col("avg_cents"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("numcust"),
        graft.Tables.moneySum(col("c_acctbal")).as("totacctbal"))
  }

  /** J-family streaming — THE REVOCABLE ARGMAX SERVED FROM SUPPLIER
    * GRAIN (streaming twin of j44/Q15, the st85 finest-grain
    * discipline applied to a leader election): "current top supplier"
    * is REVOCABLE — any micro-batch can crown a different leader and
    * even re-tie the old one — so no at-ingest verdict can stand.
    * The stream maintains only the additive sufficient statistic
    * (per-supplier quarter revenue cents, update mode, predicate-
    * bounded to the quarter slice), and the read side re-runs the
    * batch de-correlation verbatim: broadcast 1-row MAX join-back
    * over the served (supplier-grain) table, static supplier dim
    * after the pick. Oracle is j44's view + scalar-MAX subquery
    * verbatim.
    */
  val st102_stream_top_supplier: Q = (spark, dir) => {
    val T = graft.Tables
    val revs = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0 &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(T.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("long")).as("rev_cents"))
    val served = upsertServe(spark, revs, Seq("l_suppkey"), "rev_cents")
    served.join(
        broadcast(served.agg(max(col("rev_cents")).as("max_cents"))),
        col("rev_cents") === col("max_cents"))
      .join(T.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        (col("rev_cents") / 100).as("total_revenue"))
  }

  /** J-family streaming — MONOTONE THRESHOLD OVER A GROWING
    * ACCUMULATOR (streaming twin of j45/Q18): the VERDICT ("this
    * order exceeds 300 units") is monotone — lines only add — but the
    * READBACK VALUE (the final sum) keeps moving after the crossing,
    * so unlike st96 the at-ingest verdict cannot carry the output:
    * the stream maintains the per-order quantity sum (update mode,
    * keyed by order) and the threshold judges ON READ against the
    * final state, with the orders/customer dims joined at
    * surviving-order grain. State here is order-grain for the replay
    * (every key has a row); at 100 TB the same pipeline bounds it
    * with event-time eviction — an order's ship window closes, the
    * watermark finalizes its sum, and only crossers persist — while
    * the monotone verdict additionally supports an early-alert
    * append stream (fire at first crossing) that this serve table
    * does not need. Oracle is j45's IN (GROUP BY .. HAVING) +
    * correlated-readback form verbatim.
    */
  val st103_stream_large_volume: Q = (spark, dir) => {
    val T = graft.Tables
    val sums = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
    upsertServe(spark, sums, Seq("l_orderkey"), "sum_qty")
      .where(col("sum_qty") > 300)
      .join(T.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_dt"),
        (T.cents(col("o_totalprice")).cast("long") / 100).as("total_price"),
        col("sum_qty"))
  }

  /** J-family streaming — A NON-MONOTONE RATIO OVER A BOUNDED
    * CALENDAR DOMAIN (streaming twin of j43/Q14, st94's
    * dimension-sized-grain discipline at its smallest): the promo
    * share moves both ways with every arrival, but its sufficient
    * statistic is two additive cents-sums per ship month — 12 rows of
    * state for the whole year, SF-invariant — so the stream maintains
    * exactly that grain and the per-mille division happens only on
    * read, against final sums (integer `div`, never a running float
    * ratio whose intermediate values would be unreplayable). Oracle
    * is j43's verbatim.
    */
  val st104_stream_promo_share: Q = (spark, dir) => {
    val T = graft.Tables
    val p = T.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val base = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0 &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).cast("long").as("m"))
      .agg(sum(when(col("p_type") === "PROMO",
        T.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("long")).otherwise(0L)).as("promo_cents"),
        sum(T.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("long")).as("total_cents"))
    upsertServe(spark, base, Seq("m"), "total_cents")
      .select(col("m"), (col("promo_cents") / 100).as("promo_rev"),
        (col("total_cents") / 100).as("total_rev"),
        expr("promo_cents * 1000 div total_cents").as("promo_pm"))
  }

  /** J-family streaming — THE PRICING SUMMARY AS PURE ADDITIVE STATE
    * (streaming twin of j37/Q1): the canonical case where the finest
    * sufficient grain IS the output grain — every Q1 column is either
    * an exact-integer sum (quantity, cents, the 10⁻⁴/10⁻⁶ decimal
    * lanes, the count) or a ratio of two of them, over SIX
    * (returnflag, linestatus) groups. So the streaming state is six
    * rows of decimal-promoted accumulators (update mode — the a48
    * overflow discipline holds under accumulation exactly as it does
    * at rest), and every division — the cents `div`s and the three
    * averages — happens on read against final sums, reproducing
    * j37's arithmetic bit for bit. Oracle is j37's verbatim.
    */
  val st105_stream_pricing: Q = (spark, dir) => {
    val T = graft.Tables
    val e100 = T.cents(col("l_extendedprice")).cast("long")
    val d100 = round(col("l_discount") * 100).cast("long")
    val t100 = round(col("l_tax") * 100).cast("long")
    val base = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0 &&
        col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), e100.as("e100"), d100.as("d100"),
        (e100 * (lit(100L) - d100)).cast("decimal(38,0)").as("disc4"),
        (e100 * (lit(100L) - d100) * (lit(100L) + t100))
          .cast("decimal(38,0)").as("charge6"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(col("disc4")).as("disc_sum"),
        sum(col("charge6")).as("charge_sum"),
        sum(col("e100")).as("se100"),
        sum(col("d100")).as("sd100"),
        count(lit(1)).as("count_order"))
    upsertServe(spark, base, Seq("l_returnflag", "l_linestatus"),
        "count_order")
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("se100") / 100).as("sum_base_price"),
        expr("cast(disc_sum div 100 as bigint)").as("disc_price_cents"),
        expr("cast(charge_sum div 10000 as bigint)").as("charge_cents"),
        (col("sum_qty").cast("double") / col("count_order")).as("avg_qty"),
        ((col("se100").cast("double") / col("count_order")) / 100)
          .as("avg_price"),
        ((col("sd100").cast("double") / col("count_order")) / 100)
          .as("avg_disc"),
        col("count_order"))
  }

  /** MM-family streaming — THE MEDIA GATE AT INGEST (streaming twin
    * of mm08): payload synthesis, fault injection and the ordered
    * header checks are all row-local, so the binary front door runs
    * FULLY STATELESSLY on the firehose — every arriving payload is
    * sniffed, length-checked and size-reconciled within its row and
    * routed with its verdict (the st48 corrupt-routing discipline
    * extended to bytes). No state, no watermark; sentinel rides
    * `doc_id < 0`. Oracle is mm08's verbatim — the construction
    * arithmetic judges what the stream-side parse decided.
    */
  val st61_stream_media_gate: Q = (spark, dir) => {
    val out = graft.operators.Multimodal.mediaGate(
      Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
        .where(col("doc_id") >= 0))
    Replay.runAppend(spark, out)
  }

  /** MM-family streaming — THE RESOLUTION/ASPECT GATE AT INGEST
    * (streaming twin of mm15, st61's stateless-door discipline one
    * stage later): payload synthesis, the header byte-parse and the
    * ordered dimension lanes are all row-local, so every arriving
    * image routes with its verdict inside its own row — no state, no
    * watermark; sentinel rides `doc_id < 0`. Oracle is mm15's
    * construction-mirror verbatim.
    */
  val st106_stream_resolution_gate: Q = (spark, dir) => {
    val out = graft.operators.Multimodal.resolutionGateOf(
      Replay.tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
        .where(col("doc_id") >= 0))
    Replay.runAppend(spark, out)
  }

  /** J-family streaming — ADDITIVE DECIMAL STATE WITH IN-STREAM DIM
    * ENRICHMENT (streaming twin of j48/Q9, st105's pure-additive
    * discipline plus st96's stream-static join): the profit grain
    * (supplier nation × order year) is not on the arriving line, so
    * every micro-batch enriches through THREE static dims before
    * folding — the filtered part slice and supplier⋈nation broadcast,
    * the orders date map persist()-pinned (the stream-static
    * re-evaluation trap: without the pin each micro-batch re-scans
    * the orders parquet). State is 175 rows of decimal(38,0)
    * accumulators in the exact 10⁻⁴ lane; the cents floor happens
    * only on read against final sums. Oracle is j48's verbatim.
    */
  val st107_stream_profit: Q = (spark, dir) => {
    val T = graft.Tables
    val e100 = T.cents(col("l_extendedprice")).cast("long")
    val d100 = round(col("l_discount") * 100).cast("long")
    val r100 = T.cents(col("p_retailprice")).cast("long")
    val oMap = T.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val profits = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0)
      .join(broadcast(T.part(spark, dir)
        .where(col("p_name").startsWith("blue "))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(oMap, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.supplier(spark, dir)
        .join(T.nation(spark, dir),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), col("o_year"),
        (e100 * (lit(100L) - d100) -
          r100 * col("l_quantity").cast("long") * lit(100L))
          .cast("decimal(38,0)").as("profit4"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("profit4")).as("profit4"),
        count(lit(1)).as("n_lines"))
    val served = upsertServe(spark, profits, Seq("n_name", "o_year"),
      "n_lines")
    oMap.unpersist() // upsertServe awaits termination; the serve table owns the rows now
    served.select(col("n_name"), col("o_year"),
      expr("cast(profit4 div 10000 as bigint)").as("profit"))
  }

  /** J-family streaming — THE TWO-ROW CASE-COUNT ACCUMULATOR
    * (streaming twin of j49/Q12, the additive-state discipline at its
    * smallest possible grain): lateness is row-local once the line
    * meets its order header, the priority predicate is a static dim
    * property, and both outputs are plain conditional counts — so the
    * whole query's state is TWO rows of two additive counters, and
    * the read side is the identity. The orders (date, priority) map
    * is persist()-pinned across micro-batches like st107's. Oracle is
    * j49's verbatim.
    */
  val st108_stream_priority_class: Q = (spark, dir) => {
    val T = graft.Tables
    val oMap = T.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = Replay.lineitemStream(spark, dir)
      .where(col("l_partkey") >= 0 &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(oMap, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"),
          "LATE").otherwise("ONTIME").as("lateness"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_high"))
      .groupBy(col("lateness"))
      .agg(sum(when(col("is_high"), 1L).otherwise(0L)).as("high_lines"),
        sum(when(!col("is_high"), 1L).otherwise(0L)).as("low_lines"),
        count(lit(1)).as("n_lines"))
    val served = upsertServe(spark, counts, Seq("lateness"), "n_lines")
    oMap.unpersist()
    served.select(col("lateness"), col("high_lines"), col("low_lines"))
  }

  /** T-family streaming — SPLIT-LEAKAGE AUDIT AT INGEST (streaming
    * twin of t43; the st38/st89/st99 probe-the-standing-index
    * discipline on the decontamination lane): the train split's
    * shingle set signs ONCE into a persisted standing relation (the
    * stream-static re-evaluation trap priced — without the pin every
    * micro-batch re-derives the whole train explode), every arriving
    * document routes by the SAME portable hash split at the door, and
    * each val doc's leakage score is batch-local given the standing
    * set (one explode, one equi-join, one doc rollup inside the
    * micro-batch — zero cross-batch state, the st84 append pattern,
    * idempotent by batch id into a doc_id-bucketed table). This is
    * eval-set integrity AT ARRIVAL: a val document that leaks through
    * boilerplate shared with train is flagged before it ever reaches
    * an eval manifest. Oracle is t43's verbatim.
    */
  val st109_stream_split_leakage: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val T = graft.operators.TextAnalysis
    val trainSh = T.trainShinglesOf(graft.Tables.documents(spark, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val path = graft.Tables.scratchDir("graft_bkt_sleak_")
    val tbl = "graft_sleak_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "doc_id")
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0 && !T.isTrainSplit(col("doc_id")))
      .select(col("doc_id"), col("text"))
    val q = docs.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(T.leakageOf(b, trainSh), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    trainSh.unpersist()
    table.read().select(col("doc_id"), col("n_shingles"), col("n_leaked"),
      col("leak_pm"))
  }

  /** S-family streaming — BINARY OBJECTS AS A STREAMING SOURCE (the
    * watch-folder media ingest: st106's stateless door fed by the
    * `binaryFile` FILE-STREAM source instead of the parquet replay):
    * objects exported one-per-file by [[graft.sinks.Sinks
    * .binaryObjects]] arrive as (path, length, content) rows —
    * `maxFilesPerTrigger` slices the directory into micro-batches
    * (sized so the replay commits a handful of batches, not one per
    * few objects — the first cut at 20 files/trigger spent 10.6 s of
    * its 10.6 s in 25 parquet-sink commits; the incremental-listing
    * contract itself is locked by SinkSpec's restart test, not by
    * batch count) — and every object parses and routes row-locally
    * (key → doc_id, header → dimensions, mm15's ordered lanes). No
    * state, no
    * watermark, no sentinel needed: a stateless append's correctness
    * is per-row. At 100 TB this IS the production shape for media
    * landing zones: listing is incremental (the file-source log
    * remembers seen objects), content IO happens once per object, and
    * everything downstream of the scan is one codegen'd projection.
    * Oracle is s16's construction mirror verbatim.
    */
  val st110_stream_binary_ingest: Q = (spark, dir) => {
    val M = graft.operators.Multimodal
    val path = graft.operators.Relational.binObjectsDir(spark, dir)
    val raw = spark.readStream.format("binaryFile")
      .option("maxFilesPerTrigger", 200)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(path + "/*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length").cast("long").as("byte_len"),
        M.decodeBmp(col("content")).as("dims"))
      .select(col("doc_id"), col("byte_len"),
        col("dims").getField("width").as("width"),
        col("dims").getField("height").as("height"))
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        when(col("width") === 0 || col("height") === 0, "degenerate")
          .when(least(col("width"), col("height")) < 32, "too_small")
          .when(col("width") * lit(1000L) > col("height") * lit(3000L) ||
            col("height") * lit(1000L) > col("width") * lit(3000L),
            "extreme_aspect")
          .otherwise("ok").as("lane"))
    Replay.runAppend(spark, raw)
  }

  /** MM-family streaming — PERCEPTUAL NEAR-DUP AT INGEST (streaming
    * twin of mm10; st38's probe-the-standing-index discipline moved
    * onto the dHash bands): the standing corpus signs ONCE into a
    * banded signature table — dHash's 4×16-bit bands, over-cap band
    * buckets dropped whole ([[graft.operators.Multimodal.PhashBandCap]],
    * counted over the STANDING side: delta rows probe, they never
    * join each other) — and every arriving payload (exact re-uploads
    * and the locally-patched re-uploads mm07's global-mean hash
    * loses) signs in one codegen'd projection and probes the standing
    * bands by equi-join: candidate fan-out is band-bucket density,
    * never corpus². Multi-band hits collapse to one verdict via
    * dropDuplicatesWithinWatermark; verify is the exact popcount over
    * both carried signatures. Flat event time (the st38 contract —
    * the union branches' files replay in arbitrary order, so any
    * id-derived time would mark later branches late and bypass the
    * pair-dedup state). Oracle: mm10's arithmetic restricted to
    * (standing, delta) pairs with the standing-side cap.
    */
  val st75_stream_dhash: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val M = graft.operators.Multimodal
    val sigS = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("standing_id"),
        call_function("dhash64", encode(col("text"), "utf-8")).as("sb"))
      .where(col("sb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandS = sigS
      .select(col("standing_id"), col("sb"), posexplode(col("sb")))
      .select(col("standing_id"), col("sb"), col("pos").as("band_id"),
        col("col").as("band"))
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_id"), col("band"))))
      .where(col("bn") <= M.PhashBandCap)
      .drop("bn")
    def docs() = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id"), encode(col("text"), "utf-8").as("body"))
    val delta = docs().where(col("doc_id") >= 0 && col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("body"))
      .unionAll(docs().where(col("doc_id") >= 0 && col("doc_id") % 10 === 3)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          M.patchedBody(col("body")).as("body")))
    val prepped = delta
      .withColumn("event_time", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withWatermark("event_time", "1 hour")
      .select(col("doc_id").as("delta_id"), col("event_time"),
        call_function("dhash64", col("body")).as("db"))
      .where(col("db").isNotNull)
    val cand = prepped
      .select(col("delta_id"), col("event_time"), col("db"),
        posexplode(col("db")))
      .select(col("delta_id"), col("event_time"), col("db"),
        col("pos").as("band_id"), col("col").as("band"))
      .join(broadcast(bandS), Seq("band_id", "band"))
      .select(col("delta_id"), col("standing_id"), col("event_time"),
        col("db"), col("sb"))
      .dropDuplicatesWithinWatermark("delta_id", "standing_id")
    val out = cand
      .withColumn("hamming", aggregate(
        zip_with(col("sb"), col("db"),
          (x, y) => call_function("bit_count", x.bitwiseXOR(y)).cast("long")),
        lit(0L), (acc, x) => acc + x))
      .where(col("hamming") <= 3)
      .select(col("standing_id").as("doc_a"), col("delta_id").as("doc_b"),
        col("hamming"))
    Replay.runAppend(spark, out)
  }

  /** A-family streaming — THE ROLLING DISTINCT WINDOW AT INGEST
    * (streaming twin of a26, st43's machinery widened to window
    * frames): each arriving event explodes STATELESSLY into the 7
    * window-days it serves (thin rows — hash + id), and ONE
    * update-mode MinK aggregation maintains each window-day's
    * bottom-k. The set semantics do double duty here: they absorb
    * both the raw stream's repeated users AND the explode's overlap
    * (one user active on two days lands twice in a shared window) —
    * so no distinct pass runs anywhere, which is the entire at-scale
    * point (a26's batch form needs two dedup exchanges; ingest gets
    * the same bit-identical buffers with none). State: ≤ k items per
    * OPEN window-day, ingest-rate independent; n_exact is traded
    * away (exact distinct is precisely what a stream cannot keep
    * cheaply — the estimator IS the serving answer), so the oracle
    * is a26's minus its audit column via a thin projection. Sentinel
    * pre-filtered; upsert ordered by n_kept (monotone under set
    * growth).
    */
  val st60_stream_rolling_distinct: Q = (spark, dir) => {
    val k = graft.operators.Relational.KmvK
    val P = graft.functions.Portable
    val ex = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(explode(sequence(to_date(col("ts")),
        date_add(to_date(col("ts")), 6))).as("day"), col("user_id"))
      .select(col("day"), col("user_id"),
        P.hash60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
    val build = ex.groupBy(col("day"))
      .agg(graft.functions.MinK.minK(k)(col("h"), col("user_id")).as("s"))
      .select(col("day"), col("s.items").as("items"),
        size(col("s.items")).as("n_kept"))
    val served = upsertServe(spark, build, Seq("day"), "n_kept")
    val kth = element_at(col("items"), size(col("items"))).getField("h")
    served.select(date_format(col("day"), "yyyy-MM-dd").as("dt"),
      size(col("items")).cast("long").as("n_kept"),
      kth.as("kth"),
      when(size(col("items")) < k, size(col("items")).cast("long"))
        .otherwise(floor(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
          kth.cast("double")).cast("long")).as("est_distinct"))
  }

  /** D-family streaming — PASSAGE SCRUB AT INGEST (streaming twin of
    * d13, st16/st39's decide-batch-serve-stream discipline): the
    * batch nightly DECIDES tonight's boilerplate list — the 60-bit
    * keys of every passage seen in ≥ 2 docs ([[graft.operators.Dedup
    * .boilerplateKeys]]) — and ingest ENFORCES it: each arriving
    * document is segmented, each passage's key probed against the
    * broadcast list, survivors reassembled in order, all WITHIN the
    * row — fully STATELESS (the list rides st34's bounded 1-row
    * stream-static join; no explode, no shuffle, no state store —
    * per-doc rebuild needs no aggregation because a document arrives
    * whole). A stream cannot know tonight's corpus-wide passage
    * frequencies (st16's cannot-know-future reasoning); replaying the
    * corpus the list was decided from proves scrub ≡ d13 exactly —
    * the oracle is d13's verbatim. The probe is TWO-TIER (st34's
    * discipline, in one lambda): the codegen'd Bloom bits answer
    * O(1) per chunk and the linear exact-key scan runs only on
    * probable members — so a false positive costs a scan, never a
    * wrongly scrubbed passage, and the common case never touches the
    * key list (measured 5.1 → 2.8 s at sf0.1). The sentinel's
    * one-token text matches no boilerplate passage; its row drops on
    * the id filter after replay.
    */
  val st42_stream_passage_scrub: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val D = graft.operators.Dedup
    val B = graft.functions.BloomFilters
    val W = D.PassageW
    // the decision artifact carries BOTH tiers: the Bloom bits (O(1)
    // per-chunk front door) and the exact key list (the re-verify tier
    // — a Bloom false positive must not scrub a good passage)
    val bkeys = D.boilerplateKeys(graft.Tables.documents(spark, dir))
      .agg(sort_array(collect_list(col("ck"))).as("bkeys"),
        B.bloom(1 << 17)(col("ck")).as("bf"))
      .select(col("bkeys"), col("bf.bits").as("bits"))
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id"), col("text"))
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val nCh = ceil(size(col("toks")) / lit(W.toDouble)).cast("int")
    val scrubbed = docs
      .join(broadcast(bkeys), lit(true))
      .select(col("doc_id"), toks.as("toks"), col("bkeys"), col("bits"))
      .select(col("doc_id"), transform(sequence(lit(0), nCh - 1),
        i => concat_ws(" ", slice(col("toks"), i * W + 1, lit(W)))).as("chunks"),
        col("bkeys"), col("bits"))
      // hash once per chunk; And short-circuits, so the linear exact
      // scan runs only for chunks the Bloom calls probable (~the true
      // boilerplate rate), not for every chunk of every doc
      .select(col("doc_id"), col("chunks"),
        filter(transform(col("chunks"),
            c => struct(c.as("chunk"), graft.functions.Portable.hash60(c).as("h"))),
          s => !(B.mightContain(col("bits"), s.getField("h")) &&
            array_contains(col("bkeys"), s.getField("h")))).as("kept"))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", transform(col("kept"), s => s.getField("chunk"))).as("clean_text"))
    Replay.runAppend(spark, scrubbed).where(col("doc_id") >= 0)
  }

  /** J-family streaming — BLOOM-PRUNED INGEST (streaming twin of
    * j13): the arriving lineitem firehose probes the broadcast m-bit
    * Bloom summary of the urgent-order keys BEFORE anything else —
    * the front-door prune that, at 100 TB ingest rates, drops ~80 %
    * of the stream at the scan task before any shuffle, state store
    * or sink sees it. Fully STATELESS: the single summary row rides
    * the bounded 1-row stream-static nested-loop join (j13's exact
    * shape, lifted to a micro-batch), survivors re-verify on the
    * exact stream-static equi-join (false positives cost a joined
    * probe, never a wrong row), and each batch appends its per-line
    * net revenue — no watermark, no state. The sentinel's
    * l_orderkey = −1 matches no urgent order and drops in the exact
    * join. Oracle is the row-level exact-join relation, proving the
    * prune is invisible in the result.
    */
  val st34_stream_bloom_prune: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val hot = graft.Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = hot.agg(
      graft.functions.BloomFilters.bloom(1 << 20)(col("o_orderkey")).as("bf"))
    val li = Replay.lineitemStream(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
    val pruned = li
      .join(broadcast(bf),
        graft.functions.BloomFilters.mightContain(col("bf.bits"), col("l_orderkey")))
      .select(li.columns.map(col): _*)
    val out = pruned
      .join(hot, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100) / 100).as("net"))
    Replay.runAppend(spark, out)
  }

  /** J/K-family streaming — THE BLOOM SUMMARY BUILT AT INGEST
    * (completing the j13/st34 trio): the m-bit filter over the
    * urgent-order keys is MAINTAINED INCREMENTALLY as orders arrive —
    * a single running update-mode aggregation whose state is the one
    * 128 KB OR-mergeable buffer (ingest-rate-independent), upserted
    * to the serving table each batch (st14's bit-identical-artifact
    * discipline: because the Bloom merge is order-free, the streamed
    * bits equal the batch-built bits EXACTLY, which `BloomSpec`
    * asserts structurally and the composition proves end-to-end).
    * The served summary then drives j13's pruned join — build the
    * filter on the stream, prune the batch scan with it — and the
    * oracle is j13's, proving a summary built incrementally at
    * ingest is indistinguishable from the nightly batch build. The
    * sentinel's priority "X" fails the stateless pre-filter (no
    * watermark in this pipeline, so no sentinel-starvation trap).
    */
  val st36_stream_bloom_build: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val hotStream = Replay.ordersStream(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val build = hotStream
      .groupBy(lit(1L).as("k"))
      .agg(graft.functions.BloomFilters.bloom(1 << 20)(col("o_orderkey")).as("bf"))
      .select(col("k"), col("bf.bits").as("bits"), col("bf.n_keys").as("n_keys"))
    val served = upsertServe(spark, build, Seq("k"), "n_keys")

    val hot = graft.Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val pruned = li
      .join(broadcast(served.select(col("bits"))),
        graft.functions.BloomFilters.mightContain(col("bits"), col("l_orderkey")))
      .select(li.columns.map(col): _*)
    pruned.join(hot.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        graft.Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** D-family streaming — INCREMENTAL DEDUP AT INGEST (streaming twin
    * of d11): the arriving delta (originals ∪ the same two planted
    * overlap classes, built from the stream itself) is checked
    * against the STANDING corpus's hash projection by a stateless
    * stream-static join (left-outer + null-filter — the anti-join
    * lifted to the micro-batch; the standing side ships hashes only),
    * and the within-delta keeper rule runs as ONE update-mode
    * aggregation per content hash served from the keyed upsert table
    * (min-id keeper + copy count, both monotone under late arrivals —
    * the order-free argument every serving twin rides). State is one
    * row per distinct delta hash — delta-bounded, never
    * standing-corpus-bounded, which is the point: the nightly's
    * standing side stays on disk. The sentinel matches no branch
    * filter (no watermark here, so nothing needs it); its hash can
    * never surface. Oracle is d11's.
    */
  val st37_stream_incremental_dedup: Q = (spark, dir) => {
    val existing = graft.Tables.documents(spark, dir)
      .where(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text"))
    val eh = existing.select(md5(col("text")).as("content_hash")).distinct()
      .withColumn("in_corpus", lit(1))
    def docs() = Replay.tableStream(spark, dir, "documents",
      Replay.documentsSentinel(spark)).select(col("doc_id"), col("text"))
    val delta0 = docs().where(col("doc_id") % 10 === 0)
    val replant = docs().where(col("doc_id") % 10 === 0 && col("doc_id") % 40 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val stale = docs().where(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1
        && col("doc_id") >= 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val agg = delta0.unionAll(replant).unionAll(stale)
      .withColumn("content_hash", md5(col("text")))
      .join(eh, Seq("content_hash"), "left_outer")
      .where(col("in_corpus").isNull)
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
    upsertServe(spark, agg, Seq("content_hash"), "n_copies")
      .select(col("content_hash"), col("keeper_id"), col("n_copies"))
  }

  /** D-family streaming — INCREMENTAL NEAR-DUP AT INGEST (streaming
    * twin of d12, closing the incremental family's last cell): each
    * arriving delta document is shingled, hashed, signed and
    * band-exploded by the SAME codegen'd pipeline
    * ([[graft.operators.Dedup.pickedBandRows]] — every step a
    * stateless projection, so the batch code lifts to micro-batches
    * verbatim), then probes the STANDING corpus's band index by a
    * stream-static equi-join on (band, bkey). A candidate pair that
    * fires on several bands collapses in watermark-scoped dedup
    * state (one entry per surviving pair — delta-bounded; rows emit
    * on first sight, so no flush depends on the sentinel), and the
    * exact-Jaccard ≥ 0.5 verification re-joins the standing hashed
    * shingle sets — static, payload-free. At 100 TB ingest the
    * standing band/signature tables are the materialized artifacts
    * tonight's stream probes; nothing here scans standing text.
    * Oracle is d12's.
    */
  /** T-family streaming — PMI COLLOCATIONS SERVED FROM O(k) SKETCH
    * STATE (streaming twin of t41, built the way st83's rebuild says
    * streamed corpus statistics must be): the naive twin would keep
    * one state row per distinct bigram — corpus-vocabulary-sized, the
    * exact class the r12 verdict flagged. Instead ONE update-mode
    * aggregation per kind (unigram / bigram) holds a Misra-Gries
    * summary of capacity [[StPmiCap]] plus the exact total — state
    * O(k) however large the stream. The fixture's key domain is
    * vocab²-BOUNDED and SF-invariant (31 words, ≤931 distinct bigrams
    * measured at both SFs — scale adds occurrences, not keys), and
    * capacity sits above it, so MG is in its EXACT regime; the regime
    * is WITNESSED on read, not trusted: `n_items` is the exact stream
    * length and every MG eviction strictly decreases Σ est_cnt below
    * it, so Σ est_cnt = n_items per kind proves no eviction ever
    * fired under ANY batch split or merge tree — and then the serve
    * reproduces t41 BIT-FOR-BIT through the full streaming path
    * (micro-batch reduce, state-store merge, upsert serve — the
    * st80/a20x discipline). On an open-vocabulary corpus capacity
    * binds, the witness fails loudly, and the operator is redeployed
    * as approximate heavy collocations with the nightly t41 as anchor
    * (the st29/st30 carve-out class). Oracle is t41's verbatim.
    */
  val st100_stream_pmi: Q = (spark, dir) => {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    def base() = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(toks.as("toks")).where(size(col("toks")) >= 2)
    val uni = base().select(explode(col("toks")).as("key"))
      .select(lit("u").as("kind"), col("key"))
    val bi = base().select(explode(expr(
        "transform(sequence(0, size(toks)-2)," +
          " i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("bg"))
      .select(lit("b").as("kind"),
        concat_ws("", col("bg.w1"), col("bg.w2")).as("key"))
    val agg = uni.unionAll(bi)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("total"),
        graft.functions.HeavyHitters.heavyHitters(StPmiCap)(col("key")).as("s"))
      .select(col("kind"), col("total"),
        col("s.n_items").as("n_items"), col("s.hits").as("hits"))
    val served = upsertServe(spark, agg, Seq("kind"), "total")
    // exact-regime assertion (≤2-row bounded decision read): MG's
    // `n_items` is the EXACT stream length and every eviction strictly
    // decreases Σ est_cnt below it — so Σ est_cnt == n_items per kind
    // is a sound and complete witness that no eviction ever fired and
    // the served counts are exact, whatever the merge tree did
    served.select(col("kind"), col("n_items"),
        expr("aggregate(hits, 0L, (a, h) -> a + h.est_cnt)").as("kept"))
      .head(4).foreach { r =>
        require(r.getLong(2) == r.getLong(1),
          s"MG eviction fired for kind=${r.getString(0)} " +
            s"(kept ${r.getLong(2)} of ${r.getLong(1)}): exact regime " +
            "lost; raise StPmiCap or accept approximate serving with " +
            "t41 as anchor")
      }
    val u = served.where(col("kind") === "u")
      .select(explode(col("hits")).as("h"))
      .select(col("h.item").as("w"), col("h.est_cnt").as("cw"))
    val b = served.where(col("kind") === "b")
      .select(explode(col("hits")).as("h"))
      .select(split(col("h.item"), "").as("ws"),
        col("h.est_cnt").as("cb"))
      .select(element_at(col("ws"), 1).as("w1"),
        element_at(col("ws"), 2).as("w2"), col("cb"))
    val tt = served.where(col("kind") === "u").select(col("total").as("tt"))
    val tb = served.where(col("kind") === "b").select(col("total").as("tb"))
    b.where(col("cb") >= 5)
      .join(u.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(u.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .join(broadcast(tt), lit(true))
      .join(broadcast(tb), lit(true))
      .select(col("w1"), col("w2"), col("cb"), col("c1"), col("c2"),
        (col("cb").cast("double") * col("tt").cast("double")
          * col("tt").cast("double")
          / (col("tb").cast("double") * col("c1").cast("double")
            * col("c2").cast("double"))).as("lift"))
  }

  private val StPmiCap = 4096

  /** MM-family streaming — THE ENTROPY GATE AT INGEST (streaming twin
    * of mm14, st61's stateless-byte-lane discipline): a payload's
    * byte histogram and entropy verdict are ROW-LOCAL, so the
    * opaque/structured routing runs fully statelessly on the firehose
    * — the synthesized opaque cohort included (its md5-chain bytes
    * derive from the arriving row). Per micro-batch the mm12-shaped
    * explode-aggregate histogram is batch-local (doc grain never
    * crosses batches); no state, no watermark. Oracle is mm14's
    * verbatim — the incremental verdicts must equal the nightly scan.
    */
  val st101_stream_entropy_gate: Q = (spark, dir) => {
    val M = graft.operators.Multimodal
    val path = graft.Tables.scratchDir("graft_bkt_pent_")
    val tbl = "graft_pent_" +
      path.split('/').last.replaceAll("[^a-zA-Z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val table = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "doc_id")
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") >= 0)
      .select(col("doc_id"), col("text"))
    val q = docs.writeStream
      .outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        table.append(M.payloadEntropyOf(b), id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read().select(col("doc_id"), col("n_bytes"), col("n_bins"),
      col("ent_mn"), col("is_opaque"))
  }

  /** D-family streaming — THE ESTIMATOR-ERROR MONITOR AT INGEST
    * (streaming twin of d32, on st38's probe-the-standing-bands
    * discipline): every arriving document signs row-locally
    * (codegen'd minhash over its hashed shingles), probes the
    * standing banded signature table, and for each candidate pair
    * emits the signature-agreement ESTIMATE beside the EXACT
    * hashed-shingle Jaccard and the signed error — the live answer to
    * "is the 12-hash signature still good enough on TODAY'S data", so
    * estimator drift (e.g. a new source with systematically shorter
    * docs) is seen at the door, not at the nightly d32. Stateless
    * except the multi-band-hit collapse (delta-pair-bounded
    * dropDuplicatesWithinWatermark, st38's contract); the standing
    * side is hashed ONCE and persisted (stream-static statics
    * re-evaluate per micro-batch — the sBuckets discipline). Oracle:
    * d32's integer arithmetic restricted to (standing, delta) pairs.
    */
  val st99_stream_minhash_error: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val D = graft.operators.Dedup
    val P = graft.functions.Portable
    val seedsCsv = P.xorSeeds.take(D.NumHashes).mkString(",")

    val standing = graft.Tables.documents(spark, dir)
      .where(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text"))
    val hsS = standing.select(col("doc_id"), D.shingles(col("text")).as("shd"))
      .where(size(col("shd")) > 0)
      .select(col("doc_id"), P.hash60Array(col("shd")).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mhS = hsS.select(col("doc_id").as("standing_id"),
      call_function("minhash_mins", col("hs"), lit(seedsCsv)).as("mhb"),
      col("hs").as("shb"))
    val bandsS = D.pickedBandRows(hsS, "doc_id", Nil)
      .select(col("doc_id").as("standing_id"), col("band"), col("bkey"))

    val delta = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") % 10 === 0 && col("doc_id") >= 0)
    val prepped = delta
      .withColumn("event_time", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withWatermark("event_time", "1 hour")
      .select(col("doc_id").as("delta_id"), col("event_time"),
        D.shingles(col("text")).as("shd"))
      .where(size(col("shd")) > 0)
      .select(col("delta_id"), col("event_time"),
        P.hash60Array(col("shd")).as("hs"))
    val cand = D.pickedBandRows(prepped, "delta_id", Seq("event_time", "hs"))
      .join(broadcast(bandsS), Seq("band", "bkey"))
      .select(col("delta_id"), col("standing_id"), col("event_time"), col("hs"))
      .dropDuplicatesWithinWatermark("delta_id", "standing_id")
    val out = cand
      .join(mhS, Seq("standing_id"))
      .select(col("delta_id"), col("standing_id"),
        aggregate(zip_with(
          call_function("minhash_mins", col("hs"), lit(seedsCsv)), col("mhb"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("n_match"),
        size(array_intersect(col("hs"), col("shb"))).cast("long").as("inter"),
        size(array_union(col("hs"), col("shb"))).cast("long").as("uni"))
      .select(col("delta_id"), col("standing_id"), col("n_match"),
        expr(s"n_match * 1000 div ${D.NumHashes}").as("est_pm"),
        expr("inter * 1000 div uni").as("exact_pm"),
        expr(s"n_match * 1000 div ${D.NumHashes} - inter * 1000 div uni")
          .as("err_pm"))
    Replay.runAppend(spark, out)
  }

  val st38_stream_incremental_neardup: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val D = graft.operators.Dedup
    val P = graft.functions.Portable

    val standing = graft.Tables.documents(spark, dir)
      .where(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text"))
    val hsS = standing.select(col("doc_id"), D.shingles(col("text")).as("shd"))
      .where(size(col("shd")) > 0)
      .select(col("doc_id"), P.hash60Array(col("shd")).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandsS = D.pickedBandRows(hsS, "doc_id", Nil)
      .select(col("doc_id").as("standing_id"), col("band"), col("bkey"))

    def docs() = Replay.tableStream(spark, dir, "documents",
      Replay.documentsSentinel(spark)).select(col("doc_id"), col("text"))
    val delta = docs().where(col("doc_id") % 10 === 0)
      .unionAll(docs().where(col("doc_id") % 10 =!= 0 && col("doc_id") % 9 === 2
          && col("doc_id") >= 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          D.dropHead5(col("text")).as("text")))

    // CONSTANT event time for real rows (sentinel far-future): the
    // three union branches' files replay in arbitrary order, so any
    // id-derived time would mark later-branch rows LATE once an
    // earlier batch advanced the watermark — and late rows bypass the
    // pair-dedup state (the documented dropDuplicatesWithinWatermark
    // contract). A flat time keeps every pair deduplicable for the
    // whole replay; state stays delta-pair-bounded either way.
    val flatEventTime = when(col("doc_id") < 0,
      lit("2100-01-01 00:00:00").cast("timestamp"))
      .otherwise(lit("2024-01-01 00:00:00").cast("timestamp"))
    val prepped = delta
      .withColumn("event_time", flatEventTime)
      .withWatermark("event_time", "1 hour")
      .select(col("doc_id").as("delta_id"), col("event_time"),
        D.shingles(col("text")).as("shd"))
      .where(size(col("shd")) > 0)
      .select(col("delta_id"), col("event_time"),
        P.hash60Array(col("shd")).as("hs"))
    val cand = D.pickedBandRows(prepped, "delta_id", Seq("event_time", "hs"))
      .join(broadcast(bandsS), Seq("band", "bkey"))
      .select(col("delta_id"), col("standing_id"), col("event_time"), col("hs"))
      .dropDuplicatesWithinWatermark("delta_id", "standing_id")
    val out = cand
      .join(hsS.select(col("doc_id").as("standing_id"), col("hs").as("shb")),
        Seq("standing_id"))
      .select(col("delta_id"), col("standing_id"),
        (size(array_intersect(col("hs"), col("shb"))).cast("double") /
          size(array_union(col("hs"), col("shb"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= 0.5)
    Replay.runAppend(spark, out)
  }

  /** D-family streaming — SEMANTIC DECONTAMINATION AT INGEST
    * (streaming twin of d10, exactly as st16 serves d08's shingle
    * gate): the arriving embedding corpus (train side ∪ the planted
    * perturbed eval copies) scores against the EVAL SET AS A BROADCAST
    * TABLE — the eval side is bounded by construction (an eval suite,
    * not a corpus), so the gate is a stateless stream-static equi-join
    * on the label bucket + a codegen'd cosine per candidate, no
    * sub-bucket cap needed (d10 caps because its batch side is
    * corpus×corpus; here per-row fan-out is |eval ∩ label|). One
    * windowed aggregation collapses a vector's eval hits to
    * (n_eval_hits, max_cos6) — state one triple per in-flight
    * (window, vector), watermark-evicted. The sentinel passes the
    * watermark node before the join drops it (st16's adjudicated
    * shape), so the final windows flush. Oracle: the same-label
    * train×eval pairs at the threshold — d10's arithmetic WITHOUT the
    * sub split (at sf every cell is under the cap, so the two gates
    * flag identical sets; the spec locks that agreement).
    */
  val st31_stream_semantic_decontam: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val S = graft.operators.Similarity
    val ev = graft.Tables.embeddings(spark, dir)
      .where(col("vec_id") % 20 === 7)
      .select(col("label").as("lb"), col("embedding").as("ve"))
    // one watermark node AFTER the union (st28's adjudicated shape —
    // per-branch watermarks leave two nodes whose min gates the flush)
    def raw() = Replay
      .tableStream(spark, dir, "embeddings", Replay.embeddingsSentinel(spark))
    val natural = raw().where(col("vec_id") % 20 =!= 7)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
    val planted = raw().where(col("vec_id") >= 0 && col("vec_id") % 80 === 7)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("label"),
        concat(array_repeat(lit(0.0f), 8), slice(col("embedding"), 9, 56)).as("v"))
    val hits = natural.unionAll(planted)
      .withColumn("event_time", when(col("vec_id") < 0,
          lit("2100-01-01 00:00:00").cast("timestamp"))
        .otherwise(timestamp_micros(lit(1700000000000000L) +
          (col("vec_id") % 2000000L) * 1000000L)))
      .withWatermark("event_time", "1 hour")
      .join(broadcast(ev), col("label") === col("lb"))
      .select(col("vec_id"), col("label"), col("event_time"),
        S.cos6(col("v"), col("ve")).as("c6"))
      .where(col("c6") >= S.NearDupThreshold)
      .groupBy(window(col("event_time"), "1 hour"), col("vec_id"), col("label"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("c6")).as("max_cos6"))
      .select(col("vec_id"), col("label"), col("n_eval_hits"), col("max_cos6"))
    Replay.runAppend(spark, hits).where(col("vec_id") >= 0)
  }

  /** A-family streaming — HEAVY HITTERS AT INGEST (streaming twin of
    * a15, the trio's last serving leg — st29 serves quantiles, this
    * serves frequent items): the per-event-type Misra-Gries summary of
    * the user_id frequency maintained incrementally in an update-mode
    * streaming aggregation and served from the keyed upsert table; the
    * ≤ k counters ride the served row as an array column and explode
    * ON READ into (event_type, item, est_cnt) rows — the st23/st26
    * division (stream maintains the O(k) summary, serving derives the
    * row shape). State: one ≤ k-counter buffer per event type —
    * key-bounded, never user-bounded; n_items (the summary's exact
    * carried count) is the upsert's monotonic order column. No
    * watermark (update-mode agg, st26's rule) so the sentinel is
    * pre-filtered by id. Merge-tree-dependent like a15 → no oracle;
    * `HeavyHittersSpec` kills and resumes this exact path
    * (upsertServeWith) and asserts exact counts plus the three-clause
    * guarantee against all delivered items.
    */
  val st30_stream_hitters_serve: Q = (spark, dir) => {
    val base = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .groupBy(col("event_type"))
      .agg(graft.functions.HeavyHitters.heavyHitters(16)(col("uid")).as("s"))
      .select(col("event_type"), col("s.n_items").as("n_items"),
        col("s.hits").as("hits"))
    hittersOnRead(upsertServe(spark, base, Seq("event_type"), "n_items"))
  }

  /** st80 — MISRA-GRIES AT INGEST IN ITS EXACT REGIME, hash-oracle-
    * checked (a15x's regime run through the FULL streaming path:
    * micro-batch reduce, state-store merge, upsert serve, read-back):
    * k = 32 counters against a ≤25-user domain (`user_id < 25` —
    * ids are dense from 0, SF-invariant), so capacity never binds
    * under ANY batch/merge tree and the served summary IS the exact
    * per-user count — DuckDB computes it as a plain groupBy. This
    * pins the STREAMED sketch path cross-engine; st30 (k = 16,
    * capacity binding) remains the genuinely merge-dependent residue.
    */
  val st80_stream_hitters_exact: Q = (spark, dir) => {
    val base = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0 && col("user_id") < 25)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .groupBy(col("event_type"))
      .agg(graft.functions.HeavyHitters.heavyHitters(32)(col("uid")).as("s"))
      .select(col("event_type"), col("s.n_items").as("n_items"),
        col("s.hits").as("hits"))
    hittersOnRead(upsertServe(spark, base, Seq("event_type"), "n_items"))
  }

  /** st81 — THE QUANTILE SKETCH AT INGEST IN ITS EXACT REGIME
    * (a14x's no-compaction regime through the full streaming path —
    * capacity 4096 vs the ≤4000-row `event_id < 4000` slice): the
    * served digest holds the exact multiset whatever the micro-batch
    * boundaries were, so finish() degenerates to the plain picked
    * order statistic and a14x's DuckDB twin checks the whole
    * encoder→reduce→state-merge→serve chain bit-for-bit. st29
    * (capacity binding) remains the spec-bounded residue.
    */
  val st81_stream_quantile_exact: Q = (spark, dir) => {
    val base = Replay.eventsStream(spark, dir)
      .where(col("user_id") >= 0 && col("value").isNotNull &&
        col("event_id") < 4000L)
      .groupBy(col("event_type"))
      .agg(graft.functions.QuantileSketch.quantileSketch(4096)(col("value")).as("s"))
      .select(col("event_type"), col("s.n_events").as("n_events"),
        col("s.p50").as("p50"), col("s.p90").as("p90"), col("s.p99").as("p99"))
    upsertServe(spark, base, Seq("event_type"), "n_events")
  }

  /** st30's read-side: explode the served counter arrays into ranked
    * (event_type, item, est_cnt) rows (shared with the restart spec).
    */
  private[graft] def hittersOnRead(served: DataFrame): DataFrame =
    served.select(col("event_type"), col("n_items"),
        explode(col("hits")).as("h"))
      .select(col("event_type"), col("n_items"),
        col("h.item").as("item"), col("h.est_cnt").as("est_cnt"))

  /** N/T-family streaming — HYBRID RETRIEVAL SERVED AT INGEST
    * (streaming twin of n18): every arriving document is scored for
    * BOTH retrieval legs the moment it lands — the lexical BM25
    * against the materialized per-query term model (idf/avgdl trained
    * batch-side, the st18 artifact discipline) and the exact cosine
    * against the broadcast query vectors — and a single update-mode
    * aggregation maintains the per-(query, leg) top-[[
    * graft.operators.Similarity.HybridLegK]] in the keyed upsert
    * table (2·|Q| rows of state, ingest-rate-independent). The RRF
    * fusion derives ON READ over the ≤2·|Q|·50 served rows
    * (st23/st30's subtotals-on-read rule), so the served result IS
    * n18's — the oracle is n18's verbatim.
    *
    * Per-row scoring is fully STATELESS: the ≤|Q|·8-entry term model
    * and the |Q| query vectors ride two bounded 1-row broadcast
    * joins; the per-doc term frequencies come from HOF folds over
    * the doc's own token array (a term absent from the doc
    * contributes floor(0/denom) = 0, so the per-query sum equals the
    * batch side's matched-terms-only sum exactly); the embedding
    * arrives by stream-static equi-join on the id. No watermark: the
    * running aggregation's state is 2·|Q| bounded buffers, and the
    * sentinel (doc_id −1, text "x") matches no term and no embedding
    * row, so it feeds neither leg. The incremental TopK equals the
    * batch TopK because take-k of a totally (score desc, id asc)
    * ordered multiset is merge-order-free — the same argument as
    * st29/st30's sketches, here with NO tree-dependence caveat at
    * all, which is why this twin keeps the full DuckDB oracle.
    */
  val st35_stream_hybrid_serve: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val S = graft.operators.Similarity
    val T = graft.operators.TextAnalysis

    // the lexical query model, materialized once (stream-static
    // frames re-evaluate per micro-batch; the corpus-wide tf pass
    // must not) — tf stays persist()-marked under the caller-clears
    // contract
    val qmDir = graft.Tables.scratchDir("graft_qlex_")
    S.hybridQueryModel(spark, dir).write.mode("overwrite").parquet(qmDir)
    val qarr = spark.read.parquet(qmDir)
      .agg(collect_list(struct(col("query_id"), col("token"),
        col("idf_micro"), col("avgdl"))).as("qarr"))

    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
    val qvArr = e.where(col("vec_id") < S.NumQueries)
      .agg(collect_list(struct(col("vec_id").as("query_id"),
        col("v").as("qv"))).as("qvarr"))

    val docs = Replay.tableStream(spark, dir, "documents",
      Replay.documentsSentinel(spark)).select(col("doc_id"), col("text"))

    val toks = split(col("text"), " ")
    val dlC = size(toks).cast("long")
    // per query term: the doc's tf by an HOF fold over its own tokens
    val perTerm = transform(col("qarr"), e2 =>
      struct(e2.getField("query_id").as("query_id"),
        size(filter(toks, t => t === e2.getField("token"))).cast("long").as("tf"),
        e2.getField("idf_micro").as("idf_micro"),
        e2.getField("avgdl").as("avgdl")))
    // per query: exact micro-unit BM25 total + matched-term count
    val lexPerQ = transform(
      sequence(lit(0L), lit((S.NumQueries - 1).toLong)), q =>
        struct(q.as("query_id"),
          aggregate(filter(col("pt"), p => p.getField("query_id") === q),
            lit(0L), (acc, p) => acc + T.bm25SMicro(p.getField("tf"), dlC,
              p.getField("idf_micro"), p.getField("avgdl"))).as("lex_micro"),
          aggregate(filter(col("pt"), p => p.getField("query_id") === q),
            lit(0L), (acc, p) =>
              acc + when(p.getField("tf") >= 1, lit(1L)).otherwise(lit(0L)))
            .as("n_match")))

    val lex = docs
      .join(broadcast(qarr), lit(true), "inner")
      .withColumn("pt", perTerm)
      .select(col("doc_id"), explode(lexPerQ).as("lq"))
      .where(col("lq.n_match") >= 1 && col("doc_id") =!= col("lq.query_id"))
      .select(col("lq.query_id").as("query_id"), col("doc_id"),
        col("lq.lex_micro").cast("double").as("score"), lit("lex").as("leg"))
    val sem = docs
      .join(e, col("doc_id") === col("vec_id"))
      .join(broadcast(qvArr), lit(true), "inner")
      .select(col("doc_id"), col("v"), explode(col("qvarr")).as("qe"))
      .where(col("doc_id") =!= col("qe.query_id"))
      .select(col("qe.query_id").as("query_id"), col("doc_id"),
        S.cos6(col("qe.qv"), col("v")).as("score"), lit("sem").as("leg"))

    val base = lex.unionAll(sem)
      .groupBy(col("query_id"), col("leg"))
      .agg(graft.functions.TopK.topK(S.HybridLegK)(col("score"), col("doc_id")).as("tk"),
        count(lit(1)).as("n_scored"))
      .select(col("query_id"), col("leg"), col("tk.items").as("items"),
        col("n_scored"))

    hybridServeOnRead(upsertServe(spark, base, Seq("query_id", "leg"), "n_scored"))
  }

  /** st35's read-side: derive per-leg ranks from the served TopK
    * buffers and fuse (shared with the restart spec — the
    * rollupOnRead/hittersOnRead convention).
    */
  private[graft] def hybridServeOnRead(served: DataFrame): DataFrame = {
    val ranked = served
      .select(col("query_id"), col("leg"), posexplode(col("items")))
      .select(col("query_id"), col("leg"), col("col.id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rnk"))
    graft.operators.Similarity.fuseLegs(
      ranked.where(col("leg") === "lex").drop("leg"),
      ranked.where(col("leg") === "sem").drop("leg"))
  }

  /** A-family streaming — REALTIME ORDERED FUNNEL (streaming twin of
    * a09): the event stream feeds [[Pipelines.funnel]]'s per-user state
    * machine (three longs per in-flight user, event-time-timeout
    * eviction); each user's final depth is emitted when the watermark
    * proves their funnel closed, and the post-replay rollup unpivots
    * the cumulative stage counts into a09's exact 3-row table — the
    * oracle IS a09's. Non-funnel event types flow through the machine
    * untouched (no pre-filter: an `event_type IN (...)` predicate
    * before the watermark node would be pushed into the scan and
    * stat-skip the sentinel file — st14's trap); the sentinel's group
    * reaches stage 0 and emits nothing.
    *
    * Scale shape: ONE keyed exchange on user_id into fMGWS state; the
    * rollup reduces to 3 rows. Stage anchors compare in exact
    * microseconds (`unix_micros` — Timestamp.getTime is millis and the
    * comparisons are strict).
    */
  val st20_stream_funnel: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Replay.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("ts").as("event_time"))
      .withWatermark("event_time", "1 hour")
      .as[graft.streaming.FunnelEvent]
    val users = Replay.runAppend(spark, Pipelines.funnel(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
    users.agg(
        coalesce(sum((col("stage") >= 1).cast("long")), lit(0L)).as("n1"),
        coalesce(sum((col("stage") >= 2).cast("long")), lit(0L)).as("n2"),
        coalesce(sum((col("stage") >= 3).cast("long")), lit(0L)).as("n3"))
      .select(explode(array(
        struct(lit("1_signup").as("stage"), col("n1").as("n_users")),
        struct(lit("2_signup_click").as("stage"), col("n2").as("n_users")),
        struct(lit("3_signup_click_purchase").as("stage"), col("n3").as("n_users")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_users").as("n_users"))
  }

  /** A-family streaming — REALTIME RETENTION COHORTS (streaming twin
    * of a10): the event stream feeds [[Pipelines.retention]]'s
    * per-user day-set state; each user's (cohort, active-day) pairs
    * emit when the watermark closes their activity, and the rollup
    * counts each cell — one row per emitted pair per user, so a plain
    * COUNT equals a10's COUNT DISTINCT. The oracle IS a10's. Sentinel:
    * user −1's single pair is filtered after read-back; its far-future
    * event time drives every timeout first.
    */
  val st21_stream_retention: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day"),
        col("ts").as("event_time"))
      .as[graft.streaming.RetEvent]
    val hits = Replay.runAppend(spark, Pipelines.retention(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
    hits.groupBy(
        date_from_unix_date(col("cohort_day")).as("cohort_date"),
        (col("day") - col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** J-family streaming — SCD2 HISTORY AT INGEST (streaming twin of
    * j11): the event stream feeds [[Pipelines.scd2]]'s per-user
    * buffered state; versions emit when the watermark closes each
    * user's history, and the batch side converts the exact-micros
    * bounds back to timestamps. The oracle IS j11's — the streamed
    * history must equal the batch window-pass build row for row.
    */
  val st22_stream_scd2: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("ts").as("event_time"))
      .as[graft.streaming.ScdEvent]
    Replay.runAppend(spark, Pipelines.scd2(ev).toDF(), bigState = true)
      .where(col("user_id") >= 0)
      .select(col("user_id"), col("event_type"), col("version_n"),
        timestamp_micros(col("vf")).as("valid_from"),
        when(col("vt") >= 0, timestamp_micros(col("vt"))).as("valid_to"),
        (col("vt") < 0).as("is_current"))
  }

  /** C-family streaming — DRIFT-GATED ADMISSION AT INGEST (streaming
    * twin of c08, closing the fourth monitor→decide→act loop across
    * modes): the nightly t24 monitors, [[graft.operators.TextAnalysis
    * .driftVerdicts]] DECIDES the tripped (feature, bucket) set, and
    * ingest ACTS on last night's decision (st39's
    * decide-batch-serve-stream discipline — a stream cannot know
    * tonight's corpus totals). FULLY STATELESS, and — unlike the
    * batch act, whose doc verdict is a rollup over the 3-row feature
    * explode — the stream needs NO aggregation at all: the tripped
    * set is ≤|buckets| rows, so each feature's slice broadcasts into
    * its own stream-static LEFT join and the per-doc verdict
    * (`n_trips`, first tripping feature in c03's deterministic-min
    * order, `admitted`) is computed WITHIN the row from the three
    * hit flags. At 100 TB ingest this is the admission front door
    * bolted next to st39's mixture governor: over-crawled buckets of
    * a drifted feature are quarantined at the scan task before any
    * shuffle, state or sink. The sentinel's doc_id = −1 fails the
    * delta predicate at the front door (no watermark anywhere — no
    * starvation trap). Oracle is c08's verbatim: verdicts and bucket
    * arithmetic are deterministic, so the streamed gate must equal
    * the batch act bit-for-bit.
    */
  val st45_stream_drift_gate: Q = (spark, dir) => {
    val T = graft.operators.TextAnalysis
    val tripped = T.driftVerdicts(spark, dir)
      .where(col("drift") && col("over"))
      .select(col("feature"), col("bucket"))
    def leg(f: String) = broadcast(
      tripped.where(col("feature") === f)
        .select(col("bucket").as(s"${f}_bucket"), lit(1L).as(s"${f}_trip")))
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), T.driftLenBucket.as("len_b"),
        col("lang"), col("source"))
    val out = docs
      .join(leg("len"), col("len_b") === col("len_bucket"), "left")
      .join(leg("lang"), col("lang") === col("lang_bucket"), "left")
      .join(leg("source"), col("source") === col("source_bucket"), "left")
      .select(col("doc_id"),
        (coalesce(col("len_trip"), lit(0L)) + coalesce(col("lang_trip"), lit(0L))
          + coalesce(col("source_trip"), lit(0L))).as("n_trips"),
        when(col("lang_trip").isNotNull, "lang")
          .when(col("len_trip").isNotNull, "len")
          .when(col("source_trip").isNotNull, "source").as("trip_feature"))
      .withColumn("admitted", col("n_trips") === 0L)
    Replay.runAppend(spark, out)
  }

  /** A-family streaming — THE CUBE SERVED AT INGEST (streaming twin of
    * a18, extending the st23/st24 serving discipline to the full
    * grouping-set lattice): the stream maintains ONLY the finest
    * (day, event_type) cells in the keyed upsert table (update-mode
    * aggregation, state = |days|·|types| rows, ingest-rate
    * independent; money in integer cents so every later sum is
    * exact), and the ENTIRE lattice — per-day, per-type and grand
    * margins — is derived ON READ by cubing the bounded cell table.
    * Maintaining margins in stream state would write every margin
    * row on every batch (the top cell absorbs every event — a
    * hot-key on the state store); deriving them from dozens of cells
    * costs microseconds. No watermark (update mode), so the sentinel
    * is pre-filtered by id. Oracle is a18's verbatim: lattice-of-sums
    * equals sums-of-lattice because the finest cells partition the
    * input.
    */
  val st46_stream_cube_serve: Q = (spark, dir) => {
    val base = Replay.eventsStream(spark, dir)
      .where(col("event_id") >= 0)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("dt"), col("event_type"),
        col("value"))
      .groupBy(col("dt"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.Tables.cents(col("value"))).as("cents"))
    val cells = upsertServe(spark, base, Seq("dt", "event_type"), "n_events")
    cells.cube(col("dt"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        (sum(col("cents")) / 100).as("total_value"),
        grouping_id().cast("long").as("gid"))
  }

  /** A-family streaming — TIME-DECAYED ENGAGEMENT SERVED AT INGEST
    * (streaming twin of a19): the stream maintains UNDECAYED
    * per-(event_type, age_day) cent totals in the upsert table —
    * decay weights are applied ON READ against the pinned anchor, so
    * state never needs re-aging (storing decayed values would rot:
    * every day that passes would demand a full-state rewrite to the
    * new as-of; storing per-day raw sums makes "as of when" a
    * read-time parameter). State = |types|·|days| rows, ingest-rate
    * independent; the read-back is a |cells|-row stateless projection
    * through a19's exact floor-quantized weight arithmetic. Oracle is
    * a19's verbatim: Σ_day w(day)·Σ_events cents = Σ_events w·cents
    * because the weight is constant within a day cell.
    */
  val st47_stream_decay_serve: Q = (spark, dir) => {
    val anchor = lit(graft.operators.Relational.DecayAnchor).cast("date")
    val base = Replay.eventsStream(spark, dir)
      .where(col("event_id") >= 0)
      .select(col("event_type"),
        datediff(anchor, to_date(col("ts"))).cast("long").as("age_days"),
        graft.Tables.cents(col("value")).cast("long").as("c"))
      .groupBy(col("event_type"), col("age_days"))
      .agg(sum(col("c")).as("cents"), count(lit(1)).as("n"))
    val cells = upsertServe(spark, base, Seq("event_type", "age_days"), "n")
    cells
      .withColumn("w_micro",
        floor(exp(-col("age_days").cast("double") / 30.0) * 1000000).cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("cents") * col("w_micro")).as("decayed_micro_cents"),
        sum(col("n")).as("n_events"))
  }

  /** P-family streaming — CORRUPT-RECORD ROUTING AT INGEST (streaming
    * twin of p14): the PERMISSIVE parse with the corrupt-record
    * capture runs as a stateless per-row projection on the firehose —
    * malformed payloads route to the quarantine lane WITH raw text
    * preserved, parseable rows project their fields, nothing crashes
    * and nothing is dropped. This is the very front of the ingest
    * front door: it runs BEFORE any filter that trusts the payload's
    * shape. No state, no watermark; the sentinel's `{}` props parse
    * clean and its negative id is filtered like every non-delta row
    * would be in downstream consumers — here it simply rides through
    * and is excluded by the deterministic corruption predicate's
    * domain (event_id ≥ 0). Oracle is p14's verbatim.
    */
  val st48_stream_corrupt_route: Q = (spark, dir) => {
    val raw = when(col("event_id") % 11 === 0 && col("event_id") >= 0,
      concat(lit("}"), col("props"))).otherwise(col("props"))
    val out = Replay.eventsStream(spark, dir)
      .where(col("event_id") >= 0)
      .select(col("event_id"), raw.as("raw"))
      .withColumn("p", from_json(col("raw"), "k STRING, _corrupt STRING",
        java.util.Map.of("columnNameOfCorruptRecord", "_corrupt")))
      .select(col("event_id"),
        when(col("p._corrupt").isNull, col("p.k")).as("k"),
        col("p._corrupt").isNotNull.as("quarantined"),
        when(col("p._corrupt").isNotNull, col("raw")).as("raw_payload"))
    Replay.runAppend(spark, out)
  }

  /** D-family streaming — FUZZY MATCH AT INGEST (streaming twin of
    * d15, st38's probe-the-standing-index discipline applied to edit
    * distance): each arriving mutated doc derives its 16-char block
    * key statelessly and probes the STANDING corpus's block index by
    * stream-static equi-join; `levenshtein` verifies each candidate
    * within the bounded 96-char window, all inside the probe row.
    * FULLY STATELESS — one block key per doc means no multi-band
    * duplicate pairs to dedup (contrast st38, whose banded candidates
    * need watermark-scoped pair state), so there is no watermark and
    * no state store: the cost is the probe join plus O(window²) per
    * candidate. The sentinel's negative id fails the delta predicate
    * at the front door. Oracle is d15's candidate arithmetic
    * restricted to standing×arriving pairs.
    */
  val st49_stream_fuzzy_probe: Q = (spark, dir) => {
    val standing = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("doc_a"), substring(col("text"), 1, 16).as("blk"),
        substring(col("text"), 1, 96).as("head_a"))
    val arr = split(col("text"), " ")
    val fuzzed = concat(slice(arr, 1, 7), array(lit("zz")),
      slice(arr, lit(9), greatest(size(arr) - 8, lit(0))))
    val arriving = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_b"),
        array_join(fuzzed, " ").as("text"))
      .select(col("doc_b"), substring(col("text"), 1, 16).as("blk"),
        substring(col("text"), 1, 96).as("head_b"))
    val out = arriving.join(standing, "blk")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("head_a"), col("head_b")).cast("long").as("edit_dist"))
      .where(col("edit_dist") <= 16)
    Replay.runAppend(spark, out)
  }

  /** P-family streaming — CONTRACT MONITOR AT INGEST (streaming twin
    * of p15, minus uniqueness): the four constraints checkable
    * per-row ride ONE update-mode aggregation whose state is a
    * SINGLE row of running violation counters (non-null, enum
    * domain, range as conditional sums; referential integrity as a
    * stateless stream-static anti-join flag folded into the same
    * sums), served from the upsert table and unpivoted on read into
    * p15's report shape. Uniqueness is deliberately absent: exact
    * duplicate detection at ingest needs per-id state — that is
    * st11's TTL'd dedup, not a counter — so its row is the batch
    * battery's alone and the oracle is p15's minus that row. The
    * sentinel's negative id is filtered at the front door.
    */
  val st50_stream_contract_monitor: Q = (spark, dir) => {
    val known = Seq("click", "error", "purchase", "signup", "view")
    val custKeys = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), lit(1L).as("known_user"))
    val base = Replay.eventsStream(spark, dir)
      .where(col("event_id") >= 0)
      .join(broadcast(custKeys), Seq("user_id"), "left")
      .groupBy(lit(1).as("k"))
      .agg(
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("ts_not_null"),
        sum(when(!col("event_type").isin(known: _*), 1L).otherwise(0L))
          .as("event_type_in_enum"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("value_non_negative"),
        sum(when(col("known_user").isNull, 1L).otherwise(0L))
          .as("user_id_in_customer"),
        count(lit(1)).as("n_rows"))
    val served = upsertServe(spark, base, Seq("k"), "n_rows")
    Seq("ts_not_null", "event_type_in_enum", "value_non_negative",
      "user_id_in_customer")
      .map(c => served.select(lit(c).as("constraint_name"),
        col(c).as("n_violations"), (col(c) === 0L).as("passed")))
      .reduce(_ unionAll _)
  }

  /** T-family streaming — THE GOPHER GATE AT INGEST (streaming twin
    * of t27): the published hard-rule battery runs as ONE stateless
    * per-row projection on the document firehose — the quality
    * front-door a crawl pipeline bolts beside st39's mixture governor
    * and st45's drift gate (st51's composition shows where it slots).
    * No joins, no state, no watermark: every rule is per-row exact
    * integer arithmetic shared verbatim with the batch audit
    * ([[graft.operators.TextAnalysis.gopherRules]]), so the appended
    * verdicts equal t27's relation and the oracle is t27's verbatim.
    * The sentinel drops on the id filter after replay.
    */
  val st54_stream_gopher_gate: Q = (spark, dir) => {
    val docs = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id"), col("text"))
    Replay.runAppend(spark,
      graft.operators.TextAnalysis.gopherRules(docs))
      .where(col("doc_id") >= 0)
  }

  /** W-family streaming — OHLC CANDLES SERVED AT INGEST (streaming
    * twin of w05, the st46/st47 finest-grain-state discipline applied
    * to ordered-pick aggregates): the stream maintains per-(series,
    * hour) candles in ONE update-mode aggregation — min_by/max_by
    * under the total (tsu, event_id) order are ORDER-FREE over any
    * delivery interleaving (the pick depends only on the multiset),
    * and high/low/count are plain monotone partials — so the served
    * table equals the batch candle relation exactly and the oracle is
    * w05's verbatim. State = |candles| rows, ingest-rate independent;
    * no watermark (update mode), the sentinel pre-filtered by id.
    */
  val st52_stream_ohlc_serve: Q = (spark, dir) => {
    val ord = struct(col("tsu"), col("event_id"))
    val base = Replay.eventsStream(spark, dir)
      .where(col("event_id") >= 0 && col("value").isNotNull)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        graft.Tables.cents(col("value")).cast("long").as("c"),
        unix_micros(col("ts")).as("tsu"), col("event_id"))
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min_by(col("c"), ord).as("open_cents"),
        max(col("c")).as("high_cents"),
        min(col("c")).as("low_cents"),
        max_by(col("c"), ord).as("close_cents"),
        count(lit(1)).as("n_events"))
    upsertServe(spark, base, Seq("event_type", "hour"), "n_events")
      .select(col("event_type"), col("hour"), col("open_cents"),
        col("high_cents"), col("low_cents"), col("close_cents"),
        col("n_events"))
  }

  /** A-family streaming — THE COUNT-MIN SKETCH MAINTAINED AT INGEST
    * (streaming twin of a23, the st36 bit-identical-artifact
    * discipline on the counter grid): the d×w counter table is ONE
    * update-mode aggregation keyed (r, bucket) — counts are additive
    * and the grid is FIXED, so state is ≤ d·w rows regardless of
    * ingest rate, and because CMS is merge-order free the streamed
    * sketch equals the batch sketch EXACTLY: point estimates read
    * from the served grid hash-match a23's oracle verbatim, no
    * carve-out. The probe set + exact audit ride the batch side on
    * read (count at ingest, estimate on read).
    */
  val st53_stream_cms_serve: Q = (spark, dir) => {
    val R = graft.operators.Relational
    val P = graft.functions.Portable
    val h = P.hash60(concat(lit("cms:"), col("user_id").cast("string")))
    val rows = (0 until R.CmsDepth).map(r =>
      struct(lit(r.toLong).as("r"),
        pmod(P.xorMix(r, h), lit(R.CmsWidth)).as("bucket")))
    val build = Replay.eventsStream(spark, dir)
      .where(col("event_id") >= 0)
      .select(col("user_id"), explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cms = upsertServe(spark, build, Seq("r", "bucket"), "cnt")
    val probes = graft.Tables.customer(spark, dir)
      .where(col("c_custkey") % 50 === 0)
      .select(col("c_custkey").as("user_id"))
    val ph = P.hash60(concat(lit("cms:"), col("user_id").cast("string")))
    val probeRows = probes.select(col("user_id"),
      explode(array((0 until R.CmsDepth).map(r =>
        struct(lit(r.toLong).as("r"),
          pmod(P.xorMix(r, ph), lit(R.CmsWidth)).as("bucket"))): _*)).as("rb"))
      .select(col("user_id"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val est = probeRows.join(cms, Seq("r", "bucket"), "left")
      .groupBy(col("user_id"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
    val exact = graft.Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        col("est_cnt"),
        (col("est_cnt") - coalesce(col("exact_cnt"), lit(0L))).as("overcount"))
  }

  /** st51 — THE COMPOSED INGEST FRONT DOOR: ONE streaming pipeline
    * chaining the proven admission gates in c06's order — the
    * streaming twin of `c06_incremental_manifest`'s front half and
    * the at-scale EP1 (the reference's door is
    * ods/KafkaToODS_M.scala:45-74 — nine separate jobs; ours is one
    * pipeline). Each arriving delta document flows through, IN ORDER:
    *
    *   1. CORRUPT ROUTE (st48's discipline): a planted metadata
    *      corruption (`n_chars = −1` on every 13th delta id) routes
    *      the row to the 'corrupt' lane with nothing dropped — the
    *      very front, before any gate that trusts the row's shape.
    *   1b. PII LANE (t29's patterns at the door, round-10
    *      composition): docs carrying an email or IPv4 match route
    *      'pii' — quarantine-for-redaction rather than in-door
    *      rewrite, because a scrub that rewrites text here would
    *      change the content hash and break the dedup gate's
    *      standing-corpus compare (the door hashes what arrived);
    *      the redaction replay that re-admits the lane is t29's job,
    *      closing the p14 → p16 dead-letter loop for PII. The
    *      fixture plants t29's deterministic emails/IPs into the
    *      arriving delta.
    *   2. MIXTURE GOVERNOR (st39): last night's `mixtureRates`
    *      decision broadcasts onto the scan; a doc whose keyed hash
    *      falls outside its domain's rate lanes 'mixture'.
    *   3. DRIFT GATE (st45 + c06's circuit breaker): the tripped
    *      (feature, bucket) set rides three broadcast legs; the
    *      breaker verdict (refusal share vs [[graft.operators
    *      .Curation.DriftRefuseCapPct]], decided over the NIGHTLY
    *      delta — a stream cannot know tonight's totals) arms or
    *      disarms the whole gate. On the driver fixture the delta is
    *      a total source shift, so the breaker disarms and the leg
    *      joins run armed=false (the selective path is spec-proven in
    *      `CurationSpec` on a partial-shift corpus).
    *   4. DEDUP ADMISSION, TWO-TIER (st34's bloom front + st37's
    *      exact rule): the standing corpus's content hashes ride BOTH
    *      a broadcast Bloom summary (the O(1) in-row front door — no
    *      false negatives, so a negative skips the exact tier
    *      entirely; at 100 TB that is what keeps the shuffled
    *      standing-side probe off ~all-unique traffic) and the exact
    *      stream-static hash join (the authority — a Bloom false
    *      positive costs a probe, never a wrong lane). Standing dups
    *      lane 'dup'.
    *   5. PASSAGE SCRUB (st42, survivors only): the nightly
    *      boilerplate list scrubs each admitted doc's ≥2-doc passages
    *      in-row through the same two-tier Bloom+exact probe.
    *   6. MEDIA BYTE GATE (mm08 ∘ st61): the payload constructed from
    *      what arrived is genuinely PARSED (length sniff, magic,
    *      declared-vs-actual size — ordered so no branch reads bytes a
    *      prior branch hasn't proven present); corrupt bytes lane
    *      'media_truncated' / 'media_bad_magic' / 'media_size_mismatch'.
    *   7. PERCEPTUAL DEDUP (mm10 ∘ c10, the media admission capstone
    *      IN the door): the arriving dHash probes the STANDING
    *      corpus's banded signature buckets (capped, mm10's LSH
    *      discipline) via FOUR unique-keyed stream-static left joins —
    *      one per band, against one row per bucket — so the stream
    *      never needs a regroup; an exact hamming ≤ 3 verify against
    *      the ≤cap bucket members lanes 'media_dup'. The fixture
    *      plants locally-EDITED re-uploads (+4M: middle tenth
    *      uppercased — byte-local, so dHash holds while md5 escapes
    *      the exact gate) — the edited-re-upload traffic that
    *      dominates media dedup at 100 TB.
    *
    * Gates 1-7 are ALL stateless and ride ONE scan — broadcast joins
    * + per-row expressions; the single stateful step is the final
    * update-mode aggregation keyed (lane, content_hash): d11's
    * min-id keeper + copy count per lane, served from the keyed
    * upsert table (delta-bounded state; the scrubbed text rides the
    * group key, which is sound because content_hash determines it).
    * The per-lane row counts read off the served table ARE st50's
    * contract counters — the monitor comes free with the serving
    * artifact. The sentinel's negative id fails every delta branch
    * predicate at the front (no watermark anywhere — no starvation
    * trap). The oracle chains the existing gate CTEs (mixture rates,
    * drift verdicts + breaker, standing hashes, boilerplate keys)
    * over the same delta, so the differential proves the WHOLE door
    * end-to-end; `StateCapSpec` kills and resumes it mid-stream.
    */
  val st51_stream_front_door: Q = (spark, dir) =>
    frontDoorServe(spark, dir, graft.Tables.scratchDir("graft_fd_"),
      new graft.sinks.KeyedUpsertTable(
        spark, graft.Tables.scratchDir("graft_upsert_"),
        Seq("lane", "content_hash", "clean_text"), "n_copies"))

  /** st51's pipeline against an explicit table + checkpoint, so the
    * kill/resume spec drives the exact production path.
    */
  /** st51's fixture cohort of locally-EDITED media re-uploads: the
    * middle tenth of the characters uppercased (+4M ids) — a byte-local
    * edit (letters shift −32, non-letters unchanged), so the dHash
    * partner stays inside the hamming-3 pigeonhole while the md5
    * changes (escapes the exact-dup gate) — mm10's patch fixture moved
    * onto text. Bodies shorter than 10 chars pass through unedited
    * (the mm10 patch floor; the DuckDB twin mirrors the CASE).
    */
  private[graft] def mediaEditText(text: Column): Column = {
    val n = length(text)
    val off = (n / 2).cast("int")
    val len1 = (n / 10).cast("int")
    when(n >= 10, concat(
      text.substr(lit(1), off - 1),
      upper(text.substr(off, len1)),
      text.substr(off + len1, n - off - len1 + 1)))
      .otherwise(text)
  }

  private[graft] def frontDoorServe(spark: SparkSession, dir: String,
                                    cp: String,
                                    table: graft.sinks.KeyedUpsertTable): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val T = graft.operators.TextAnalysis
    val D = graft.operators.Dedup
    val M = graft.operators.Multimodal
    val B = graft.functions.BloomFilters
    val P = graft.functions.Portable
    val W = D.PassageW
    val pay = Seq("text", "lang", "n_chars", "source").map(col)

    // ---- last night's decisions (batch-derived, all broadcast) ----
    // r18 (the sBuckets note generalized, guide §5): stream-static
    // joins re-evaluate the static side EVERY micro-batch, so each of
    // these nightly artifacts — the t19 mixture rollup, the t24 drift
    // verdicts (feeding three broadcast legs), the standing hash set +
    // its Bloom, the boilerplate keys — was re-derived from the corpus
    // once per batch. persist() each once-per-run artifact; at 100 TB
    // these are nightly batch outputs, not per-batch recomputes.
    val rates = T.mixtureRates(spark, dir).persist()
    val tripped = T.driftVerdicts(spark, dir)
      .where(col("drift") && col("over"))
      .select(col("feature"), col("bucket"))
      .persist()
    val docsB = graft.Tables.documents(spark, dir)
      .select(col("doc_id") +: pay: _*)
    val standingB = docsB.where(col("doc_id") % 10 =!= 0)
    val deltaB = docsB.where(col("doc_id") % 10 === 0)
      .unionAll(docsB.where(col("doc_id") % 10 === 0 && col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id") +: pay: _*))
      .unionAll(standingB.where(col("doc_id") % 7 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id") +: pay: _*))
      .unionAll(standingB.where(col("doc_id") % 10 === 4)
        .select(Seq((col("doc_id") + 4000000L).as("doc_id"),
          mediaEditText(col("text")).as("text")) ++
          Seq("lang", "n_chars", "source").map(col): _*))
    val nQuar = T.driftFeatures(
        deltaB.select(col("doc_id"), col("lang"), col("n_chars"), col("source")))
      .join(broadcast(tripped), Seq("feature", "bucket"))
      .select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_quar"))
    val armedRel = nQuar
      .join(deltaB.agg(count(lit(1)).as("n_delta")), lit(true), "left")
      .select((col("n_quar") * 100 <=
        col("n_delta") * graft.operators.Curation.DriftRefuseCapPct).as("armed"))
    val ehB = standingB.select(md5(col("text")).as("content_hash")).distinct()
      .persist()
    val ebf = ehB
      .agg(B.bloom(1 << 20)(P.hash60(col("content_hash"))).as("bf"))
      .select(col("bf.bits").as("ebits"))
    val bkeys = D.boilerplateKeys(graft.Tables.documents(spark, dir))
      .agg(sort_array(collect_list(col("ck"))).as("bkeys"),
        B.bloom(1 << 17)(col("ck")).as("bbf"))
      .select(col("bkeys"), col("bbf.bits").as("bbits"))
    val oneRow = armedRel
      .join(ebf, lit(true), "left")
      .join(bkeys, lit(true), "left")
      .persist()
    // gates 6-7's standing artifact: the corpus's perceptual dHash
    // signatures, banded and capped (mm10's LSH discipline — over-cap
    // buckets dropped whole, so every bucket list is ≤ PhashBandCap
    // structs). Grouped per (band_id, band) into ONE row per bucket:
    // the arriving side left-joins each of its 4 band values against a
    // UNIQUE-KEYED relation, so the stream keeps exactly one row per
    // doc (no stream-side regroup — the door's single stateful step
    // stays the final rollup). persist(): the stream replays
    // micro-batches and stream-static joins re-evaluate the static
    // side each batch; at 100 TB this relation is the nightly
    // signature artifact, not a per-batch recompute.
    val sBuckets = standingB
      .select(col("doc_id").as("sid"),
        call_function("dhash64", encode(col("text"), "utf-8")).as("sbands"))
      .where(col("sbands").isNotNull)
      .select(col("sid"), col("sbands"), posexplode(col("sbands")))
      .groupBy(col("pos"), col("col"))
      .agg(collect_list(struct(col("sid"), col("sbands"))).as("cands"))
      .where(size(col("cands")) <= M.PhashBandCap)
      .persist()
    def bk(i: Int) = sBuckets.where(col("pos") === i)
      .select(col("col").as(s"band_$i"), col("cands").as(s"cands_$i"))

    // ---- the firehose: the d11/c06 delta built from the stream ----
    def docs() = Replay
      .tableStream(spark, dir, "documents", Replay.documentsSentinel(spark))
      .select(col("doc_id") +: pay: _*)
    val delta0 = docs().where(col("doc_id") % 10 === 0)
    val replant = docs()
      .where(col("doc_id") % 10 === 0 && col("doc_id") % 40 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id") +: pay: _*)
    val stale = docs()
      .where(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1
        && col("doc_id") >= 0)
      .select((col("doc_id") + 2000000L).as("doc_id") +: pay: _*)
    val mediaRe = docs() // the locally-edited media re-uploads (gate 7)
      .where(col("doc_id") % 10 === 4 && col("doc_id") >= 0)
      .select(Seq((col("doc_id") + 4000000L).as("doc_id"),
        mediaEditText(col("text")).as("text")) ++
        Seq("lang", "n_chars", "source").map(col): _*)
    val arriving = delta0.unionAll(replant).unionAll(stale).unionAll(mediaRe)
      .withColumn("n_chars", // the planted metadata corruption (gate 1)
        when(pmod(col("doc_id"), lit(13L)) === 3, lit(-1L))
          .otherwise(col("n_chars")))
      .withColumn("text", // planted PII (gate 2 — t29's fixture at the door)
        concat(col("text"),
          when(pmod(col("doc_id"), lit(19L)) === 6,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(23L)) === 7,
            concat(lit(" from 10."), pmod(col("doc_id"), lit(256L)), lit(".0.1")))
            .otherwise(lit(""))))

    // ---- gates 1-5, one scan, all stateless ----
    def leg(f: String) = broadcast(tripped.where(col("feature") === f)
      .select(col("bucket").as(s"${f}_bucket"), lit(1L).as(s"${f}_trip")))
    val mixH = pmod(
      P.hash60(concat(lit("mix:"), col("doc_id").cast("string"))), lit(10000L))
    val bloomDup = B.mightContain(col("ebits"), P.hash60(col("content_hash")))
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val scrubbed = concat_ws(" ", transform(
      filter(transform(col("chunks"),
          c => struct(c.as("chunk"), P.hash60(c).as("h"))),
        s => !(B.mightContain(col("bbits"), s.getField("h")) &&
          array_contains(col("bkeys"), s.getField("h")))),
      s => s.getField("chunk")))
    val laned = arriving
      .join(broadcast(rates), Seq("lang", "source"), "left")
      .withColumn("len_b", T.driftLenBucket)
      .join(leg("len"), col("len_b") === col("len_bucket"), "left")
      .join(leg("lang"), col("lang") === col("lang_bucket"), "left")
      .join(leg("source"), col("source") === col("source_bucket"), "left")
      .join(broadcast(oneRow), lit(true), "left")
      .withColumn("content_hash", md5(col("text")))
      .join(ehB.withColumn("in_corpus", lit(1)), Seq("content_hash"), "left")
      // gates 6-7 inputs: the media payload constructed+corrupted from
      // what arrived (mm08's fixture at the door — parse-based verdict
      // below), and the arriving perceptual signature probing the
      // standing buckets by 4 unique-keyed left joins (one per band —
      // no explode, so no stream-side regroup is ever needed)
      .withColumn("payload",
        M.corruptPayload(col("doc_id"), M.payloadCol(col("text"))))
      .withColumn("media_lane", M.mediaByteLane(col("payload")))
      .withColumn("bands",
        call_function("dhash64", encode(col("text"), "utf-8")))
      .join(bk(0), element_at(col("bands"), 1) === col("band_0"), "left")
      .join(bk(1), element_at(col("bands"), 2) === col("band_1"), "left")
      .join(bk(2), element_at(col("bands"), 3) === col("band_2"), "left")
      .join(bk(3), element_at(col("bands"), 4) === col("band_3"), "left")
      .withColumn("media_dup", {
        def ham(c: Column) = aggregate(
          zip_with(col("bands"), c.getField("sbands"),
            (x, y) => call_function("bit_count", x.bitwiseXOR(y)).cast("long")),
          lit(0L), (acc, x) => acc + x)
        def hitIn(i: Int) = col(s"cands_$i").isNotNull &&
          exists(col(s"cands_$i"), c => ham(c) <= 3)
        col("bands").isNotNull &&
          (hitIn(0) || hitIn(1) || hitIn(2) || hitIn(3))
      })
      .withColumn("mix_pass",
        col("rate_micro").isNotNull && mixH < col("rate_micro"))
      .withColumn("n_trips", when(col("armed"),
        coalesce(col("len_trip"), lit(0L)) + coalesce(col("lang_trip"), lit(0L))
          + coalesce(col("source_trip"), lit(0L))).otherwise(lit(0L)))
      .withColumn("lane",
        when(col("n_chars") < 0, "corrupt")
          .when(regexp_count(col("text"), lit(T.EmailRe)) +
            regexp_count(col("text"), lit(T.Ipv4Re)) > 0, "pii")
          .when(!col("mix_pass"), "mixture")
          .when(col("n_trips") > 0, "drift")
          .when(bloomDup && col("in_corpus").isNotNull, "dup")
          // c10 composed in: byte verdict first (cheap, ordered), then
          // the perceptual keeper rule — text verdicts take precedence
          .when(col("media_lane") =!= "ok",
            concat(lit("media_"), col("media_lane")))
          .when(col("media_dup"), "media_dup")
          .otherwise("admitted"))
      .withColumn("toks", toks)
      .withColumn("chunks", transform(
        sequence(lit(0), ceil(size(col("toks")) / lit(W.toDouble)).cast("int") - 1),
        i => concat_ws(" ", slice(col("toks"), i * W + 1, lit(W)))))
      .withColumn("clean_text",
        when(col("lane") === "admitted", scrubbed).otherwise(lit("")))

    // ---- the ONE stateful step: per-(lane, hash) keeper rollup ----
    upsertServeWith(spark, frontDoorAgg(laned), table, cp)
      .select(col("lane"), col("content_hash"), col("keeper_id"),
        col("n_copies"), col("clean_text"))
  }

  /** st51's stateful tail over any laned (doc_id, lane, content_hash,
    * clean_text) relation — factored so the kill/resume spec drives
    * the exact production aggregation through the exact serving
    * writer. Both aggregates are order-free (min monotone, count
    * additive), the restart-safety argument every serving twin rides.
    */
  private[graft] def frontDoorAgg(laned: DataFrame): DataFrame =
    laned
      .groupBy(col("lane"), col("content_hash"), col("clean_text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** §2.10 on the NEW stateful API — per-user lifetime profile via
    * `transformWithState` ([[Tws.UserProfileProcessor]]: ValueState
    * accumulators + MapState per-type counts, the reference's per-key
    * Redis hash re-expressed on Spark 4's arbitrary-state surface).
    * Each batch emits the touched keys' CUMULATIVE profiles in update
    * mode; the KeyedUpsertTable keeps the last, so the final row per
    * user equals the full-corpus profile under any micro-batch
    * slicing (the st07 upsert-last discipline). RocksDB provider is a
    * transformWithState requirement, not a choice. The DuckDB oracle
    * is the plain GROUP BY — the differential proves the incremental
    * state machine converges to the batch aggregate.
    */
  val st111_tws_profile: Q = (spark, dir) => {
    import spark.implicits._
    Replay.stateProvider(spark, bigState = true)
    val events = Replay.eventsStream(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_type"),
        graft.Tables.cents(col("value")).cast("long").as("cents"))
      .as[Tws.ProfileEvent]
    val profiles = events.groupByKey(_.user_id)
      .transformWithState(new Tws.UserProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val table = new graft.sinks.KeyedUpsertTable(spark,
      graft.Tables.scratchDir("graft_twsprof_"), Seq("user_id"), "user_id")
    val q = profiles.toDF().writeStream
      .outputMode("update")
      .foreachBatch((b: DataFrame, id: Long) => table.upsert(b, id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.read().where(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"), col("sum_cents"),
        col("first_us"), col("last_us"), col("n_types"), col("n_purchase"))
  }

  /** §2.10 — event-time TIMERS over ListState via `transformWithState`
    * ([[Tws.OrderTimerProcessor]]): every order registers a timer at
    * its +30-day horizon; the fire handler judges the customer ledger
    * exactly when the watermark proves the answer final. The oracle
    * keeps the equivalent RANGE-window form, so the differential
    * proves timer-at-watermark ≡ range-window (the r13 correlated-
    * family discipline applied to time). Append mode: timer emissions
    * are final by construction.
    */
  val st112_tws_timers: Q = (spark, dir) => {
    import spark.implicits._
    Replay.stateProvider(spark, bigState = true)
    val orders = Replay.ordersStream(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[Tws.OrderArrival]
    val out = orders.groupByKey(_.o_custkey)
      .transformWithState(new Tws.OrderTimerProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    Replay.runAppend(spark, out.toDF(), bigState = true)
      .where(col("o_custkey") >= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("n_within"))
  }

  /** §2.10 — the TTL'd state variable via `transformWithState`
    * ([[Tws.TtlActivityProcessor]]: a per-user activity cache whose
    * ValueState carries a real `TTLConfig` — the jedis-EXPIRE
    * re-expression; see the processor's docstring for the state-bound
    * and determinism adjudication). The replay's 1-hour TTL cannot
    * elapse mid-run, so the upserted result equals the plain batch
    * aggregate and hash-checks; eviction is TwsSpec's short-TTL
    * kill/sleep/resume pair.
    */
  val st116_tws_ttl_cache: Q = (spark, dir) => {
    import spark.implicits._
    Replay.stateProvider(spark, bigState = true)
    val events = Replay.eventsStream(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        graft.Tables.cents(col("value")).cast("long").as("cents"))
      .as[Tws.ActivityEvent]
    val cached = events.groupByKey(_.user_id)
      .transformWithState(
        new Tws.TtlActivityProcessor(java.time.Duration.ofHours(1)),
        // TTL is processing-time by definition — Spark rejects
        // TTLConfig under TimeMode.None
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val table = new graft.sinks.KeyedUpsertTable(spark,
      graft.Tables.scratchDir("graft_twsttl_"), Seq("user_id"), "user_id")
    // NOT Trigger.AvailableNow: in ProcessingTime mode the operator
    // requests a follow-up batch after every batch (TTL advancement),
    // so AvailableNow — and processAllAvailable — never see "no work
    // left" and spin on empty batches. Replay.runUntilDrained stops
    // on the SOURCE's termination condition (endOffset == latest);
    // the upsert-last table is slicing-independent, so the result is
    // identical.
    val q = cached.toDF().writeStream
      .outputMode("update")
      .foreachBatch((b: DataFrame, id: Long) => table.upsert(b, id))
      .option("checkpointLocation", graft.Tables.scratchDir("graft_cp_"))
      .start()
    Replay.runUntilDrained(q)
    table.read().where(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"), col("sum_cents"),
        col("last_us"))
  }

  /** W1 — DYNAMIC-GAP SESSION WINDOWS at ingest (the streamed twin of
    * batch a56, same [[Pipelines.dynamicSessionActivity]] verbatim):
    * `session_window` with a per-event gap expression under a
    * watermark — a session emits in append mode once the watermark
    * proves no event can extend it. State per open session, merged by
    * the engine as events arrive (the session-merge state machine the
    * fixed-gap st08 also exercises; the dynamic gap adds per-row gap
    * arithmetic to the merge rule, not state).
    */
  val st118_dynamic_session: Q = (spark, dir) =>
    Replay.runAppend(spark,
      Pipelines.dynamicSessionActivity(Replay.eventsStream(spark, dir)))
      .where(col("user_id") >= 0)

  /** p27 AT INGEST — the variant CDC route on the streaming front
    * door, which is where the reference actually runs it
    * (ods/KafkaToODS_M.scala:49-69 is a DStream job): the envelope is
    * `parse_json`'d ONCE per arriving record into a shredded variant
    * and both the (table, type) allow-list and the routed projection
    * read typed paths out of it — [[graft.operators.Relational
    * .variantRoute]], the SAME transform p27 proves in batch, here on
    * a micro-batched scan. Stateless (one codegen'd projection, no
    * watermark, no state store): the streaming cost is the source
    * micro-batching only, which is why the oracle is p27's verbatim —
    * route(stream) ≡ route(batch) row for row (the sentinel's
    * `__sentinel` table name fails the allow-list, so no read-back
    * filter is needed).
    */
  val st117_variant_route: Q = (spark, dir) =>
    Replay.runAppend(spark,
      graft.operators.Relational.variantRoute(Replay.eventsStream(spark, dir)))

  /** J3/J6 streaming — the LEFT SEMI stream-stream join, the one
    * watermarked dual-stream join type the suite didn't yet run
    * end-to-end (st02 inner, st05 left outer, st10 full outer; left
    * anti is unsupported on two streams by Spark itself). Orders emit
    * exactly once when their first in-range line arrives; the oracle
    * keeps the correlated EXISTS form, so the differential proves
    * semi-join ≡ existence quantifier (the r13 correlated-family
    * discipline). The ~1.7% of orders with no lineitem at all stay
    * unmatched — the lanes are genuinely mixed.
    */
  val st113_semi_join: Q = (spark, dir) => {
    val out = Replay.runAppend(spark,
      Pipelines.orderSemi(
        Replay.ordersStream(spark, dir), Replay.lineitemStream(spark, dir),
        Pipelines.ReplayJoinRange),
      bigState = true)
    out.where(col("order_id") >= 0)
  }

  /** Q-family streaming — THE QUALITY TREND AT INGEST (streaming twin
    * of the q03/q02 audit family): per event-time day, the constraint
    * counters a data-quality dashboard plots — volume, the error-event
    * SLO counter, and three violation gates (null value, non-positive
    * value, out-of-domain type). One watermarked daily tumbling-window
    * aggregation in append mode: each day's audit row emits exactly
    * once, when the watermark proves the day complete — which is
    * precisely when a quality gate may judge it (an early row would
    * report violations on a PARTIAL day; the q02 batch audit has no
    * such cutoff problem because its input is a closed snapshot).
    *
    * Scale shape: stateless per-row flag arithmetic rides the ingest
    * scan; the only state is the open windows' partial counters —
    * O(days-in-watermark × 1 row), rate-independent. The violation
    * flags are the same expressions q02/q03 evaluate, so batch and
    * ingest audits alert on the same algebra (the t24/st40 two-mode
    * drift discipline applied to constraints).
    */
  val st114_stream_quality_trend: Q = (spark, dir) => {
    val ev = Replay.eventsStream(spark, dir)
    val out = Replay.runAppend(spark,
      ev.withWatermark("ts", "25 hours")
        .groupBy(window(col("ts"), "1 day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_error"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("v_null_value"),
          sum(when(col("value") <= 0.0, 1L).otherwise(0L)).as("v_nonpos_value"),
          sum(when(!col("event_type").isin(
            "click", "view", "purchase", "signup", "error"), 1L)
            .otherwise(0L)).as("v_unknown_type"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("dt"),
          col("n_events"), col("n_error"), col("v_null_value"),
          col("v_nonpos_value"), col("v_unknown_type")))
    out.where(col("dt") < "2090-01-01")
  }

  /** Z-family streaming — THE RE-CLUSTER DECISION AT INGEST (streaming
    * twin of z05, the st41 count-at-ingest / judge-on-read dynamic):
    * per Morton tile, ONE update-mode aggregation maintains the two
    * counters the OPTIMIZE planner needs — rows arrived, delta-rule
    * rows arrived — in a keyed upsert table (state and table are both
    * ≤64 rows whatever the ingest volume; the cumulative counts are
    * monotone per key, so last-batch-wins serving is slicing-
    * independent). The DECISION is computed on read, because "is 10%
    * of the standing rows delta" is a judgement about the table NOW —
    * re-deriving it from served counters at read time means one
    * micro-batch never holds a stale verdict (the same reasoning st41
    * documents for count-vs-judge separation). Oracle is z05's
    * verbatim: the ingest-maintained counters must reproduce the
    * batch planner's work list exactly.
    */
  val st115_stream_recluster_plan: Q = (spark, dir) => {
    val L = graft.operators.Layout
    val px = col("l_partkey").bitwiseAND(lit(63L))
    val py = col("l_suppkey").bitwiseAND(lit(63L))
    val build = Replay.lineitemStream(spark, dir)
      .where(col("l_orderkey") >= 0)
      .select(
        L.morton16(shiftright(px, 3), shiftright(py, 3)).as("tile"),
        when(pmod(col("l_orderkey"), lit(10L)) === 0L && px < 16L, 1L)
          .otherwise(0L).as("is_delta"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_total"), sum(col("is_delta")).as("n_delta"))
    val served = upsertServe(spark, build, Seq("tile"), "n_total")
    val s = col("n_total") - col("n_delta")
    served.select(col("tile"), s.as("n_standing"), col("n_delta"),
      when(s === 0L && col("n_delta") > 0L, "new")
        .when(col("n_delta") * 1000L >= s * 100L, "rewrite")
        .otherwise("append").as("action"),
      when(s === 0L && col("n_delta") > 0L, col("n_delta"))
        .when(col("n_delta") * 1000L >= s * 100L, col("n_total"))
        .otherwise(lit(0L)).as("rows_rewritten"))
  }

  val queries: Map[String, Q] = Map(
    "st115_stream_recluster_plan" -> st115_stream_recluster_plan,
    "st111_tws_profile" -> st111_tws_profile,
    "st112_tws_timers" -> st112_tws_timers,
    "st116_tws_ttl_cache" -> st116_tws_ttl_cache,
    "st117_variant_route" -> st117_variant_route,
    "st118_dynamic_session" -> st118_dynamic_session,
    "st113_semi_join" -> st113_semi_join,
    "st114_stream_quality_trend" -> st114_stream_quality_trend,
    "st01_stream_dau" -> st01_stream_dau,
    "st18_stream_curation" -> st18_stream_curation,
    "st19_stream_lm_gate" -> st19_stream_lm_gate,
    "st20_stream_funnel" -> st20_stream_funnel,
    "st21_stream_retention" -> st21_stream_retention,
    "st22_stream_scd2" -> st22_stream_scd2,
    "st23_stream_rollup_serve" -> st23_stream_rollup_serve,
    "st25_stream_quarantine" -> st25_stream_quarantine,
    "st26_stream_mixture_serve" -> st26_stream_mixture_serve,
    "st27_tuned_ann_serve" -> st27_tuned_ann_serve,
    "st28_stream_repetition" -> st28_stream_repetition,
    "st24_stream_pivot_serve" -> st24_stream_pivot_serve,
    "st29_stream_quantile_serve" -> st29_stream_quantile_serve,
    "st30_stream_hitters_serve" -> st30_stream_hitters_serve,
    "st80_stream_hitters_exact" -> st80_stream_hitters_exact,
    "st81_stream_quantile_exact" -> st81_stream_quantile_exact,
    "st31_stream_semantic_decontam" -> st31_stream_semantic_decontam,
    "st32_stream_attribution" -> st32_stream_attribution,
    "st33_stream_range_join" -> st33_stream_range_join,
    "st34_stream_bloom_prune" -> st34_stream_bloom_prune,
    "st35_stream_hybrid_serve" -> st35_stream_hybrid_serve,
    "st36_stream_bloom_build" -> st36_stream_bloom_build,
    "st37_stream_incremental_dedup" -> st37_stream_incremental_dedup,
    "st38_stream_incremental_neardup" -> st38_stream_incremental_neardup,
    "st39_stream_mixture_resample" -> st39_stream_mixture_resample,
    "st40_stream_drift" -> st40_stream_drift,
    "st41_stream_index_delete" -> st41_stream_index_delete,
    "st42_stream_passage_scrub" -> st42_stream_passage_scrub,
    "st43_stream_kmv_serve" -> st43_stream_kmv_serve,
    "st44_stream_multitouch" -> st44_stream_multitouch,
    "st55_stream_cdc_apply" -> st55_stream_cdc_apply,
    "st56_stream_snapshot_diff" -> st56_stream_snapshot_diff,
    "st57_stream_sample_serve" -> st57_stream_sample_serve,
    "st58_stream_outlier_gate" -> st58_stream_outlier_gate,
    "st59_stream_sequence_match" -> st59_stream_sequence_match,
    "st60_stream_rolling_distinct" -> st60_stream_rolling_distinct,
    "st61_stream_media_gate" -> st61_stream_media_gate,
    "st75_stream_dhash" -> st75_stream_dhash,
    "st62_stream_center" -> st62_stream_center,
    "st92_stream_gram_serve" -> st92_stream_gram_serve,
    "st93_stream_custdist" -> st93_stream_custdist,
    "st94_stream_small_qty" -> st94_stream_small_qty,
    "st95_stream_ewma" -> st95_stream_ewma,
    "st96_stream_priority_check" -> st96_stream_priority_check,
    "st97_stream_waiting_supplier" -> st97_stream_waiting_supplier,
    "st98_stream_silent_rich" -> st98_stream_silent_rich,
    "st99_stream_minhash_error" -> st99_stream_minhash_error,
    "st100_stream_pmi" -> st100_stream_pmi,
    "st101_stream_entropy_gate" -> st101_stream_entropy_gate,
    "st102_stream_top_supplier" -> st102_stream_top_supplier,
    "st103_stream_large_volume" -> st103_stream_large_volume,
    "st104_stream_promo_share" -> st104_stream_promo_share,
    "st105_stream_pricing" -> st105_stream_pricing,
    "st106_stream_resolution_gate" -> st106_stream_resolution_gate,
    "st107_stream_profit" -> st107_stream_profit,
    "st108_stream_priority_class" -> st108_stream_priority_class,
    "st109_stream_split_leakage" -> st109_stream_split_leakage,
    "st110_stream_binary_ingest" -> st110_stream_binary_ingest,
    "st63_stream_first_seen" -> st63_stream_first_seen,
    "st64_stream_fallback_resolve" -> st64_stream_fallback_resolve,
    "st65_stream_masking" -> st65_stream_masking,
    "st66_stream_seasonal_monitor" -> st66_stream_seasonal_monitor,
    "st68_stream_hist" -> st68_stream_hist,
    "st69_stream_transition" -> st69_stream_transition,
    "st70_stream_kmv_overlap" -> st70_stream_kmv_overlap,
    "st71_stream_stratified" -> st71_stream_stratified,
    "st72_stream_zscore" -> st72_stream_zscore,
    "st76_stream_changepoint" -> st76_stream_changepoint,
    "st77_stream_period_report" -> st77_stream_period_report,
    "st79_stream_postings" -> st79_stream_postings,
    "st73_stream_norm_groups" -> st73_stream_norm_groups,
    "st74_stream_session_paths" -> st74_stream_session_paths,
    "st82_stream_funnel" -> st82_stream_funnel,
    "st83_stream_source_overlap" -> st83_stream_source_overlap,
    "st84_stream_entropy" -> st84_stream_entropy,
    "st85_stream_rollup_serve" -> st85_stream_rollup_serve,
    "st86_stream_locf" -> st86_stream_locf,
    "st87_stream_heatmap" -> st87_stream_heatmap,
    "st88_stream_new_vs_ret" -> st88_stream_new_vs_ret,
    "st89_stream_fingerprint" -> st89_stream_fingerprint,
    "st90_stream_sq8_serve" -> st90_stream_sq8_serve,
    "st91_stream_drift_audit" -> st91_stream_drift_audit,
    "st67_stream_gap_audit" -> st67_stream_gap_audit,
    "st45_stream_drift_gate" -> st45_stream_drift_gate,
    "st46_stream_cube_serve" -> st46_stream_cube_serve,
    "st47_stream_decay_serve" -> st47_stream_decay_serve,
    "st48_stream_corrupt_route" -> st48_stream_corrupt_route,
    "st49_stream_fuzzy_probe" -> st49_stream_fuzzy_probe,
    "st50_stream_contract_monitor" -> st50_stream_contract_monitor,
    "st51_stream_front_door" -> st51_stream_front_door,
    "st52_stream_ohlc_serve" -> st52_stream_ohlc_serve,
    "st54_stream_gopher_gate" -> st54_stream_gopher_gate,
    "st53_stream_cms_serve" -> st53_stream_cms_serve,
    "st17_stream_ann_serve" -> st17_stream_ann_serve,
    "st14_stream_index" -> st14_stream_index,
    "st15_stream_corpus_prep" -> st15_stream_corpus_prep,
    "st16_stream_decontam" -> st16_stream_decontam,
    "st02_stream_wide_join" -> st02_stream_wide_join,
    "st03_first_order_flag" -> st03_first_order_flag,
    "st04_cdc_route" -> st04_cdc_route,
    "st05_outer_wide_join" -> st05_outer_wide_join,
    "st06_sliding_window" -> st06_sliding_window,
    "st07_agg_upsert" -> st07_agg_upsert,
    "st08_session_window" -> st08_session_window,
    "st09_stream_allocation" -> st09_stream_allocation,
    "st10_full_outer_join" -> st10_full_outer_join,
    "st11_stream_dedup" -> st11_stream_dedup,
    "st12_stream_neardup" -> st12_stream_neardup,
    "st13_leaderboard" -> st13_leaderboard,
  )

  private val range = s"INTERVAL ${Pipelines.JoinRangeDays} DAY"

  /** st51's DuckDB twin: the existing gate CTEs (mixture rates, drift
    * verdicts + the c06 breaker, standing hashes, boilerplate keys)
    * chained over the d11/c06 delta with the planted metadata
    * corruption, laned in the front door's order, admitted survivors
    * scrubbed, rolled up per (lane, content_hash).
    */
  private def duckFrontDoorSql: String = {
    val T = graft.operators.TextAnalysis
    val D = graft.operators.Dedup
    val M = graft.operators.Multimodal
    val P = graft.functions.Portable
    val W = D.PassageW
    val mixH = P.duckHash60("concat('mix:', CAST(l.doc_id AS VARCHAR))")
    val ckH = P.duckHash60("chunk")
    // the mediaEditText mirror: middle tenth of the chars uppercased,
    // bodies under 10 chars pass through (the mm10 patch floor)
    val editedText =
      """CASE WHEN length(text) >= 10 THEN
              substr(text, 1, length(text)//2 - 1) ||
              upper(substr(text, length(text)//2, length(text)//10)) ||
              substr(text, length(text)//2 + length(text)//10,
                     length(text) - length(text)//2 - length(text)//10 + 1)
            ELSE text END"""
    s"""WITH standing AS (SELECT doc_id, text, lang, n_chars, source
                          FROM documents WHERE doc_id % 10 <> 0),
        delta AS (SELECT doc_id, text, lang, n_chars, source FROM documents
                  WHERE doc_id % 10 = 0
                  UNION ALL
                  SELECT doc_id + 1000000, text, lang, n_chars, source
                  FROM documents WHERE doc_id % 10 = 0 AND doc_id % 40 = 0
                  UNION ALL
                  SELECT doc_id + 2000000, text, lang, n_chars, source
                  FROM standing WHERE doc_id % 7 = 1
                  UNION ALL
                  SELECT doc_id + 4000000, $editedText AS text,
                         lang, n_chars, source
                  FROM standing WHERE doc_id % 10 = 4),
        planted AS (SELECT doc_id,
                           text ||
                           CASE WHEN doc_id % 19 = 6
                                THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                       || '@example.com now'
                                ELSE '' END ||
                           CASE WHEN doc_id % 23 = 7
                                THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                                       || '.0.1'
                                ELSE '' END AS text,
                           lang,
                           CASE WHEN doc_id % 13 = 3 THEN -1 ELSE n_chars END
                             AS n_chars,
                           source
                    FROM delta),
        ${T.duckMixRateCtes},
        ${T.duckDriftCtes},
        ${T.duckDriftVerdCte},
        dquar AS (SELECT DISTINCT d.doc_id FROM delta d JOIN verd v
                  ON v.trip AND (
                       (v.feature = 'len'
                        AND v.bucket = CAST(least(9, d.n_chars // 200) AS VARCHAR))
                    OR (v.feature = 'lang' AND v.bucket = d.lang)
                    OR (v.feature = 'source' AND v.bucket = d.source))),
        armedrel AS (SELECT (SELECT COUNT(*) FROM dquar) * 100
                       <= (SELECT COUNT(*) FROM delta)
                            * ${graft.operators.Curation.DriftRefuseCapPct}
                         AS armed),
        dtrips AS (SELECT p.doc_id, COUNT(*) AS n_trips
                   FROM planted p JOIN verd v
                   ON v.trip AND (
                        (v.feature = 'len'
                         AND v.bucket = CAST(least(9, p.n_chars // 200) AS VARCHAR))
                     OR (v.feature = 'lang' AND v.bucket = p.lang)
                     OR (v.feature = 'source' AND v.bucket = p.source))
                   GROUP BY 1),
        eh AS (SELECT DISTINCT md5(text) AS h FROM standing),
        corpus AS (SELECT doc_id, ${M.duckBytesExpr} AS bytes FROM standing
                   UNION ALL
                   SELECT doc_id, ${M.duckBytesExpr} AS bytes FROM planted),
        ${M.duckDhashBitsCtes},
        standb AS (SELECT doc_id, band_id, band FROM bits
                   WHERE doc_id % 10 <> 0 AND doc_id < 1000000
                   QUALIFY COUNT(*) OVER (PARTITION BY band_id, band)
                             <= ${M.PhashBandCap}),
        arrb AS (SELECT doc_id, band_id, band FROM bits
                 WHERE doc_id % 10 = 0 OR doc_id >= 1000000),
        mdup AS (SELECT DISTINCT d.doc_id
                 FROM arrb d JOIN standb s
                   ON d.band_id = s.band_id AND d.band = s.band
                 JOIN sig sa ON sa.doc_id = d.doc_id
                 JOIN sig sb ON sb.doc_id = s.doc_id
                 WHERE CAST(list_sum(list_transform(
                         list_zip(sa.bands, sb.bands),
                         t -> bit_count(xor(t[1], t[2])))) AS BIGINT) <= 3),
        laned AS (SELECT l.doc_id, l.text, md5(l.text) AS content_hash,
                         CASE WHEN l.n_chars < 0 THEN 'corrupt'
                              WHEN len(regexp_extract_all(l.text,
                                     '${T.EmailRe}'))
                                 + len(regexp_extract_all(l.text,
                                     '${T.Ipv4Re}')) > 0 THEN 'pii'
                              WHEN r.rate_micro IS NULL
                                   OR ($mixH) % 10000 >= r.rate_micro
                                THEN 'mixture'
                              WHEN (SELECT armed FROM armedrel)
                                   AND COALESCE(t.n_trips, 0) > 0 THEN 'drift'
                              WHEN md5(l.text) IN (SELECT h FROM eh) THEN 'dup'
                              WHEN l.doc_id % 9 = 2 THEN 'media_truncated'
                              WHEN l.doc_id % 9 = 5 THEN 'media_bad_magic'
                              WHEN l.doc_id % 9 = 7 THEN 'media_size_mismatch'
                              WHEN l.doc_id IN (SELECT doc_id FROM mdup)
                                THEN 'media_dup'
                              ELSE 'admitted' END AS lane
                  FROM planted l
                  LEFT JOIN mixrates r
                    ON l.lang = r.lang AND l.source = r.source
                  LEFT JOIN dtrips t ON t.doc_id = l.doc_id),
        btk AS (SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
                FROM documents),
        bcid AS (SELECT doc_id, toks,
                        unnest(range(0, CAST(ceil(len(toks) / $W.0) AS BIGINT)))
                          AS chunk_id
                 FROM btk),
        bch AS (SELECT doc_id,
                       array_to_string(list_slice(toks, chunk_id * $W + 1,
                                                  chunk_id * $W + $W), ' ') AS chunk
                FROM bcid),
        bp AS (SELECT ck FROM (SELECT doc_id, $ckH AS ck FROM bch)
               GROUP BY ck HAVING COUNT(DISTINCT doc_id) >= 2),
        atk AS (SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
                FROM laned WHERE lane = 'admitted'),
        acid AS (SELECT doc_id, toks,
                        unnest(range(0, CAST(ceil(len(toks) / $W.0) AS BIGINT)))
                          AS chunk_id
                 FROM atk),
        ach AS (SELECT doc_id, chunk_id,
                       array_to_string(list_slice(toks, chunk_id * $W + 1,
                                                  chunk_id * $W + $W), ' ') AS chunk
                FROM acid),
        ack AS (SELECT doc_id, chunk_id, chunk, $ckH AS ck FROM ach),
        clean AS (SELECT doc_id,
                         COALESCE(string_agg(
                           CASE WHEN ck NOT IN (SELECT ck FROM bp) THEN chunk END,
                           ' ' ORDER BY chunk_id), '') AS clean_text
                  FROM ack GROUP BY 1)
        SELECT l.lane, l.content_hash, MIN(l.doc_id) AS keeper_id,
               COUNT(*) AS n_copies,
               COALESCE(MAX(c.clean_text), '') AS clean_text
        FROM laned l LEFT JOIN clean c ON c.doc_id = l.doc_id
        GROUP BY 1, 2"""
  }

  val oracles: Map[String, String] = Map(
    // st111's incremental ValueState/MapState machine must converge
    // to the plain batch GROUP BY (upsert-last keeps the final
    // cumulative profile per user)
    "st111_tws_profile" ->
      """SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                min(epoch_us(ts)) AS first_us,
                max(epoch_us(ts)) AS last_us,
                CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                CAST(count(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS n_purchase
         FROM events GROUP BY user_id""",
    // st116: no eviction can occur inside the replay (1 h TTL), so
    // the TTL'd cache must converge to the plain batch aggregate
    "st116_tws_ttl_cache" ->
      """SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                max(epoch_us(ts)) AS last_us
         FROM events GROUP BY user_id""",
    // st117: stateless route — the stream must equal the batch route
    // row for row (p27's oracle verbatim; sentinel fails the allow-list)
    "st117_variant_route" ->
      """WITH p AS (SELECT event_id,
              '{"table": "' || event_type || '", "type": "' ||
              CASE CAST(event_id % 3 AS INTEGER)
                   WHEN 0 THEN 'insert' WHEN 1 THEN 'update'
                   ELSE 'bootstrap-insert' END ||
              '", "data": {"id": ' || CAST(user_id AS VARCHAR) || '}}' AS env
            FROM events)
         SELECT event_id,
                json_extract_string(env, '$.table') AS tbl,
                json_extract_string(env, '$.type') AS op,
                'ods_' || json_extract_string(env, '$.table') AS route,
                CAST(json_extract(env, '$.data.id') AS BIGINT) AS row_id
         FROM p
         WHERE json_extract_string(env, '$.table')
                 IN ('purchase','signup','click')
           AND json_extract_string(env, '$.type') IN ('insert','update')""",
    // st118: a56's running-max islands oracle verbatim — the streamed
    // session-merge state machine must equal the batch construction
    "st118_dynamic_session" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu,
                  CASE WHEN event_type = 'purchase'
                       THEN 600000000 ELSE 1800000000 END AS gap_us
           FROM events),
         w AS (SELECT user_id, tsu, tsu + gap_us AS end_us,
                 MAX(tsu + gap_us) OVER (PARTITION BY user_id ORDER BY tsu
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
               FROM e),
         s AS (SELECT user_id, tsu, end_us,
                 SUM(CASE WHEN prev_max IS NULL OR tsu >= prev_max
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY tsu
                         ROWS UNBOUNDED PRECEDING) AS sid
               FROM w)
         SELECT strftime(make_timestamp(MIN(tsu)), '%Y-%m-%d %H:%M:%S')
                  AS session_start,
                strftime(make_timestamp(MAX(end_us)), '%Y-%m-%d %H:%M:%S')
                  AS session_end,
                user_id, CAST(COUNT(*) AS BIGINT) AS n_events
         FROM s GROUP BY user_id, sid""",
    // st112's timer-at-watermark emission must equal the RANGE window
    // over the batch table — the oracle keeps the window form, the
    // differential proves the timer machine computes it
    "st112_tws_timers" ->
      """SELECT o_orderkey, o_custkey,
                CAST(count(*) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate
                  RANGE BETWEEN UNBOUNDED PRECEDING
                            AND INTERVAL 30 DAYS FOLLOWING) AS BIGINT)
                  AS n_within
         FROM orders""",
    // st113's semi-join emissions must equal the correlated existence
    // quantifier over the batch tables
    "st113_semi_join" ->
      """SELECT o_orderkey AS order_id, o_custkey AS user_id,
                o_orderstatus AS order_status
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate
                           BETWEEN o.o_orderdate - INTERVAL 3650 DAYS
                               AND o.o_orderdate + INTERVAL 3650 DAYS)""",
    // st114's per-day audit rows must equal the batch trend over the
    // closed events table — same counter algebra as q02/q03
    "st114_stream_quality_trend" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
                CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(CASE WHEN event_type = 'error'
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                CAST(SUM(CASE WHEN value IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS v_null_value,
                CAST(SUM(CASE WHEN value <= 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS v_nonpos_value,
                CAST(SUM(CASE WHEN event_type NOT IN
                              ('click','view','purchase','signup','error')
                              THEN 1 ELSE 0 END) AS BIGINT) AS v_unknown_type
         FROM events GROUP BY 1""",
    // st115's served counters must reproduce z05's batch work list
    "st115_stream_recluster_plan" ->
      graft.operators.Layout.oracles("z05_incremental_recluster"),
    // st17 must return EXACTLY n09's batch answer — the oracle is n09's
    "st17_stream_ann_serve" -> graft.operators.Similarity.oracles("n09_ivfadc_topk"),
    // st19 must assign EXACTLY t18's scores — the oracle is t18's
    "st19_stream_lm_gate" -> graft.operators.TextAnalysis.oracles("t18_bigram_lm"),
    // st20 must reproduce EXACTLY a09's funnel — the oracle is a09's
    "st20_stream_funnel" -> graft.operators.Relational.oracles("a09_funnel"),
    // st21 must reproduce EXACTLY a10's triangle — the oracle is a10's
    "st21_stream_retention" -> graft.operators.Relational.oracles("a10_retention"),
    // st22 must rebuild EXACTLY j11's history — the oracle is j11's
    "st22_stream_scd2" -> graft.operators.Relational.oracles("j11_scd2_history"),
    "st23_stream_rollup_serve" -> graft.operators.Relational.oracles("a11_revenue_rollup"),
    // st32 must reproduce EXACTLY j12's as-of assignment — the oracle is j12's
    "st32_stream_attribution" -> graft.operators.Relational.oracles("j12_attribution_asof"),
    // st33 must assign EXACTLY j10's campaign relation — the oracle is j10's
    "st33_stream_range_join" -> graft.operators.Relational.oracles("j10_range_join"),
    // st35 serves EXACTLY n18's fused ranking — the oracle is n18's
    "st35_stream_hybrid_serve" ->
      graft.operators.Similarity.oracles("n18_hybrid_rrf"),
    // st36's stream-built summary must prune exactly as j13's batch build
    "st36_stream_bloom_build" ->
      graft.operators.Relational.oracles("j13_bloom_prune_join"),
    // st37's served keeper table must equal the batch nightly — d11's oracle
    "st37_stream_incremental_dedup" ->
      graft.operators.Dedup.oracles("d11_incremental_dedup"),
    // st38's probed pairs must equal the batch incremental near-dup — d12's
    "st38_stream_incremental_neardup" ->
      graft.operators.Dedup.oracles("d12_incremental_neardup"),
    // st39's kept set must equal the batch resample exactly — c07's oracle
    "st39_stream_mixture_resample" ->
      graft.operators.Curation.oracles("c07_mixture_resample"),
    // st40's incremental counts must yield EXACTLY t24's statistic
    "st40_stream_drift" -> graft.operators.TextAnalysis.oracles("t24_drift_psi"),
    // st41's served counters must assemble EXACTLY n20's compaction plan
    "st41_stream_index_delete" ->
      graft.operators.Similarity.oracles("n20_index_delete"),
    // st42's scrub against the decided list must equal d13's corpus pass
    "st42_stream_passage_scrub" ->
      graft.operators.Dedup.oracles("d13_passage_dedup"),
    // st43's streamed bottom-k buffer must unpack to a17's order statistic
    "st43_stream_kmv_serve" ->
      graft.operators.Relational.oracles("a17_kmv_sample"),
    // st44's flush-time splits must reproduce EXACTLY j14's credit rows
    "st44_stream_multitouch" ->
      graft.operators.Relational.oracles("j14_multitouch_attribution"),
    // st55: the same order-free boundary/candidate maxes in DuckDB —
    // delivery order provably can't matter, so the batch-table twin
    // is exact (tombstoned keys stay visible with null columns)
    "st55_stream_cdc_apply" ->
      """WITH log AS (
           SELECT user_id, epoch_us(ts) AS tsu, event_id AS eid,
                  CASE event_type WHEN 'signup' THEN 'insert'
                                  WHEN 'error' THEN 'delete'
                                  ELSE 'update' END AS op,
                  CASE WHEN event_type IN ('signup','click','purchase')
                       THEN CAST(ROUND(value*100) AS BIGINT) END AS balance_c,
                  CASE event_type WHEN 'signup' THEN 'new'
                                  WHEN 'purchase' THEN 'buyer'
                                  WHEN 'view' THEN 'seg_' || CAST(event_id % 5 AS VARCHAR)
                  END AS segment
           FROM events),
          o AS (SELECT *, CAST(tsu AS HUGEINT) * 100000000 + eid AS ord FROM log),
          agg AS (SELECT user_id,
                    arg_max(op, ord) FILTER (op IN ('insert','delete')) AS bop,
                    arg_max(balance_c, ord) FILTER (balance_c IS NOT NULL) AS cand_b,
                    arg_max(segment, ord) FILTER (segment IS NOT NULL) AS cand_s,
                    MAX(tsu) AS last_tsu,
                    COUNT(*) FILTER (op IN ('insert','delete')) AS nb
                  FROM o GROUP BY user_id)
          SELECT user_id, bop AS op,
                 CASE WHEN bop = 'insert' THEN cand_b END AS balance_c,
                 CASE WHEN bop = 'insert' THEN cand_s END AS segment,
                 last_tsu
          FROM agg WHERE nb > 0""",
    // st67's served-counter audit must equal w10's batch gap islands
    "st67_stream_gap_audit" ->
      graft.operators.Relational.oracles("w10_calendar_gaps"),
    // st66's counted-then-judged flags must equal a30's batch monitor
    "st66_stream_seasonal_monitor" ->
      graft.operators.Relational.oracles("a30_seasonal_residuals"),
    // st68's served buckets must shape to exactly a31's histogram
    "st68_stream_hist" ->
      graft.operators.Relational.oracles("a31_hist_equiwidth"),
    // st69's flush-time pairs must roll up to exactly a35's matrix
    "st69_stream_transition" ->
      graft.operators.Relational.oracles("a35_transition_matrix"),
    // st70's served-sketch algebra must equal a39's batch overlap
    "st70_stream_kmv_overlap" ->
      graft.operators.Relational.oracles("a39_kmv_overlap"),
    // st71's served buffers must shape to exactly t32's sample
    "st71_stream_stratified" ->
      graft.operators.TextAnalysis.oracles("t32_stratified_sample"),
    // st72's counted-then-judged flags must equal w12's batch monitor
    // st76's served daily sums must scan to exactly a41's split relation
    "st76_stream_changepoint" ->
      graft.operators.Relational.oracles("a41_changepoint"),
    // st77's served daily sums must report exactly w14's shifts
    "st77_stream_period_report" ->
      graft.operators.Relational.oracles("w14_period_over_period"),
    // st79's stream-maintained postings must serve exactly t36's lookup
    "st79_stream_postings" ->
      graft.operators.TextAnalysis.oracles("t36_term_lookup"),
    // st80: exact coupon regime ⇒ the served MG summary is a plain count
    "st80_stream_hitters_exact" ->
      """WITH f AS (SELECT event_type, CAST(user_id AS VARCHAR) AS item
                    FROM events WHERE user_id >= 0 AND user_id < 25),
          c AS (SELECT event_type, item, CAST(COUNT(*) AS BIGINT) AS est_cnt
                FROM f GROUP BY 1, 2),
          t AS (SELECT event_type, CAST(SUM(est_cnt) AS BIGINT) AS n_items
                FROM c GROUP BY 1)
          SELECT c.event_type, n_items, item, est_cnt
          FROM c JOIN t USING (event_type)""",
    // st81: no-compaction regime ⇒ the served digest is a14x's exact
    // picked order statistic
    "st81_stream_quantile_exact" ->
      graft.operators.Relational.oracles("a14x_quantile_exact"),
    "st72_stream_zscore" ->
      graft.operators.Relational.oracles("w12_rolling_zscore"),
    // st73's served group counts must shape to exactly t33's keys
    "st73_stream_norm_groups" ->
      graft.operators.TextAnalysis.oracles("t33_normalize"),
    // st74's flush-time paths must roll up to exactly a40's shares
    "st74_stream_session_paths" ->
      graft.operators.Relational.oracles("a40_session_paths"),
    // st82's flushed per-user verdicts must roll up to exactly a44's
    // 3-row conversion relation
    "st82_stream_funnel" ->
      graft.operators.Relational.oracles("a44_funnel_conversion"),
    // st83's served per-source KMV sketches must reproduce the full
    // hash-derived overlap algebra (a39's oracle shape over source
    // shingles, plus per-source size estimates and d26's containment
    // per-milles) — hash-checked in every regime
    "st83_stream_source_overlap" -> {
      val k = graft.operators.Relational.KmvK
      val shExpr = graft.operators.Dedup.duckShingleExpr
      s"""WITH uh AS (SELECT DISTINCT source,
                        ${graft.functions.Portable.duckHash60(
                          "concat('sov:', sh)")} AS h
                      FROM (SELECT source, unnest($shExpr) AS sh
                            FROM documents)),
          btm AS (SELECT source, h FROM (
                    SELECT source, h,
                           row_number() OVER (PARTITION BY source
                             ORDER BY h) AS rn
                    FROM uh) WHERE rn <= $k),
          sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept_src,
                        MAX(h) AS kth_s
                 FROM btm GROUP BY 1),
          sze AS (SELECT source,
                         CASE WHEN n_kept_src < $k THEN n_kept_src
                              ELSE CAST(floor(${k - 1}.0 * pow(2.0, 60.0) /
                                     CAST(kth_s AS DOUBLE)) AS BIGINT)
                         END AS size_est
                  FROM sz),
          ty AS (SELECT DISTINCT source FROM btm),
          tp AS (SELECT a.source AS ta, b.source AS tb
                 FROM ty a JOIN ty b ON a.source < b.source),
          mm AS (SELECT tp.ta, tp.tb, s.h,
                        CAST(MAX(CASE WHEN s.source = tp.ta
                                 THEN 1 ELSE 0 END) AS BIGINT) AS in_a,
                        CAST(MAX(CASE WHEN s.source = tp.tb
                                 THEN 1 ELSE 0 END) AS BIGINT) AS in_b
                 FROM tp JOIN btm s
                   ON s.source = tp.ta OR s.source = tp.tb
                 GROUP BY 1, 2, 3),
          r AS (SELECT mm.*, CAST(row_number() OVER (PARTITION BY ta, tb
                               ORDER BY h) AS BIGINT) AS rn
                FROM mm),
          kept AS (SELECT * FROM r WHERE rn <= $k),
          agg AS (SELECT ta, tb, CAST(MAX(rn) AS BIGINT) AS n_kept,
                         MAX(h) AS kth,
                         CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
                  FROM kept GROUP BY 1, 2),
          est AS (SELECT agg.*,
                         CASE WHEN n_kept < $k THEN n_kept
                              ELSE CAST(floor(${k - 1}.0 * pow(2.0, 60.0) /
                                     CAST(kth AS DOUBLE)) AS BIGINT)
                         END AS union_est
                  FROM agg),
          fin AS (SELECT ta, tb, n_kept, n_common, union_est,
                         CAST((n_common * 1000) // n_kept AS BIGINT)
                           AS jaccard_pm,
                         CAST((n_common * union_est) // n_kept AS BIGINT)
                           AS inter_est
                  FROM est)
          SELECT ta AS src_a, tb AS src_b, n_kept, n_common, union_est,
                 jaccard_pm, inter_est,
                 sa.size_est AS size_a_est, sb.size_est AS size_b_est,
                 CAST((CAST(inter_est AS HUGEINT) * 1000) // sa.size_est
                      AS BIGINT) AS contain_a_pm,
                 CAST((CAST(inter_est AS HUGEINT) * 1000) // sb.size_est
                      AS BIGINT) AS contain_b_pm
          FROM fin JOIN sze sa ON fin.ta = sa.source
                   JOIN sze sb ON fin.tb = sb.source"""
    },
    // st84's incrementally-scored table must equal t37's nightly scan
    "st84_stream_entropy" ->
      graft.operators.TextAnalysis.oracles("t37_char_entropy"),
    // st85's on-read rollup of the served finest grain must equal the
    // batch ROLLUP
    "st85_stream_rollup_serve" ->
      graft.operators.Relational.oracles("a49_rollup_revenue"),
    // st93's served per-customer counts + on-read zero-bucket
    // histogram must equal the batch Q13
    "st93_stream_custdist" ->
      graft.operators.Relational.oracles("j30_order_count_distribution"),
    // st94's served (part, qty) grain re-judged on read must equal
    // the batch Q17 gate (j29's correlated oracle verbatim)
    "st94_stream_small_qty" ->
      graft.operators.Relational.oracles("j29_small_qty_revenue"),
    // st95's on-read smoother over served daily sums must equal w21
    "st95_stream_ewma" ->
      graft.operators.Relational.oracles("w21_ewma"),
    // st96's at-ingest monotone verdicts must equal the batch Q4
    "st96_stream_priority_check" ->
      graft.operators.Relational.oracles("j34_order_priority_check"),
    // st97's served pair flags + on-read quantifiers must equal the
    // batch Q21
    "st97_stream_waiting_supplier" ->
      graft.operators.Relational.oracles("j33_waiting_supplier"),
    // st98's revocation set + static threshold must equal the batch Q22
    "st98_stream_silent_rich" ->
      graft.operators.Relational.oracles("j31_above_avg_silent"),
    // st100: the O(k)-state sketch serve in its exact regime must
    // reproduce the batch PMI over the pinned calibration window
    "st100_stream_pmi" ->
      graft.operators.TextAnalysis.oracles("t41_pmi_collocations"),
    // st101's at-door entropy verdicts must equal mm14's nightly scan
    "st101_stream_entropy_gate" ->
      graft.operators.Multimodal.oracles("mm14_payload_entropy"),
    // st102's served supplier grain + on-read max join-back must
    // equal the batch Q15 (j44's scalar-MAX view form verbatim)
    "st102_stream_top_supplier" ->
      graft.operators.Relational.oracles("j44_top_supplier"),
    // st103's served order sums judged on read must equal the batch
    // Q18 quantifier
    "st103_stream_large_volume" ->
      graft.operators.Relational.oracles("j45_large_volume"),
    // st104's 12-row calendar grain + on-read per-mille must equal
    // the batch Q14
    "st104_stream_promo_share" ->
      graft.operators.Relational.oracles("j43_promo_effect"),
    // st105's six additive accumulators + on-read divisions must
    // equal the batch Q1
    "st105_stream_pricing" ->
      graft.operators.Relational.oracles("j37_pricing_summary"),
    // st106's at-door dimension verdicts must equal mm15's nightly
    // scan (the construction-mirror oracle judges the stream parse)
    "st106_stream_resolution_gate" ->
      graft.operators.Multimodal.oracles("mm15_resolution_gate"),
    // st107's 175 decimal accumulators + on-read cents floor must
    // equal the batch Q9 star
    "st107_stream_profit" ->
      graft.operators.Relational.oracles("j48_product_profit"),
    // st108's two-row CASE-count state must equal the batch Q12
    "st108_stream_priority_class" ->
      graft.operators.Relational.oracles("j49_ship_priority_class"),
    // st109's at-ingest probes of the standing train set must equal
    // t43's nightly scan
    "st109_stream_split_leakage" ->
      graft.operators.TextAnalysis.oracles("t43_split_leakage"),
    // st110's per-object ingest verdicts must equal s16's batch scan
    // of the same exported objects
    "st110_stream_binary_ingest" ->
      graft.operators.Relational.oracles("s16_binaryfile_source"),
    // st99: d32's estimator-error arithmetic restricted to the
    // (standing, delta) split over the raw corpus
    "st99_stream_minhash_error" -> {
      val D = graft.operators.Dedup
      val P = graft.functions.Portable
      val (nBands, nRows) = D.PickedBanding
      val nh = D.NumHashes
      val mhs = (0 until nh).map(i =>
        s"list_min(list_transform(hs, h -> ${P.duckXorMix(i, "h")}))")
        .mkString("[", ", ", "]")
      val bandKeys = (0 until nBands).map(b =>
        (1 to nRows).map(r => s"mhs[${nRows * b + r}]")
          .mkString("concat_ws('_', ", ", ", ")"))
      s"""WITH sh AS (SELECT doc_id, ${D.duckShingleExpr} AS shd
                      FROM documents),
          shn AS (SELECT doc_id, shd FROM sh WHERE len(shd) > 0),
          hsx AS (SELECT doc_id,
                         list_transform(shd, s -> ${P.duckHash60("s")}) AS hs
                  FROM shn),
          mh AS MATERIALIZED (SELECT doc_id, $mhs AS mhs FROM hsx),
          bands AS (
            SELECT doc_id, t.band,
                   CASE ${bandKeys.zipWithIndex.map { case (k, b) =>
                     s"WHEN t.band = $b THEN $k" }.mkString(" ")} END AS bkey
            FROM mh, (SELECT unnest([${(0 until nBands).mkString(",")}])
                      AS band) t),
          cand AS (
            SELECT DISTINCT d.doc_id AS delta_id, s.doc_id AS standing_id
            FROM bands d JOIN bands s
              ON d.band = s.band AND d.bkey = s.bkey
             AND d.doc_id % 10 = 0 AND s.doc_id % 10 <> 0)
          SELECT delta_id, standing_id,
                 CAST(len(list_filter(range(1, ${nh + 1}),
                      i -> xd.mhs[i] = xs.mhs[i])) AS BIGINT) AS n_match,
                 CAST(len(list_filter(range(1, ${nh + 1}),
                      i -> xd.mhs[i] = xs.mhs[i])) * 1000 // $nh
                      AS BIGINT) AS est_pm,
                 CAST(len(list_intersect(x.hs, y.hs)) * 1000
                      // len(list_distinct(list_concat(x.hs, y.hs)))
                      AS BIGINT) AS exact_pm,
                 CAST(len(list_filter(range(1, ${nh + 1}),
                      i -> xd.mhs[i] = xs.mhs[i])) * 1000 // $nh
                    - len(list_intersect(x.hs, y.hs)) * 1000
                      // len(list_distinct(list_concat(x.hs, y.hs)))
                      AS BIGINT) AS err_pm
          FROM cand JOIN hsx x ON x.doc_id = delta_id
                    JOIN hsx y ON y.doc_id = standing_id
                    JOIN mh xd ON xd.doc_id = delta_id
                    JOIN mh xs ON xs.doc_id = standing_id"""
    },
    // st86's on-read carry over the served daily sums must equal w19
    "st86_stream_locf" ->
      graft.operators.Relational.oracles("w19_locf_fill"),
    // st87's served cells + on-read shares must equal w20's heatmap
    "st87_stream_heatmap" ->
      graft.operators.Relational.oracles("w20_weekly_heatmap"),
    // st88's at-door classification + served sums must equal a50
    "st88_stream_new_vs_ret" ->
      graft.operators.Relational.oracles("a50_new_vs_returning"),
    // st89's ingest-counted offset histogram, judged on read, must
    // report exactly mm13's batch constellation matches
    "st89_stream_fingerprint" ->
      graft.operators.Multimodal.oracles("mm13_audio_fingerprint"),
    // st90's incrementally-maintained quantized top-K must equal the
    // batch SQ8 ranking (n33's CTE chain, ranking tail)
    "st90_stream_sq8_serve" ->
      graft.operators.Similarity.duckSq8TopSql,
    // st91's ingest-maintained split counters, judged on read, must
    // report exactly p25's per-column drift audit
    "st91_stream_drift_audit" ->
      graft.operators.Relational.duckDriftAuditSql,
    // st64's stateless resolution must equal the batch fallback join
    "st64_stream_fallback_resolve" ->
      graft.operators.Relational.oracles("j18_fallback_join"),
    // st65's at-door masking must equal the batch policy projection
    "st65_stream_masking" ->
      graft.operators.Relational.oracles("p18_masking_policy"),
    // st63's served first-days must curve to exactly w08's growth series
    "st63_stream_first_seen" ->
      graft.operators.Relational.oracles("w08_cumulative_users"),
    // st62's stateless centering must equal the batch transform
    "st62_stream_center" ->
      graft.operators.Similarity.oracles("n26_embedding_center"),
    // st92's served co-moment sums must equal n35's batch pass
    "st92_stream_gram_serve" ->
      graft.operators.Similarity.oracles("n35_embedding_gram"),
    // st61's streamed byte verdicts must equal mm08's batch gate
    // st75's streamed probe must equal mm10's arithmetic on the
    // (standing, delta) slice with the standing-side band cap
    "st75_stream_dhash" ->
      graft.operators.Multimodal.duckDhashProbeSql,
    "st61_stream_media_gate" ->
      graft.operators.Multimodal.oracles("mm08_media_gate"),
    // st60's streamed window buffers must equal a26's bottom-k exactly
    // (minus the n_exact audit column a stream deliberately trades away)
    "st60_stream_rolling_distinct" -> {
      val a26 = graft.operators.Relational.oracles("a26_rolling_distinct")
      s"""SELECT dt, n_kept, kth, est_distinct FROM ($a26)"""
    },
    // st59's flush-time sweep must emit exactly w07's pattern instances
    "st59_stream_sequence_match" ->
      graft.operators.Relational.oracles("w07_sequence_match"),
    // st58's stateless gate must flag exactly a24's outlier rows
    "st58_stream_outlier_gate" ->
      graft.operators.Relational.oracles("a24_outlier_mad"),
    // st57's streamed k-buffer must unpack to t28's exact sample
    "st57_stream_sample_serve" ->
      graft.operators.TextAnalysis.oracles("t28_weighted_sample"),
    // st56's manifest-judged delta must equal the batch snapshot diff
    "st56_stream_snapshot_diff" ->
      graft.operators.Relational.oracles("p17_snapshot_diff"),
    // st45's stateless gate must equal the batch drift-gated admission
    "st45_stream_drift_gate" ->
      graft.operators.Curation.oracles("c08_drift_gated_admission"),
    // st46's served cells must cube to EXACTLY a18's lattice
    "st46_stream_cube_serve" ->
      graft.operators.Relational.oracles("a18_event_cube"),
    // st47's undecayed cells must decay on read to EXACTLY a19's totals
    "st47_stream_decay_serve" ->
      graft.operators.Relational.oracles("a19_decayed_engagement"),
    // st48's routed lanes must equal the batch parser quarantine
    "st48_stream_corrupt_route" ->
      graft.operators.Relational.oracles("p14_corrupt_route"),
    // st50's served counters must equal p15's battery minus uniqueness
    "st50_stream_contract_monitor" ->
      """WITH rl AS (
            SELECT CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS ts_not_null,
                   CAST(SUM(CASE WHEN event_type NOT IN
                              ('click','error','purchase','signup','view')
                            THEN 1 ELSE 0 END) AS BIGINT) AS event_type_in_enum,
                   CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS value_non_negative
            FROM events),
          ri AS (SELECT COUNT(*) AS user_id_in_customer FROM events
                 WHERE user_id NOT IN (SELECT c_custkey FROM customer)),
          w AS (SELECT * FROM rl, ri)
          SELECT 'ts_not_null' AS constraint_name, ts_not_null AS n_violations,
                 ts_not_null = 0 AS passed FROM w
          UNION ALL SELECT 'event_type_in_enum', event_type_in_enum,
                 event_type_in_enum = 0 FROM w
          UNION ALL SELECT 'value_non_negative', value_non_negative,
                 value_non_negative = 0 FROM w
          UNION ALL SELECT 'user_id_in_customer', user_id_in_customer,
                 user_id_in_customer = 0 FROM w""",
    // st54's appended verdicts must equal t27's audit — the battery
    // is one shared stateless projection
    "st54_stream_gopher_gate" ->
      graft.operators.TextAnalysis.oracles("t27_gopher_rules"),
    // st52's served candles must equal the batch relation — the picks
    // are order-free under the total (tsu, event_id) order
    "st52_stream_ohlc_serve" ->
      graft.operators.Relational.oracles("w05_ohlc_candles"),
    // st53's streamed grid must equal the batch sketch bit-for-bit —
    // CMS is merge-order free
    "st53_stream_cms_serve" ->
      graft.operators.Relational.oracles("a23_count_min"),
    // st51's served lanes must equal the chained batch gates: corrupt
    // route → mixture governor → drift gate (with c06's breaker) →
    // two-tier dedup admission → passage scrub, each the EXISTING
    // gate's CTE arithmetic composed over the d11/c06 delta
    "st51_stream_front_door" -> duckFrontDoorSql,
    // st49's stateless probe must equal d15's standing-vs-arriving slice
    "st49_stream_fuzzy_probe" ->
      """WITH fz AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000,
                   array_to_string(
                     string_split(text, ' ')[1:7] || ['zz'] ||
                     string_split(text, ' ')[9:], ' ')
            FROM documents WHERE doc_id % 10 = 0),
          c AS (SELECT doc_id, substring(text, 1, 16) AS blk,
                       substring(text, 1, 96) AS head
                FROM fz)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
          FROM c a JOIN c b ON a.blk = b.blk
          WHERE a.doc_id < 1000000 AND b.doc_id >= 1000000
            AND levenshtein(a.head, b.head) <= 16""",
    // st34's prune must be invisible: the oracle is the exact row-level join
    "st34_stream_bloom_prune" ->
      """SELECT l_orderkey, l_linenumber,
                ROUND(l_extendedprice * (1 - l_discount) * 100) / 100 AS net
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'""",
    "st25_stream_quarantine" -> graft.operators.Relational.oracles("p12_quarantine"),
    "st26_stream_mixture_serve" -> graft.operators.TextAnalysis.oracles("t19_domain_mixture"),
    "st27_tuned_ann_serve" -> graft.operators.Similarity.duckTunedAdcSql,
    // st31 flags the same-label train×eval pairs at the threshold —
    // d10's arithmetic without the sub split (the eval side is
    // broadcast-bounded at ingest, so no cell cap applies)
    "st31_stream_semantic_decontam" ->
      s"""WITH e AS (SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          ev AS (SELECT vec_id, label, v FROM e WHERE vec_id % 20 = 7),
          tr AS (SELECT vec_id, label, v FROM e WHERE vec_id % 20 <> 7
                 UNION ALL
                 SELECT vec_id + 2000000, label,
                        list_concat([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], v[9:])
                 FROM ev WHERE vec_id % 80 = 7),
          na AS (SELECT vec_id, label, v,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM tr),
          ne AS (SELECT label, v,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM ev),
          p AS (SELECT a.vec_id, a.label,
                  round(list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
                        / (a.nrm * b.nrm) * 1000000) / 1000000 AS c6
                FROM na a JOIN ne b ON a.label = b.label)
          SELECT vec_id, label, COUNT(*) AS n_eval_hits, max(c6) AS max_cos6
          FROM p WHERE c6 >= ${graft.operators.Similarity.NearDupThreshold}
          GROUP BY vec_id, label""",
    // st28 must assign EXACTLY t21's signals to the text-distinct
    // corpus — the oracle composes t21's CTEs over the deduped stream
    "st28_stream_repetition" -> {
      val T = graft.operators.TextAnalysis
      s"""WITH corpus AS (
            SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash, text
            FROM (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
            GROUP BY md5(text), text),
          ${T.duckRepCtes("corpus")}
          SELECT c.content_hash, r.n_tokens, r.top2_frac, r.top3_frac,
                 r.dup5_frac, r.rep_keep
          FROM rep r JOIN corpus c USING (doc_id)"""
    },
    "st24_stream_pivot_serve" -> graft.operators.Relational.oracles("a12_event_pivot"),
    "st16_stream_decontam" -> {
      val D = graft.operators.Dedup
      val h = graft.functions.Portable.duckHash60("s")
      s"""WITH ${D.duckEvalCorpus},
          evsh AS (SELECT doc_id AS eval_id,
                          unnest(list_transform(${D.duckShingleExpr}, s -> $h)) AS s
                   FROM ev),
          evk AS (SELECT eval_id, s FROM (
                    SELECT eval_id, s, COUNT(*) OVER (PARTITION BY s) AS df
                    FROM evsh)
                  WHERE df <= ${D.DfCap}),
          tr AS (SELECT doc_id,
                        unnest(list_transform(${D.duckShingleExpr}, s -> $h)) AS s
                 FROM documents),
          prs AS (SELECT tr.doc_id, evk.eval_id, COUNT(*) AS inter
                  FROM tr JOIN evk USING (s)
                  GROUP BY 1, 2 HAVING COUNT(*) >= ${D.MinContamHits})
          SELECT doc_id, COUNT(*) AS n_eval_hits, MAX(inter) AS max_overlap
          FROM prs GROUP BY doc_id"""
    },
    "st18_stream_curation" -> {
      val T = graft.operators.TextAnalysis
      val D = graft.operators.Dedup
      val P = graft.functions.Portable
      val u = P.duckHash60("concat('prep:', md5(text))")
      val sp = P.duckHash60("concat('split:', md5(text))")
      val h = P.duckHash60("s")
      s"""WITH corpus AS (
            SELECT doc_id, text, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text, n_chars
            FROM documents WHERE doc_id % 10 = 0),
          ${T.duckPrepGates("corpus")},
          ${D.duckEvalCorpus},
          evsh AS (SELECT doc_id AS eval_id,
                          unnest(list_transform(${D.duckShingleExpr}, s -> $h)) AS s
                   FROM ev),
          evk AS (SELECT eval_id, s FROM (
                    SELECT eval_id, s, COUNT(*) OVER (PARTITION BY s) AS df
                    FROM evsh)
                  WHERE df <= ${D.DfCap}),
          tsh AS (SELECT doc_id,
                         unnest(list_transform(${D.duckShingleExpr}, s -> $h)) AS s
                  FROM corpus),
          cpr AS (SELECT t.doc_id, e.eval_id
                  FROM tsh t JOIN evk e USING (s)
                  GROUP BY 1, 2 HAVING COUNT(*) >= ${D.MinContamHits}),
          contam AS (SELECT DISTINCT doc_id FROM cpr),
          ${T.duckBpeCtes("documents")},
          ${T.duckBpeVocabCounts},
          btok AS (SELECT doc_id, token
                   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                         FROM corpus)
                   WHERE len(token) > 0),
          bcnt AS (SELECT doc_id, CAST(SUM(COALESCE(vs.n_sub, 0)) AS BIGINT) AS n_bpe_tokens
                   FROM btok LEFT JOIN vs USING (token) GROUP BY 1),
          stbase AS (
            SELECT DISTINCT md5(text) AS content_hash, text, quality_score,
                   ($u) % 100 AS u,
                   CASE WHEN ($sp) % 100 < ${T.TrainPct} THEN 'train' ELSE 'val' END AS split,
                   n_bpe_tokens
            FROM (SELECT ps.text, ps.quality_score, b.n_bpe_tokens
                  FROM ps
                  JOIN bcnt b ON b.doc_id = ps.doc_id
                  LEFT JOIN contam ct ON ct.doc_id = ps.doc_id
                  WHERE ps.quality_score >= 2 AND ps.en_ok AND ct.doc_id IS NULL
                    AND ($u) % 100 < 80)),
          stdoc AS (SELECT content_hash AS doc_id, text FROM stbase),
          ${T.duckLmModelCtes},
          ${T.duckLmScoreCtes("stdoc")},
          psdoc AS (SELECT * FROM ps WHERE doc_id < 1000000),
          ${T.duckNbModelCtes("psdoc")},
          ${T.duckNbScoreCtes("stdoc")}
          SELECT b.content_hash, b.quality_score, b.u, b.split, b.n_bpe_tokens,
                 l.avg_lp_micro, n.log_odds_micro
          FROM stbase b
          JOIN lmsc l ON l.doc_id = b.content_hash
          JOIN nbsc n ON n.doc_id = b.content_hash
          WHERE l.avg_lp_micro >= CAST(${T.PplGateMicro} AS DOUBLE)
            AND n.log_odds_micro >= 0"""
    },
    "st15_stream_corpus_prep" -> {
      val T = graft.operators.TextAnalysis
      val u = graft.functions.Portable.duckHash60("concat('prep:', md5(text))")
      s"""WITH corpus AS (
            SELECT doc_id, text, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text, n_chars
            FROM documents WHERE doc_id % 10 = 0),
          ${T.duckPrepGates("corpus")}
          SELECT DISTINCT content_hash, quality_score, u FROM (
            SELECT md5(text) AS content_hash, quality_score, en_ok,
                   ($u) % 100 AS u
            FROM ps)
          WHERE quality_score >= 2 AND en_ok AND u < 80"""
    },
    "st14_stream_index" -> {
      val S = graft.operators.Similarity
      s"""WITH ${S.duckVecs},
          ${S.duckTrainedCoarse},
          ${S.duckCtAssign},
          ${S.duckPqTrain}
          SELECT enc.vec_id, enc.m, enc.code, a.cell_id
          FROM enc JOIN a USING (vec_id)"""
    },
    "st01_stream_dau" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, COUNT(DISTINCT user_id) AS dau
         FROM events GROUP BY 1""",
    "st02_stream_wide_join" ->
      s"""SELECT l_orderkey AS order_id, l_linenumber AS order_detail_id,
                 l_extendedprice AS sku_total, o_totalprice AS final_total_amount,
                 o_custkey AS user_id
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            AND l_shipdate BETWEEN o_orderdate - $range AND o_orderdate + $range""",
    "st03_first_order_flag" ->
      """SELECT o_orderkey, o_custkey,
                CASE WHEN row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
                     THEN '1' ELSE '0' END AS if_first_order
         FROM orders""",
    "st04_cdc_route" ->
      """SELECT event_id, event_type, 'ods_' || event_type AS route, user_id
         FROM events WHERE event_type IN ('purchase','signup','click')""",
    "st05_outer_wide_join" ->
      s"""SELECT o_orderkey AS order_id, o_custkey AS user_id,
                 o_totalprice AS final_total_amount,
                 l_linenumber AS order_detail_id,
                 COALESCE(l_extendedprice, 0.0) AS sku_total,
                 CASE WHEN l_orderkey IS NULL THEN 'order_only' ELSE 'matched' END AS join_state
          FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
            AND l_shipdate BETWEEN o_orderdate - $range AND o_orderdate + $range""",
    "st06_sliding_window" ->
      """WITH w AS (
           SELECT event_type,
                  unnest([(epoch_ms(ts) // 10800000) * 10800000,
                          (epoch_ms(ts) // 10800000) * 10800000 - 10800000]) AS ws_ms
           FROM events)
         SELECT strftime(make_timestamp(ws_ms * 1000), '%Y-%m-%d %H:%M:%S') AS window_start,
                strftime(make_timestamp((ws_ms + 21600000) * 1000), '%Y-%m-%d %H:%M:%S') AS window_end,
                event_type, COUNT(*) AS n_events
         FROM w GROUP BY 1, 2, 3""",
    "st07_agg_upsert" ->
      """SELECT p_brand,
                SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100 AS revenue,
                COUNT(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "st13_leaderboard" ->
      """SELECT p_brand,
                SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100 AS revenue,
                COUNT(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand
         ORDER BY revenue DESC, p_brand LIMIT 10""",
    "st08_session_window" ->
      """WITH e AS (
           SELECT user_id, make_timestamp(epoch_us(ts)) AS ts FROM events),
         o AS (
           SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_sess
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts,
                  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM o)
         SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
                user_id, COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid""",
    "st10_full_outer_join" ->
      s"""SELECT COALESCE(o_orderkey, l_orderkey) AS order_id,
                 o_custkey AS user_id,
                 COALESCE(o_totalprice, 0.0) AS final_total_amount,
                 l_linenumber AS order_detail_id,
                 COALESCE(l_extendedprice, 0.0) AS sku_total,
                 CASE WHEN l_orderkey IS NULL THEN 'order_only'
                      WHEN o_orderkey IS NULL THEN 'line_only'
                      ELSE 'matched' END AS join_state
          FROM (SELECT * FROM orders WHERE o_orderkey % 97 <> 0) o
          FULL JOIN lineitem
            ON l_orderkey = o_orderkey
            AND l_shipdate BETWEEN o_orderdate - $range AND o_orderdate + $range""",
    "st11_stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM events""",
    "st12_stream_neardup" ->
      s"""WITH ${graft.operators.Dedup.duckNearCorpusSql},
          ${graft.operators.Dedup.duckSimhashBandsSql},
          o AS (SELECT doc_id, fp,
                       MIN(doc_id) OVER (PARTITION BY band, bkey) AS owner,
                       FIRST_VALUE(fp) OVER (PARTITION BY band, bkey ORDER BY doc_id) AS owner_fp
                FROM bands)
          SELECT doc_id FROM o GROUP BY doc_id
          HAVING bool_and(owner = doc_id
                          OR bit_count(xor(fp, owner_fp)) > ${graft.operators.Dedup.MaxHamming})""",
    "st09_stream_allocation" ->
      """WITH j AS (
           SELECT l_orderkey AS order_id, l_linenumber AS line_id,
                  ROUND(l_extendedprice * 100) AS line_cents,
                  ROUND(o_totalprice * 100) AS total_cents
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ), w AS (
           SELECT *,
                  row_number() OVER (PARTITION BY order_id ORDER BY line_id, line_cents) AS rn,
                  COUNT(*) OVER (PARTITION BY order_id) AS n_lines,
                  SUM(line_cents) OVER (PARTITION BY order_id) AS sum_line_cents
           FROM j
         ), p AS (
           SELECT *, FLOOR(total_cents * line_cents / sum_line_cents) AS prop_cents
           FROM w
         )
         SELECT order_id, line_id,
                line_cents / 100 AS sku_total,
                CASE WHEN rn = n_lines
                     THEN (total_cents - (SUM(prop_cents) OVER (PARTITION BY order_id) - prop_cents)) / 100
                     ELSE prop_cents / 100 END AS final_detail_amount
         FROM p""",
  )
}
