package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.{Portable, TopK}
import graft.plans.GraftExtensions

/** Similarity search over the `embeddings` table (`Array[Float]`
  * column): brute-force cosine top-k as the exactness baseline, an
  * IVF-style cell-probed top-k as the scale path, and embedding-cosine
  * near-dup pairs with bucketed candidate generation.
  *
  * Scale design: the cosine kernel is
  * [[graft.functions.CosineSimilarity]] — a custom Catalyst expression
  * whose fused dot+norms loop stays inside whole-stage codegen
  * (replacing the interpreted `aggregate`/`zip_with` chain, ~19×
  * faster measured at sf0.1). Top-k ranking runs through
  * [[graft.functions.TopK]] — a typed Aggregator whose map-side
  * partial aggregation keeps only k candidates per partition, so the
  * shuffle carries O(k × partitions) rows, not the full candidate set
  * (the Window+row_number alternative shuffles and sorts everything).
  * The query set is bounded and broadcast; the vector scan is
  * embarrassingly parallel. Scores are rounded to 6 dp before ranking
  * so the DuckDB differential oracle ranks identically.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private val K = 10
  private val NumQueries = 5 // vec_id < 5 form the query set

  /** cosine (codegen'd) rounded to 6 dp — stable across engines. */
  private def cos6(a: Column, b: Column): Column =
    round(call_function("cosine_sim", a, b) * 1000000) / 1000000

  private def explodeTopK(tk: DataFrame): DataFrame =
    tk.select(col("query_id"), posexplode(col("tk.items")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("neighbor_id"),
        col("col.score").as("cos6"))

  /** n01 — brute-force cosine top-k: every query (bounded set,
    * broadcast) against every vector, ranked by (cos desc, id asc)
    * through the bounded top-k Aggregator. This is the exact baseline
    * ANN variants are measured against.
    */
  val n01_cosine_topk: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos6(col("qv"), col("v")).as("c6"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(TopK.topK(K)(col("c6"), col("vec_id")).as("tk")))
  }

  /** n02 — IVF-style probed top-k: the `label` column plays the coarse
    * quantizer's cell assignment (a prior clustering step at ingest);
    * each query probes only its own cell, cutting the scanned
    * candidates by ~the cell count. Recall vs n01 is the standard IVF
    * trade; candidate generation is an equi-join on the cell id — no
    * cross product, shuffle keyed on the cell.
    */
  val n02_ivf_topk: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"), col("v").as("qv"))
    val scored = e.join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos6(col("qv"), col("v")).as("c6"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(TopK.topK(K)(col("c6"), col("vec_id")).as("tk")))
  }

  /** Every 100th vector seeds a centroid — a deterministic stand-in
    * for k-means init (k scales with the corpus: 5 cells at sf0.01, 50
    * at sf0.1).
    */
  private val CentroidStride = 100

  /** The IVF coarse quantizer's assignment step: score every vector
    * against every centroid (k = |centroids| is a small constant, so
    * the scoring join is a broadcast nested-loop over a bounded side —
    * n·k rows, never n²), then per-vector argmax via `max(struct)` with
    * deterministic (cos desc, centroid asc) tiebreak. Partial
    * aggregation collapses each vector's k scores map-side, so the
    * shuffle carries one row per vector. This is the step that makes
    * n02's cell-probed search usable on arbitrary embeddings (the
    * `label` column there is a pre-baked stand-in for this output).
    */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    scoredAssign(vectors, centroids, carryVec = false)

  /** [[assignCells]], optionally carrying the vector itself through
    * the argmax aggregation (`first` is deterministic here — every row
    * of a vec_id group holds the identical vector), so consumers that
    * need (cell, v) pairs avoid a join-back and a second scan of the
    * embeddings.
    */
  private def scoredAssign(vectors: DataFrame, centroids: DataFrame,
                           carryVec: Boolean): DataFrame = {
    val sc = struct(cos6(col("v"), col("cv")).as("s"), (-col("cid")).as("ncid")).as("sc")
    val carryIn = if (carryVec) Seq(col("v")) else Nil
    val scored = vectors.join(broadcast(centroids), lit(true), "inner")
      .select(col("vec_id") +: sc +: carryIn: _*)
    val carryAgg = if (carryVec) Seq(first(col("v")).as("v")) else Nil
    scored.groupBy(col("vec_id"))
      .agg(max(col("sc")).as("m"), carryAgg: _*)
      .select(col("vec_id") +: (-col("m.ncid")).as("cell_id") +:
        col("m.s").as("cos6") +: carryIn: _*)
  }

  private def centroidSeeds(e: DataFrame): DataFrame =
    e.where(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** n03 — centroid assignment over the embeddings table (the
    * quantizer feeding an IVF index; see [[assignCells]]).
    */
  val n03_cell_assign: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    assignCells(e, centroidSeeds(e))
  }

  /** n04 — one Lloyd's k-means update step: element-wise mean of each
    * cell's member vectors, emitted long-form as (cell_id, dim, cval).
    * Cross-engine exactness: elements are scaled to integer
    * thousandths and summed as longs (order-independent, unlike a
    * float sum), then divided once — both engines compute the same
    * double. Shuffle shape: the assignment carries the vector through
    * its argmax aggregation (no join-back, one scan of the
    * embeddings) → posexplode → one shuffle on (cell, dim) with
    * map-side partial sums. No driver-side state; centroids update as
    * a relation, ready to feed the next [[assignCells]] round.
    */
  val n04_kmeans_step: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    scoredAssign(e, centroidSeeds(e), carryVec = true)
      .select(col("cell_id"), posexplode(col("v")))
      .select(col("cell_id"), col("pos").cast("long").as("dim"),
        round(col("col").cast("double") * 1000).cast("long").as("xi"))
      .groupBy(col("cell_id"), col("dim"))
      .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n_members"))
      .select(col("cell_id"), col("dim"),
        (col("sx").cast("double") / (col("n_members").cast("double") * 1000.0)).as("cval"),
        col("n_members"))
  }

  /** n05 — IVF probe end-to-end: the quantizer ([[assignCells]]) cells
    * BOTH the corpus and the queries, then each query probes only its
    * own computed cell — the fully-real IVF flow (n02's `label` column
    * is the pre-baked stand-in; here index build and probe both run on
    * arbitrary embeddings). Candidate generation stays an equi-join on
    * the computed cell id; ranking flows through the bounded TopK
    * Aggregator. Recall vs n01 is the standard single-probe IVF trade.
    */
  val n05_ivf_probe: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val cents = centroidSeeds(e)
    val assigned = scoredAssign(e, cents, carryVec = true)
      .select(col("vec_id"), col("cell_id"), col("v"))
    // assign the (bounded) query set in its own pass — reusing
    // `assigned` under broadcast() would recompute the full n×k
    // quantizer just to extract these rows
    val q = scoredAssign(e.where(col("vec_id") < NumQueries), cents, carryVec = true)
      .select(col("vec_id").as("query_id"), col("cell_id").as("qcell"), col("v").as("qv"))
    val scored = assigned.join(broadcast(q),
        col("cell_id") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos6(col("qv"), col("v")).as("c6"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(TopK.topK(K)(col("c6"), col("vec_id")).as("tk")))
  }

  /** Probe depths measured by [[n06_ivf_recall]]. */
  private val RecallProbes = Seq(1, 3)

  /** n06 — multi-probe IVF with MEASURED recall: the quantizer ranks
    * every centroid per query and the search probes the top-P cells
    * (P = 1 and 3), then recall@10 is computed against the exact
    * brute-force answer (n01) — the number a user actually tunes
    * `nprobe` against. Emits one row per (probes, query): recall@10 of
    * the probed search, so the standard IVF trade
    * (recall(P=1) ≤ recall(P=3) ≤ 1) is visible in the result itself.
    *
    * Scale shape: the corpus-side quantizer is the same broadcast
    * n·k scoring as n03/n05 (one pass, argmax map-side); the probe
    * list is |queries|·P rows (bounded, broadcast); candidates are an
    * equi-join on the cell id — a corpus vector's single cell matches
    * at most one probed cell per query, so no dedup is needed. The
    * assignment and the exact baseline feed both probe depths, so both
    * are persist()-marked; the caller (Verify/Bench) clears the cache
    * after materializing (same lazy-plan contract as d02/d04).
    */
  val n06_ivf_recall: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    import org.apache.spark.storage.StorageLevel
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val cents = centroidSeeds(e)
    val assigned = scoredAssign(e, cents, carryVec = true)
      .select(col("vec_id"), col("cell_id"), col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qvec = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // exact top-k baseline (n01's answer) — the recall denominator
    val exact = explodeTopK(
      e.join(broadcast(qvec), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cos6(col("qv"), col("v")).as("c6"))
        .groupBy("query_id")
        .agg(TopK.topK(K)(col("c6"), col("vec_id")).as("tk")))
      .select(col("query_id"), col("neighbor_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // rank ALL centroids once per query (|queries| × k rows, bounded);
    // each probe depth then keeps ranks ≤ P
    val qCells = qvec.join(broadcast(cents), lit(true), "inner")
      .select(col("query_id"), col("cid"), cos6(col("qv"), col("cv")).as("c6"))
      .groupBy("query_id")
      .agg(TopK.topK(RecallProbes.max)(col("c6"), col("cid")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.items")))
      .select(col("query_id"), (col("pos") + 1).as("cell_rank"),
        col("col.id").as("qcell"))
    val perP = RecallProbes.map { p =>
      val probed = qCells.where(col("cell_rank") <= p)
        .join(qvec, "query_id")
        .select(col("query_id"), col("qcell"), col("qv"))
      val ivf = explodeTopK(
        assigned.join(broadcast(probed),
            col("cell_id") === col("qcell") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), cos6(col("qv"), col("v")).as("c6"))
          .groupBy("query_id")
          .agg(TopK.topK(K)(col("c6"), col("vec_id")).as("tk")))
        .select(col("query_id"), col("neighbor_id"))
      val matched = ivf.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("matched"))
      qvec.select(col("query_id"))
        .join(matched, Seq("query_id"), "left")
        .select(lit(p.toLong).as("probes"), col("query_id"),
          (coalesce(col("matched"), lit(0L)).cast("double") / lit(10.0)).as("recall10"))
    }
    perP.reduce(_ unionAll _)
  }

  /** PQ shape: 8 subquantizers × 8 dims over the 64-dim embeddings. */
  private val PqSubs = 8
  private val SubDim = 8

  /** PQ codebooks sample denser than the IVF coarse quantizer (every
    * 20th vector → 25 sub-centroids per codebook at sf0.01): each
    * subquantizer only spans 8 dims, so code variety — not cell
    * breadth — is what recall hinges on (production trains 256 per
    * codebook with k-means; the sampled stand-in keeps the operator
    * deterministic and oracle-checkable).
    */
  private val PqCentroidStride = 20

  private def pqCentroidSeeds(e: DataFrame): DataFrame =
    e.where(col("vec_id") % PqCentroidStride === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** Squared-L2 between two float-array slices in integer micro-units
    * (exact long arithmetic downstream — a double SUM over a group is
    * order-dependent and engines disagree in the last ulp; long sums
    * are associative).
    */
  private def l2micro(a: Column, b: Column): Column =
    round(call_function("l2_sq", a, b) * 1000000).cast("long")

  private def sub(v: Column, m: Int): Column = slice(v, m * SubDim + 1, SubDim)

  /** n08 — PQ recall@10: n07's compressed-domain answer measured
    * against the exact baseline, per query — the accuracy number a
    * user weighs against PQ's 32× memory compression (the same
    * methodology as n06's nprobe recall; together they quantify both
    * ANN trade axes: probe breadth and code coarseness). The synthetic
    * near-uniform embeddings are PQ's adversarial case (no cluster
    * structure to quantize onto, so reconstruction error dominates);
    * the measured ~0.2 here is the honest floor, not the operator's
    * ceiling on real embedding spaces.
    */
  val n08_pq_recall: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val qvec = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = explodeTopK(
      e.join(broadcast(qvec), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cos6(col("qv"), col("v")).as("c6"))
        .groupBy("query_id")
        .agg(TopK.topK(K)(col("c6"), col("vec_id")).as("tk")))
      .select(col("query_id"), col("neighbor_id"))
    val pq = n07_pq_topk(spark, dir).select(col("query_id"), col("neighbor_id"))
    val matched = pq.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("matched"))
    qvec.select(col("query_id"))
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("matched"), lit(0L)).cast("double") / lit(10.0)).as("recall10"))
  }

  /** n07 — product quantization + ADC top-k: each vector is encoded as
    * [[PqSubs]] codebook ids (argmin squared-L2 per subvector against
    * the sampled sub-codebooks), compressing 64 floats (256 B) to 8
    * small codes — the memory/scan-bandwidth path a 100 TB vector
    * corpus actually takes. Search is asymmetric distance computation:
    * the query precomputes a (subquantizer, code) → distance lookup
    * table (|Q|·M·k rows, bounded, broadcast), and scanning the corpus
    * is M table lookups + an exact integer sum per vector — no float
    * loop over the original vectors at query time. Ranking flows
    * through the bounded TopK Aggregator on negated distance.
    *
    * Scale shape: encoding is one broadcast n·k join with ALL M
    * subquantizer argmins collapsing in a single map-side partial
    * aggregation (one shuffle of one row per vector); the ADC scan is
    * an equi-join of the code table against the broadcast LUT followed
    * by one aggregation keyed (query, vector). The codes table is what
    * an index build persists; distances are micro-unit longs end to
    * end so both engines rank identically.
    */
  /** PQ encoder: (vec_id, m, code) rows — all M subquantizer argmins
    * collapse in ONE map-side aggregation over a single broadcast n·k
    * join (this table is what a PQ index build persists).
    */
  private def pqEncode(e: DataFrame, books: DataFrame): DataFrame = {
    val aggs = (0 until PqSubs).map { m =>
      min(struct(l2micro(sub(col("v"), m), sub(col("cv"), m)).as("d"),
        col("cid").as("c"))).as(s"m$m")
    }
    e.join(broadcast(books), lit(true), "inner")
      .groupBy(col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"), explode(array((0 until PqSubs).map { m =>
        struct(lit(m).as("m"), col(s"m$m").getField("c").as("code"))
      }: _*)).as("mc"))
      .select(col("vec_id"), col("mc.m").as("m"), col("mc.code").as("code"))
  }

  /** ADC lookup table: distance from each query subvector to every
    * sub-centroid — (query_id, m, code, d) rows, bounded |Q|·M·k.
    */
  private def pqLut(q: DataFrame, books: DataFrame): DataFrame =
    q.join(broadcast(books), lit(true), "inner")
      .select(col("query_id"), explode(array((0 until PqSubs).map { m =>
        struct(lit(m).as("m"), col("cid").as("code"),
          l2micro(sub(col("qv"), m), sub(col("cv"), m)).as("d"))
      }: _*)).as("x"))
      .select(col("query_id"), col("x.m").as("m"), col("x.code").as("code"),
        col("x.d").as("d"))

  /** Rank ADC candidate distances into the per-query top-k list. */
  private def adcTopK(adc: DataFrame): DataFrame =
    adc.select(col("query_id"), col("vec_id"),
        (-col("amicro").cast("double")).as("s"))
      .groupBy("query_id")
      .agg(TopK.topK(K)(col("s"), col("vec_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.items")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("neighbor_id"),
        (-col("col.score") / 1000000.0).as("adist6"))

  val n07_pq_topk: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val cents = pqCentroidSeeds(e)
    val enc = pqEncode(e, cents)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val lut = pqLut(q, cents)
    val adc = enc.join(broadcast(lut), Seq("m", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("amicro"))
    adcTopK(adc)
  }

  /** n09 — IVFADC, the production vector-index shape (coarse cell
    * probe for candidate generation + compressed-domain ADC ranking):
    * the corpus carries BOTH its IVF cell assignment and its PQ codes;
    * a query probes its own cell and ranks only that cell's members,
    * by table lookups over the codes — so query-time work is
    * O(cell size × M) lookups, never a float loop over raw vectors,
    * and the scanned bytes are the 8-code rows, not the 256-byte
    * embeddings. Composes [[assignCells]] (n03) with [[pqEncode]]/
    * [[pqLut]] (n07); candidates are an equi-join on the cell id.
    */
  val n09_ivfadc_topk: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding").as("v"))
    val coarse = centroidSeeds(e)
    val books = pqCentroidSeeds(e)
    val cellOf = assignCells(e, coarse).select(col("vec_id"), col("cell_id"))
    val enc = pqEncode(e, books)
    val qcells = assignCells(e.where(col("vec_id") < NumQueries), coarse)
      .select(col("vec_id").as("query_id"), col("cell_id").as("qcell"))
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val lut = pqLut(q, books)
    val cand = enc.join(cellOf, "vec_id")
      .join(broadcast(qcells),
        col("cell_id") === col("qcell") && col("vec_id") =!= col("query_id"))
    val adc = cand.join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("amicro"))
    adcTopK(adc)
  }

  private val NearDupThreshold = 0.8

  /** Max members a cell may hold before its candidate self-join is
    * split into hash sub-buckets. A cell of c members emits c² pairs
    * from the within-cell join — one pathological cell is a guaranteed
    * hot-partition explosion at scale (the same failure mode d04's
    * df-cap closes for stop-shingles). Sub-bucketing bounds the per-key
    * fan-out at ~cap² while keeping ~1/nsub of the in-cell pairs (the
    * standard recall trade; production re-probes or re-clusters
    * oversized cells).
    */
  val CellCap = 200

  /** [[d05_embedding_neardup]]'s candidate/verify plan over an
    * arbitrary (vec_id, label, v) corpus, exposed for the oversized-
    * cell spec. Per-cell counts flow through a `groupBy` (map-side
    * partial counts — only (label, n) pairs shuffle) and broadcast back
    * (one row per cell; cell count is an index parameter like the
    * centroid set, not data-scale), so the full-width rows are shuffled
    * exactly once, on the (label, sub) join key — oversized cells
    * spread across sub-buckets instead of landing on one partition.
    */
  private[graft] def nearDupPairs(corpus: DataFrame, cellCap: Int): DataFrame = {
    val counts = corpus.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    val sub = corpus.join(broadcast(counts), "label")
      .select(col("vec_id"), col("label"), col("v"),
        (Portable.hash60(col("vec_id").cast("string")) %
          floor((col("cnt") + lit(cellCap - 1)) / lit(cellCap))).as("sub"))
    val a = sub.select(col("vec_id").as("vec_a"), col("label"), col("sub"), col("v").as("va"))
    val b = sub.select(col("vec_id").as("vec_b"), col("label").as("lb"),
      col("sub").as("subb"), col("v").as("vb"))
    a.join(b, col("label") === col("lb") && col("sub") === col("subb") &&
        col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("label"),
        cos6(col("va"), col("vb")).as("cos6"))
      .where(col("cos6") >= NearDupThreshold)
  }

  /** d05 — embedding-cosine near-dup pairs: candidates are generated
    * *within a bucket* (the `label` cell — at scale an LSH/IVF bucket
    * id), never all-pairs, and cells above [[CellCap]] members are
    * hash-split into sub-buckets so no single cell can emit c² pairs
    * (see [[nearDupPairs]]). Pairs with cosine ≥ 0.8 are emitted. The
    * natural corpus has no near-dups (max natural cosine ≈ 0.51), so
    * the corpus adds perturbed copies of every 10th vector (first 8
    * dims zeroed → cosine ≈ 0.94 against the original) to make the
    * check non-vacuous. Note the recall trade applies to planted pairs
    * too: once a cell exceeds the cap, a copy lands in its original's
    * sub-bucket only with probability ~1/nsub (the sub split hashes
    * vec_id, so pair co-location is not preserved) — at sf0.01 every
    * cell is under the cap and all planted pairs surface.
    */
  val d05_embedding_neardup: Q = (spark, dir) => {
    GraftExtensions.register(spark)
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
    val pert = e.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        concat(array_repeat(lit(0.0f), 8), slice(col("v"), 9, 56)).as("v"))
    nearDupPairs(e.unionAll(pert), CellCap)
  }

  val queries: Map[String, Q] = Map(
    "n01_cosine_topk" -> n01_cosine_topk,
    "n02_ivf_topk" -> n02_ivf_topk,
    "n03_cell_assign" -> n03_cell_assign,
    "n04_kmeans_step" -> n04_kmeans_step,
    "n05_ivf_probe" -> n05_ivf_probe,
    "n06_ivf_recall" -> n06_ivf_recall,
    "n07_pq_topk" -> n07_pq_topk,
    "n08_pq_recall" -> n08_pq_recall,
    "n09_ivfadc_topk" -> n09_ivfadc_topk,
    "d05_embedding_neardup" -> d05_embedding_neardup,
  )

  private val duckVecs =
    """e AS (SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
       n AS (SELECT vec_id, label, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
             FROM e)"""

  private val duckCos =
    "round(list_sum(list_transform(list_zip(qv, v), t -> t[1] * t[2])) / (qn * nrm) * 1000000) / 1000000"

  /** CTE chain `c, m, enc, pqq, lut` implementing the PQ encode + ADC
    * lookup table over `$duckVecs`'s `e` — shared by the n07/n08/n09
    * oracles (each defines its own `adc`: unrestricted full scan for
    * n07/n08, cell-filtered for IVFADC n09). Distances are micro-unit
    * BIGINTs, mirroring the Spark side exactly (see [[n07_pq_topk]]).
    */
  private val duckPqCtes: String = {
    def l2m(a: String, b: String) =
      s"CAST(round(list_sum(list_transform(list_zip($a, $b), t -> (t[1]-t[2])*(t[1]-t[2]))) * 1000000) AS BIGINT)"
    def sl(v: String) = s"$v[m.m*$SubDim+1 : m.m*$SubDim+$SubDim]"
    s"""c AS (SELECT vec_id AS cid, v AS cv FROM e
              WHERE vec_id % $PqCentroidStride = 0),
        m AS (SELECT unnest(range(0, $PqSubs)) AS m),
        enc AS (
          SELECT vec_id, m, cid AS code FROM (
            SELECT e.vec_id, m.m, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id, m.m
                     ORDER BY ${l2m(sl("e.v"), sl("c.cv"))}, c.cid) AS rn
            FROM e, m, c)
          WHERE rn = 1),
        pqq AS (SELECT vec_id AS query_id, v AS qv FROM e
                WHERE vec_id < $NumQueries),
        lut AS (SELECT query_id, m.m AS m, c.cid AS code,
                       ${l2m(sl("pqq.qv"), sl("c.cv"))} AS dmicro
                FROM pqq, m, c)"""
  }

  /** n07/n08's unrestricted ADC scan (every encoded vector). */
  private val duckAdcFull: String =
    """adc AS (SELECT query_id, vec_id,
                      CAST(SUM(dmicro) AS BIGINT) AS amicro
               FROM enc JOIN lut USING (m, code)
               WHERE vec_id <> query_id
               GROUP BY 1, 2)"""

  /** The shared `SELECT` tail ranking `adc` into per-query top-k. */
  private val duckAdcRank: String =
    s"""SELECT query_id,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY amicro, vec_id) AS BIGINT) AS rnk,
               vec_id AS neighbor_id,
               CAST(amicro AS DOUBLE) / 1000000.0 AS adist6
        FROM adc QUALIFY rnk <= $K"""

  val oracles: Map[String, String] = Map(
    "n01_cosine_topk" ->
      s"""WITH $duckVecs,
          q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
          p AS (SELECT query_id, vec_id, $duckCos AS cos6
                FROM q JOIN n ON vec_id <> query_id)
          SELECT query_id,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) AS BIGINT) AS rnk,
                 vec_id AS neighbor_id, cos6
          FROM p QUALIFY rnk <= $K""",
    "n02_ivf_topk" ->
      s"""WITH $duckVecs,
          q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
                FROM n WHERE vec_id < $NumQueries),
          p AS (SELECT query_id, vec_id, $duckCos AS cos6
                FROM q JOIN n ON n.label = qlabel AND vec_id <> query_id)
          SELECT query_id,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) AS BIGINT) AS rnk,
                 vec_id AS neighbor_id, cos6
          FROM p QUALIFY rnk <= $K""",
    "n03_cell_assign" ->
      s"""WITH $duckVecs,
          c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
                WHERE vec_id % $CentroidStride = 0),
          p AS (SELECT n.vec_id, cid,
                       round(list_sum(list_transform(list_zip(cv, v), t -> t[1] * t[2]))
                             / (cn * nrm) * 1000000) / 1000000 AS cos6
                FROM n, c)
          SELECT vec_id, cid AS cell_id, cos6
          FROM p QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) = 1""",
    "n04_kmeans_step" ->
      s"""WITH $duckVecs,
          c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
                WHERE vec_id % $CentroidStride = 0),
          p AS (SELECT n.vec_id, cid,
                       round(list_sum(list_transform(list_zip(cv, v), t -> t[1] * t[2]))
                             / (cn * nrm) * 1000000) / 1000000 AS cos6
                FROM n, c),
          a AS (SELECT vec_id, cid AS cell_id
                FROM p QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) = 1),
          x AS (SELECT cell_id,
                       unnest(range(0, len(v))) AS dim,
                       CAST(round(unnest(list_transform(v, q -> q * 1000)) ) AS BIGINT) AS xi
                FROM a JOIN e USING (vec_id))
          SELECT cell_id, dim,
                 CAST(SUM(xi) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000.0) AS cval,
                 COUNT(*) AS n_members
          FROM x GROUP BY cell_id, dim""",
    "n05_ivf_probe" ->
      s"""WITH $duckVecs,
          c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
                WHERE vec_id % $CentroidStride = 0),
          p AS (SELECT n.vec_id, cid,
                       round(list_sum(list_transform(list_zip(cv, v), t -> t[1] * t[2]))
                             / (cn * nrm) * 1000000) / 1000000 AS cos6
                FROM n, c),
          a AS (SELECT vec_id, cid AS cell_id
                FROM p QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) = 1),
          av AS (SELECT a.vec_id, a.cell_id, n.v, n.nrm FROM a JOIN n USING (vec_id)),
          q AS (SELECT vec_id AS query_id, cell_id AS qcell, v AS qv, nrm AS qn
                FROM av WHERE vec_id < $NumQueries),
          s AS (SELECT query_id, av.vec_id,
                       round(list_sum(list_transform(list_zip(qv, av.v), t -> t[1] * t[2]))
                             / (qn * av.nrm) * 1000000) / 1000000 AS cos6
                FROM q JOIN av ON av.cell_id = qcell AND av.vec_id <> query_id)
          SELECT query_id,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) AS BIGINT) AS rnk,
                 vec_id AS neighbor_id, cos6
          FROM s QUALIFY rnk <= $K""",
    "n06_ivf_recall" ->
      s"""WITH $duckVecs,
          c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
                WHERE vec_id % $CentroidStride = 0),
          p AS (SELECT n.vec_id, cid,
                       round(list_sum(list_transform(list_zip(cv, v), t -> t[1] * t[2]))
                             / (cn * nrm) * 1000000) / 1000000 AS cos6
                FROM n, c),
          a AS (SELECT vec_id, cid AS cell_id FROM p
                QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) = 1),
          av AS (SELECT a.vec_id, a.cell_id, n.v, n.nrm FROM a JOIN n USING (vec_id)),
          q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
                WHERE vec_id < $NumQueries),
          exact AS (SELECT query_id, vec_id
                    FROM (SELECT query_id, n.vec_id, $duckCos AS cos6
                          FROM q JOIN n ON n.vec_id <> query_id)
                    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) <= $K),
          qc AS (SELECT query_id, cid AS qcell,
                        row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, cid) AS cell_rank
                 FROM (SELECT query_id, cid,
                              round(list_sum(list_transform(list_zip(qv, cv), t -> t[1] * t[2]))
                                    / (qn * cn) * 1000000) / 1000000 AS cos6
                       FROM q, c)),
          pr AS (SELECT unnest([${RecallProbes.mkString(", ")}]) AS probes),
          cand AS (SELECT pr.probes, qc.query_id, av.vec_id,
                          round(list_sum(list_transform(list_zip(q.qv, av.v), t -> t[1] * t[2]))
                                / (q.qn * av.nrm) * 1000000) / 1000000 AS cos6
                   FROM pr
                   JOIN qc ON qc.cell_rank <= pr.probes
                   JOIN av ON av.cell_id = qc.qcell
                   JOIN q ON q.query_id = qc.query_id
                   WHERE av.vec_id <> qc.query_id),
          ivf AS (SELECT probes, query_id, vec_id FROM cand
                  QUALIFY row_number() OVER (PARTITION BY probes, query_id ORDER BY cos6 DESC, vec_id) <= $K),
          m AS (SELECT probes, query_id, COUNT(*) AS matched
                FROM ivf JOIN exact USING (query_id, vec_id) GROUP BY 1, 2)
          SELECT CAST(pr.probes AS BIGINT) AS probes, q.query_id,
                 COALESCE(m.matched, 0) / 10.0 AS recall10
          FROM pr CROSS JOIN q
          LEFT JOIN m ON m.probes = pr.probes AND m.query_id = q.query_id""",
    "n07_pq_topk" ->
      s"""WITH $duckVecs, $duckPqCtes, $duckAdcFull
          $duckAdcRank""",
    "n09_ivfadc_topk" ->
      s"""WITH $duckVecs, $duckPqCtes,
          cc AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
                 WHERE vec_id % $CentroidStride = 0),
          pp AS (SELECT n.vec_id, cid,
                        round(list_sum(list_transform(list_zip(cv, v), t -> t[1] * t[2]))
                              / (cn * nrm) * 1000000) / 1000000 AS cos6
                 FROM n, cc),
          a AS (SELECT vec_id, cid AS cell_id FROM pp
                QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) = 1),
          qa AS (SELECT pqq.query_id, a.cell_id AS qcell
                 FROM pqq JOIN a ON a.vec_id = pqq.query_id),
          adc AS (SELECT l.query_id, enc.vec_id,
                         CAST(SUM(l.dmicro) AS BIGINT) AS amicro
                  FROM enc
                  JOIN a ON a.vec_id = enc.vec_id
                  JOIN qa ON qa.qcell = a.cell_id
                  JOIN lut l ON l.query_id = qa.query_id
                            AND l.m = enc.m AND l.code = enc.code
                  WHERE enc.vec_id <> qa.query_id
                  GROUP BY 1, 2)
          $duckAdcRank""",
    "n08_pq_recall" ->
      s"""WITH $duckVecs, $duckPqCtes, $duckAdcFull,
          qx AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
                 WHERE vec_id < $NumQueries),
          exact AS (SELECT query_id, vec_id
                    FROM (SELECT query_id, n.vec_id, $duckCos AS cos6
                          FROM qx JOIN n ON n.vec_id <> query_id)
                    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) <= $K),
          pqt AS (SELECT query_id, vec_id FROM adc
                  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY amicro, vec_id) <= $K),
          mx AS (SELECT query_id, COUNT(*) AS matched
                 FROM pqt JOIN exact USING (query_id, vec_id) GROUP BY 1)
          SELECT qx.query_id, COALESCE(mx.matched, 0) / 10.0 AS recall10
          FROM qx LEFT JOIN mx USING (query_id)""",
    "d05_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          corpus AS (
            SELECT vec_id, label, v FROM e
            UNION ALL
            SELECT vec_id + 1000000, label,
                   list_concat([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], v[9:])
            FROM e WHERE vec_id % 10 = 0),
          counts AS (SELECT label, COUNT(*) AS cnt FROM corpus GROUP BY label),
          sb AS (SELECT vec_id, corpus.label, v,
                   ${Portable.duckHash60("CAST(vec_id AS VARCHAR)")} %
                     ((cnt + ${CellCap - 1}) // $CellCap) AS sub
                 FROM corpus JOIN counts USING (label)),
          n AS (SELECT vec_id, label, sub, v,
                  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
                FROM sb),
          p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
                  round(list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
                        / (a.nrm * b.nrm) * 1000000) / 1000000 AS cos6
                FROM n a JOIN n b ON a.label = b.label AND a.sub = b.sub
                                 AND a.vec_id < b.vec_id)
          SELECT vec_a, vec_b, label, cos6 FROM p WHERE cos6 >= $NearDupThreshold""",
  )
}
