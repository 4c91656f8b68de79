package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable

/** The END-TO-END curation capstone: one query composing every stage of
  * the LLM training-data pipeline that the per-stage operators build —
  * the flow a real pretraining corpus runs before the dataloader reads
  * it (the reference's own layered ODS→DWD→DWS→ADS architecture is the
  * precedent for chained stages, dws/OrderWiderApp.scala consuming
  * the dwd layer's output; here the layers are curation stages instead of
  * warehouse tiers).
  *
  * Stage composition (c01):
  *   1. quality + language gates (t13's shared per-row columns,
  *      [[TextAnalysis.prepQualityCol]]/`prepEnOkCol`) — one scan;
  *   2. exact-dedup survivors (d01's min-id keeper per content hash);
  *   3. MINUS decontamination hits (d08's rare-shingle train×eval
  *      collisions — the stage t13's manifest ignored);
  *   4. deterministic stratified sampling (t15's salted-hash rule);
  *   5. REAL tokenizer counts: per-doc BPE token totals from the
  *      trained shared artifact ([[TextAnalysis.bpeIdx]] — t12's
  *      lookup, not t14's whitespace proxy);
  *   6. sequence packing (t14's concat-then-chunk rule) over the BPE
  *      counts, partitioned by (split, shard) so train and val pack
  *      independently;
  *   7. t09's salted train/val split labels the packed rows.
  *
  * Emits the training manifest: (doc_id, split, shard, quality_score,
  * n_bpe_tokens, seq_id, start_off) — exactly what a dataloader
  * consumes. The DuckDB twin composes the SAME CTE fragments the
  * per-stage oracles use, so the differential check covers the
  * cross-stage contracts (gate-before-dedup commutation, anti-join
  * semantics, count/packing arithmetic), which no per-stage oracle
  * can.
  *
  * Scale shape: gates, sample bucket, and split are per-row
  * expressions on ONE corpus scan; the stateful stages are each a
  * single keyed shuffle — content-hash aggregation (map-side partial
  * min) + keeper equi-join, the d08 shingle-key shuffle (bounded by
  * the df-cap, eval side broadcastable), the word→vocab equi-join +
  * per-doc count aggregation (both with map-side partials), and ONE
  * exchange on (split, shard) for the packing window's per-partition
  * running sum (t14's proven shape). The gated manifest feeds two
  * consumers (token counting and the final join), so it is
  * persist()-marked; the caller clears the cache (the d02/d04 lazy
  * contract).
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  val c01_curation_pipeline: Q = (spark, dir) => {
    graft.plans.GraftExtensions.register(spark)
    val T = TextAnalysis
    val docs = documents(spark, dir)
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val contaminated = Dedup.d08_decontam(spark, dir).select(col("doc_id"))
    val split9 = when(
      Portable.hash60(concat(lit("split:"), col("doc_id").cast("string"))) % 100 < T.TrainPct,
      "train").otherwise("val")
    val sampleU = pmod(
      Portable.hash60(concat(lit("sample:"), col("doc_id").cast("string"))), lit(10000L))
    val rate = T.SampleRates.foldLeft(lit(1.0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    val gated = docs
      .select(col("doc_id"), col("lang"), col("text"),
        T.prepQualityCol.as("quality_score"), T.prepEnOkCol.as("en_ok"),
        sampleU.as("u"), split9.as("split"))
      .where(col("quality_score") >= 2 && col("en_ok") &&
        col("u") < (rate * 10000).cast("long"))
      .join(keepers, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = T.bpeIdx(spark, dir, "vocab")
      .select(col("token"), size(split(col("syms"), " ")).cast("long").as("n_sub"))
    val counts = gated
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .join(vocab, "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sub")).as("n_bpe_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    gated.select(col("doc_id"), col("quality_score"), col("split"))
      .join(counts, "doc_id")
      .withColumn("shard", pmod(col("doc_id"), lit(T.PackShards.toLong)))
      .withColumn("cum", sum(col("n_bpe_tokens")).over(w))
      .select(col("doc_id"), col("split"), col("shard"), col("quality_score"),
        col("n_bpe_tokens"),
        floor((col("cum") - col("n_bpe_tokens")) / lit(T.PackBudget.toDouble)).as("seq_id"),
        ((col("cum") - col("n_bpe_tokens")) % T.PackBudget).as("start_off"))
  }

  val queries: Map[String, Q] = Map(
    "c01_curation_pipeline" -> c01_curation_pipeline,
  )

  private def duckC01Sql: String = {
    val T = TextAnalysis
    val D = Dedup
    val splitH = Portable.duckHash60("concat('split:', CAST(ps.doc_id AS VARCHAR))")
    val sampleH = Portable.duckHash60("concat('sample:', CAST(ps.doc_id AS VARCHAR))")
    val caseRate = T.SampleRates.foldRight("1.0") { case ((l, r), acc) =>
      s"CASE WHEN d.lang = '$l' THEN $r ELSE $acc END"
    }
    val shingleH = Portable.duckHash60("s")
    s"""WITH ${T.duckPrepGates("documents")},
        keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        ${D.duckEvalCorpus},
        ccorp AS (SELECT doc_id, text, 't' AS role FROM documents
                  UNION ALL SELECT doc_id, text, 'e' AS role FROM ev),
        cx0 AS (SELECT doc_id, role,
                       unnest(list_transform(${D.duckShingleExpr}, s -> $shingleH)) AS s
                FROM ccorp),
        cx AS (SELECT doc_id, role, s FROM (
                 SELECT doc_id, role, s, COUNT(*) OVER (PARTITION BY s) AS df
                 FROM cx0)
               WHERE df <= ${D.DfCap}),
        cpr AS (SELECT a.doc_id AS doc_id, b.doc_id AS eval_id, COUNT(*) AS inter
                FROM cx a JOIN cx b ON a.s = b.s
                WHERE a.role = 't' AND b.role = 'e'
                GROUP BY 1, 2 HAVING COUNT(*) >= ${D.MinContamHits}),
        contam AS (SELECT DISTINCT doc_id FROM cpr),
        base AS (SELECT ps.doc_id, ps.quality_score, ps.text,
                        CASE WHEN ($splitH) % 100 < ${T.TrainPct}
                             THEN 'train' ELSE 'val' END AS split
                 FROM ps
                 JOIN documents d ON d.doc_id = ps.doc_id
                 JOIN keepers k ON k.doc_id = ps.doc_id
                 LEFT JOIN contam c ON c.doc_id = ps.doc_id
                 WHERE ps.quality_score >= 2 AND ps.en_ok AND c.doc_id IS NULL
                   AND ($sampleH) % 10000 < CAST(($caseRate) * 10000 AS BIGINT)),
        ${T.duckBpeCtes("documents")},
        ${T.duckBpeVocabCounts},
        btok AS (SELECT doc_id, token
                 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                       FROM base)
                 WHERE len(token) > 0),
        bcnt AS (SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens
                 FROM btok JOIN vs USING (token) GROUP BY 1),
        pk AS (SELECT b.doc_id, b.split, b.doc_id % ${T.PackShards} AS shard,
                      b.quality_score, c.n_bpe_tokens,
                      CAST(SUM(c.n_bpe_tokens) OVER (
                        PARTITION BY b.split, b.doc_id % ${T.PackShards}
                        ORDER BY b.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM base b JOIN bcnt c USING (doc_id))
        SELECT doc_id, split, shard, quality_score, n_bpe_tokens,
               CAST(floor((cum - n_bpe_tokens) / ${T.PackBudget}.0) AS BIGINT) AS seq_id,
               (cum - n_bpe_tokens) % ${T.PackBudget} AS start_off
        FROM pk"""
  }

  val oracles: Map[String, String] = Map(
    "c01_curation_pipeline" -> duckC01Sql,
  )
}
