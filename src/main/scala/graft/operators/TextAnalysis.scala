package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: language-ID heuristic, token statistics, quality
  * scoring, and winnowing-style document fingerprinting.
  *
  * Everything is a pure per-row projection (no shuffle at all — these
  * scale embarrassingly): split / higher-order array functions /
  * integer arithmetic, all Catalyst built-ins under whole-stage
  * codegen. Ratios are exact small-integer divisions so the DuckDB
  * oracles produce bit-identical doubles.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  /** Function words whose frequency drives the language heuristic. */
  private val StopWords = Seq("a", "the")
  private val StopRatioEn = 0.08

  /** t01 — language-ID heuristic: ratio of English function words
    * ("a", "the") among tokens; ≥ 8% classifies as English. (A real
    * n-gram language model is the production path; the heuristic keeps
    * the operator deterministic and oracle-checkable. The corpus `lang`
    * column is carried through for evaluation joins.)
    */
  val t01_lang_id: Q = (spark, dir) => {
    val toks = split(col("text"), " ")
    val nStop = size(filter(toks, t => t.isin(StopWords: _*)))
    val ratio = nStop.cast("double") / size(toks).cast("double")
    documents(spark, dir).select(
      col("doc_id"), col("lang"),
      size(toks).cast("long").as("n_tokens"),
      ratio.as("stop_ratio"),
      when(ratio >= StopRatioEn, "en").otherwise("unk").as("lang_pred"))
  }

  /** t02 — token statistics: counts, type-token ratio, mean token
    * length — the raw inputs of corpus quality dashboards.
    */
  val t02_token_stats: Q = (spark, dir) => {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val nDis = size(array_distinct(toks))
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
    documents(spark, dir).select(
      col("doc_id"),
      col("n_chars"),
      nTok.cast("long").as("n_tokens"),
      nDis.cast("long").as("n_distinct"),
      (nDis.cast("double") / nTok.cast("double")).as("ttr"),
      (sumLen.cast("double") / nTok.cast("double")).as("avg_token_len"))
  }

  /** t03 — quality scoring: length window + lexical diversity +
    * repetition cap, combined into a 0-3 score and class. The
    * max-token-frequency probe is O(|vocab|·|doc|) per row — pure
    * map-side work, no shuffle.
    */
  val t03_quality_score: Q = (spark, dir) => {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val ttr = size(array_distinct(toks)).cast("double") / nTok.cast("double")
    val maxFreq = array_max(transform(array_distinct(toks), d =>
      size(filter(toks, t => t === d))))
    val maxRatio = maxFreq.cast("double") / nTok.cast("double")
    val lenOk = col("n_chars").between(100, 2000).cast("long")
    val divOk = (ttr >= 0.35).cast("long")
    val repOk = (maxRatio <= 0.15).cast("long")
    val score = lenOk + divOk + repOk
    documents(spark, dir).select(
      col("doc_id"), col("n_chars"),
      ttr.as("ttr"),
      maxRatio.as("max_tok_ratio"),
      score.as("quality_score"),
      when(score === 3, "high").when(score === 2, "medium").otherwise("low").as("quality_class"))
  }

  private val FpWindow = 8

  /** t04 — document fingerprint: rolling 8-token window hashes,
    * fingerprint = min window hash (the winnowing selection rule with a
    * single global window). Robust to local edits away from the
    * minimizing window; one 8-byte value per document.
    */
  val t04_fingerprint: Q = (spark, dir) => {
    // `toks` is materialized in its own projection: higher-order array
    // functions are interpreted (no CSE), so an inline split() would be
    // re-evaluated by each of the 8 element_at calls per window.
    val toks = col("toks")
    val nWin = size(toks) - (FpWindow - 1)
    val winHashes = transform(sequence(lit(0), nWin - 1), i =>
      Portable.hash60(concat_ws(" ",
        (0 until FpWindow).map(o => element_at(toks, i + o + 1)): _*)))
    documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(toks) >= FpWindow)
      .select(
        col("doc_id"),
        nWin.cast("long").as("n_windows"),
        array_min(winHashes).as("fingerprint"))
  }

  /** Subword-ish tokenizer classes: letter runs, digit runs, single
    * punctuation — the BPE-style pre-tokenization split. The regex uses
    * only literal character classes so Java (Spark) and RE2 (DuckDB)
    * agree exactly.
    */
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** t05 — token counting, whitespace vs BPE-ish regex: the two
    * pre-tokenization counts an LLM-ingest pipeline tracks, plus
    * chars-per-token fertility. Pure projection, shuffle-free.
    */
  val t05_token_count: Q = (spark, dir) => {
    val nWs = size(split(col("text"), " "))
    val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
    documents(spark, dir).select(
      col("doc_id"),
      nWs.cast("long").as("n_ws_tokens"),
      nBpe.cast("long").as("n_bpe_tokens"),
      (col("n_chars").cast("double") / nBpe.cast("double")).as("chars_per_token"))
  }

  val queries: Map[String, Q] = Map(
    "t01_lang_id" -> t01_lang_id,
    "t02_token_stats" -> t02_token_stats,
    "t03_quality_score" -> t03_quality_score,
    "t04_fingerprint" -> t04_fingerprint,
    "t05_token_count" -> t05_token_count,
  )

  val oracles: Map[String, String] = Map(
    "t01_lang_id" ->
      s"""SELECT doc_id, lang,
                 len(string_split(text, ' ')) AS n_tokens,
                 CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a','the'))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
                 CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a','the'))) AS DOUBLE)
                             / CAST(len(string_split(text, ' ')) AS DOUBLE) >= $StopRatioEn
                      THEN 'en' ELSE 'unk' END AS lang_pred
          FROM documents""",
    "t02_token_stats" ->
      """SELECT doc_id, n_chars,
                len(string_split(text, ' ')) AS n_tokens,
                len(list_distinct(string_split(text, ' '))) AS n_distinct,
                CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
                CAST(list_sum(list_transform(string_split(text, ' '), t -> len(t))) AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
         FROM documents""",
    "t03_quality_score" ->
      """WITH t AS (
           SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
         ), m AS (
           SELECT doc_id, n_chars,
                  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS ttr,
                  CAST(list_max(list_transform(list_distinct(toks),
                         d -> len(list_filter(toks, t -> t = d)))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE) AS max_tok_ratio
           FROM t
         ), s AS (
           SELECT *,
                  (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END)::BIGINT
                  + (CASE WHEN ttr >= 0.35 THEN 1 ELSE 0 END)::BIGINT
                  + (CASE WHEN max_tok_ratio <= 0.15 THEN 1 ELSE 0 END)::BIGINT AS quality_score
           FROM m
         )
         SELECT doc_id, n_chars, ttr, max_tok_ratio, quality_score,
                CASE WHEN quality_score = 3 THEN 'high'
                     WHEN quality_score = 2 THEN 'medium'
                     ELSE 'low' END AS quality_class
         FROM s""",
    "t05_token_count" ->
      s"""SELECT doc_id,
                 len(string_split(text, ' ')) AS n_ws_tokens,
                 len(regexp_extract_all(text, '$BpePattern')) AS n_bpe_tokens,
                 CAST(n_chars AS DOUBLE)
                   / CAST(len(regexp_extract_all(text, '$BpePattern')) AS DOUBLE) AS chars_per_token
          FROM documents""",
    "t04_fingerprint" -> {
      val winExpr = (0 until FpWindow).map(o => s"toks[i+${o + 1}]").mkString("concat_ws(' ', ", ", ", ")")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          SELECT doc_id,
                 len(toks) - ${FpWindow - 1} AS n_windows,
                 list_min(list_transform(range(0, len(toks) - ${FpWindow - 1}),
                   i -> ${Portable.duckHash60(winExpr)})) AS fingerprint
          FROM t WHERE len(toks) >= $FpWindow"""
    },
  )
}
