package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable

/** Multimodal-column plumbing for LLM training-data pipelines: treat
  * media payloads as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as columnar transforms.
  *
  * The container ships no image/audio codecs, so the *decode step is a
  * deterministic stub* (hash-derived metadata and features — clearly
  * marked below); everything around it is real and tested: the binary
  * column materialization, byte-level metadata extraction (length,
  * digest, magic bytes), the feature-vector schema, and the fully
  * distributed, shuffle-free execution shape. A production deployment
  * swaps `fakeDecode*` for a vectorized decoder (a codegen'd Catalyst
  * Expression over BinaryType, or an Arrow-batched UDF) — the
  * surrounding plan is unchanged.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** The corpus with a real BinaryType payload column (UTF-8 bytes of
    * the text stand in for the media payload).
    */
  private def withPayload(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"))

  /** mm01 — binary metadata extraction: byte length, content digest,
    * leading "magic" bytes (format sniffing), and STUBBED decoded
    * dimensions (hash-derived width/height/channels — a real decoder
    * reads the codec header here). Pure projection over the binary
    * column; no shuffle.
    */
  val mm01_binary_meta: Q = (spark, dir) => {
    val digest = sha2(col("text"), 256)
    val h = Portable.hash60(digest)
    documents(spark, dir).select(
      col("doc_id"),
      expr("octet_length(encode(text, 'utf-8'))").cast("long").as("byte_len"),
      digest.as("digest"),
      lower(hex(substring(encode(col("text"), "utf-8"), 1, 8))).as("magic"),
      // ---- STUB: deterministic fake decode (no codecs in container) ----
      (h % 640).as("width"),
      (h % 480).as("height"),
      (h % 3 + 1).as("channels"))
  }

  private val NumFeatures = 8

  /** mm02 — feature extraction over the payload: a fixed-width
    * Array-of-double feature vector per document plus a frame-sampling
    * count. The features are a STUB (hash-derived in [0,1) — a real
    * pipeline computes embeddings/MFCCs here); the schema, determinism
    * and distributed shape are the real deliverable. Emitted as scalar
    * columns f0..f7 (stable schema for the differential check; the
    * array form is `array(f0..f7)` away).
    */
  val mm02_feature_stub: Q = (spark, dir) => {
    val digest = sha2(col("text"), 256)
    val feats = (0 until NumFeatures).map { i =>
      (Portable.hash60(concat(digest, lit(s"_$i"))) % 1000000).cast("double")
        .divide(lit(1000000.0)).as(s"f$i")
    }
    val toks = split(col("text"), " ")
    documents(spark, dir).select(
      (col("doc_id") +:
        floor(size(toks) / 4).cast("long").as("n_frames") +:
        feats): _*)
  }

  private val FrameStep = 4

  /** mm03 — frame sampling: one row per sampled frame (every 4th),
    * the explode shape a video pipeline uses to fan a clip out into
    * per-frame work items that then partition freely across executors.
    * Frame count and digests are STUBS (token count stands in for the
    * frame count; a real decoder emits actual frames); the
    * explode/partition plumbing is the deliverable.
    */
  val mm03_frame_sample: Q = (spark, dir) => {
    documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"),
        size(split(col("text"), " ")).as("n_frames"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(FrameStep))).as("frame_id"),
        col("digest"))
      .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
        // ---- STUB: per-frame content digest (no codecs in container) ----
        Portable.hash60(concat(col("digest"), lit("_f"), col("frame_id").cast("string")))
          .as("frame_digest"))
  }

  val queries: Map[String, Q] = Map(
    "mm01_binary_meta" -> mm01_binary_meta,
    "mm02_feature_stub" -> mm02_feature_stub,
    "mm03_frame_sample" -> mm03_frame_sample,
  )

  val oracles: Map[String, String] = Map(
    "mm01_binary_meta" -> {
      val h = Portable.duckHash60("sha256(text)")
      s"""SELECT doc_id,
                 octet_length(encode(text)) AS byte_len,
                 sha256(text) AS digest,
                 lower(hex(encode(substr(text, 1, 8)))) AS magic,
                 ($h) % 640 AS width,
                 ($h) % 480 AS height,
                 ($h) % 3 + 1 AS channels
          FROM documents"""
    },
    "mm03_frame_sample" -> {
      val h = Portable.duckHash60("concat(sha256(text), '_f', CAST(f AS VARCHAR))")
      s"""SELECT doc_id, f AS frame_id, ($h) AS frame_digest
          FROM (SELECT doc_id, text,
                       unnest(range(0, len(string_split(text, ' ')), $FrameStep)) AS f
                FROM documents)"""
    },
    "mm02_feature_stub" -> {
      val feats = (0 until NumFeatures).map { i =>
        val h = Portable.duckHash60(s"concat(sha256(text), '_$i')")
        s"CAST(($h) % 1000000 AS DOUBLE) / 1000000.0 AS f$i"
      }.mkString(", ")
      s"""SELECT doc_id,
                 CAST(floor(len(string_split(text, ' ')) / 4) AS BIGINT) AS n_frames,
                 $feats
          FROM documents"""
    },
  )
}
