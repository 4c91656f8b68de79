package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Parquet table loaders over the driver testdata layout
  * (`<sfDir>/<name>.parquet`) plus shared numeric-parity helpers.
  *
  * Scale notes: loaders return plain scans so Catalyst can push filters
  * and prune columns into the parquet reader; nothing is cached or
  * collected here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` normalized to session-TZ TimestampType whatever the
    * parquet generation shipped: TIMESTAMP(NANOS) arrives as a long
    * under `spark.sql.legacy.parquet.nanosAsLong=true` and is rebuilt
    * via integral division (`div`, not `/`: ns epochs exceed 2^53,
    * double division would lose precision; truncation toward zero
    * matches DuckDB's ns→µs narrowing); TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false arrives as TIMESTAMP_NTZ and is cast —
    * sessions pin `spark.sql.session.timeZone=UTC`, so the cast is
    * value-preserving and every downstream consumer (`unix_micros`,
    * watermarks, window()) sees one type across generations.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** Fixture-integrity guard for the synthetic-id convention: planted
    * dup/mutation fixtures derive synthetic rows as `doc_id + 1e6`
    * (`vec_id + 2e6`), and their DuckDB oracles split standing vs
    * arriving on that same literal. A corpus whose real ids reach the
    * offset would alias synthetic ids onto real ones and silently
    * misclassify pairs — so the offset's headroom is ASSERTED once per
    * (table, dir) per session (one 1-row max() aggregate, served from
    * parquet row-group stats under aggregate pushdown) instead of
    * trusted. At a larger generation the fix is to re-pin the offset,
    * not to loosen this check.
    */
  private val headroomChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def assertIdHeadroom(spark: SparkSession, dir: String, name: String,
                               idCol: String, offset: Long): Unit = {
    headroomChecked.computeIfAbsent(s"$dir#$name", _ => {
      val mx = load(spark, dir, name).agg(max(col(idCol))).head().getLong(0)
      require(mx < offset,
        s"$name.$idCol max $mx >= synthetic-id offset $offset in $dir: " +
          "planted fixtures would alias real ids; re-pin the offset")
      java.lang.Boolean.TRUE
    }): Unit
  }

  def documents(spark: SparkSession, dir: String): DataFrame = {
    assertIdHeadroom(spark, dir, "documents", "doc_id", 1000000L)
    load(spark, dir, "documents")
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    assertIdHeadroom(spark, dir, "embeddings", "vec_id", 2000000L)
    load(spark, dir, "embeddings")
  }

  /** Exact money arithmetic for oracle parity.
    *
    * Summing doubles is order-dependent; Spark's partial aggregation and
    * DuckDB's parallel aggregation can disagree in the last ulp, which a
    * hash compare would flag. `round(x*100)` yields integer-valued
    * doubles, whose sum is exact (associative) for totals < 2^53, so
    * both engines produce bit-identical results. The oracle SQL mirrors
    * the same expression: `SUM(ROUND(x*100))/100`.
    */
  def cents(c: Column): Column = round(c * 100)

  /** Exact (order-independent) sum of a money column; see [[cents]]. */
  def moneySum(c: Column): Column = sum(cents(c)) / 100

  /** Paths queued for deletion by the single static shutdown hook —
    * one hook over a list, not one hook per directory (a Verify/Bench
    * run creates dozens of scratch dirs; per-call hooks would pile up
    * a thread per dir in the JVM's shutdown registry).
    */
  private val scratchPaths = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val scratchHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      scratchPaths.forEach(p => try rm(p.toFile) catch { case _: Throwable => () })
    }))
  }

  /** A scratch temp directory that is recursively deleted at JVM exit
    * — every replay/sink/checkpoint temp dir routes through this so
    * repeated Bench/Verify runs don't accumulate copies in /tmp.
    */
  def scratchDir(prefix: String): String = {
    scratchHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchPaths.add(p)
    Option(scratchRecord.get()).foreach(_ += p.toString)
    p.toString
  }

  /** Per-thread scratch-dir recording, for `StateLockSpec`: a spec
    * thread that wants to discover which checkpoints a streaming
    * query created (every checkpoint routes through [[scratchDir]],
    * always on the caller's thread — only sink/table dirs are ever
    * allocated from streaming-execution threads) begins a recording,
    * runs the query, and drains the capture. Thread-local so parallel
    * suites sharing the JVM-wide session can't cross-pollute.
    */
  private val scratchRecord =
    new ThreadLocal[scala.collection.mutable.ListBuffer[String]]

  private[graft] def beginScratchRecording(): Unit =
    scratchRecord.set(scala.collection.mutable.ListBuffer.empty[String])

  private[graft] def drainScratchRecording(): Seq[String] = {
    val r = Option(scratchRecord.get()).map(_.toList).getOrElse(Nil)
    scratchRecord.remove()
    r
  }
}
