package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sinks.{IdempotentBatchAppend, KeyedUpsertTable, Sinks}

/** Exactly-once sink contract: idempotent replay, crash-replay
  * rebuild, and checkpointed restart with no duplicates and no loss
  * (SURVEY §2 K2/K3/K5/K6 + S4/S5 offset recovery).
  */
class SinkSpec extends SparkSpecBase {

  import spark.implicits._

  private def kv(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "v", "seq")

  test("KeyedUpsertTable: upsert, batch-wins merge, idempotent replay") {
    val path = tmpDir("upsert_")
    val table = new KeyedUpsertTable(spark, path, Seq("k"), "seq")
    table.upsert(kv((1, "a", 1), (2, "b", 1)), 0)
    table.upsert(kv((2, "b2", 2), (3, "c", 2)), 1)
    def state(): Map[Long, String] =
      table.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state() === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // replay of a committed batch: no-op
    table.upsert(kv((2, "b2", 2), (3, "c", 2)), 1)
    assert(state() === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(table.committedBatches === Seq(0L, 1L))
    // crash replay: commit marker lost after data write -> same rebuild
    Files.deleteIfExists(Paths.get(path, "_commits", "1"))
    table.upsert(kv((2, "b2", 2), (3, "c", 2)), 1)
    assert(state() === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    table.vacuum(keep = 1)
    assert(table.committedBatches === Seq(1L))
    assert(state() === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("BucketedStreamTable: stream-maintained layout keeps content, pruning and the exchange-free plan") {
    val path = tmpDir("bkt_stream_")
    val tbl = "graft_bkt_stream_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val t = new graft.sinks.BucketedStreamTable(spark, tbl, path, 8, "o_custkey")
    def orders(rows: (Long, Double)*): DataFrame =
      rows.toDF("o_custkey", "o_totalprice")
    // two micro-batches, then an at-least-once replay of batch 1
    t.append(orders((1L, 10.0), (2L, 20.0), (9L, 5.0)), 0L)
    t.append(orders((1L, 1.5), (17L, 7.0)), 1L)
    t.append(orders((1L, 1.5), (17L, 7.0)), 1L) // replay: marker skips it
    val got = t.read().collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got === Seq((1L, 1.5), (1L, 10.0), (2L, 20.0), (9L, 5.0), (17L, 7.0)),
      "content must equal the delivered batches exactly once")
    // the incremental layout must still serve j15's plan shape: the
    // key rollup rides the bucketed scan with ZERO exchanges ...
    val agg = t.read().groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("spend"))
    val nodes = agg.queryExecution.executedPlan.toString
    assert(!nodes.contains("Exchange hashpartitioning"),
      s"the stream-built bucketed table must aggregate exchange-free:\n$nodes")
    assert(nodes.contains("Bucketed: true"),
      s"the scan must read bucketed layout:\n$nodes")
    // ... and the s11 point probe prunes to one bucket of 8
    val probe = t.read().where(col("o_custkey") === 1L)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(probe.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning must survive incremental maintenance:\n$probe")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("checkpointed restart: new data only, no dupes, no loss") {
    val srcDir = tmpDir("src_")
    val cp = tmpDir("cp_")
    val path = tmpDir("table_")
    val table = new KeyedUpsertTable(spark, path, Seq("k"), "seq")

    def dropFile(name: String, df: DataFrame): Unit = {
      val tmp = tmpDir("stage_")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(srcDir, name), StandardCopyOption.REPLACE_EXISTING)
    }
    def runOnce(): Unit = {
      val schema = kv().schema
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .foreachBatch((b: DataFrame, id: Long) => table.upsert(b, id))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    dropFile("f1.parquet", kv((1, "a", 1), (2, "b", 1)))
    runOnce()
    assert(table.committedBatches === Seq(0L))

    // "kill" = the first query is gone; restart from the same checkpoint
    dropFile("f2.parquet", kv((2, "b2", 2), (3, "c", 2)))
    runOnce()
    assert(table.committedBatches === Seq(0L, 1L), "restart must not replay batch 0")
    val state = table.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state === Map(1L -> "a", 2L -> "b2", 3L -> "c"))

    // restart with nothing new: no extra batch, same state
    runOnce()
    assert(table.committedBatches === Seq(0L, 1L))
  }

  test("binaryObjects: export round-trips byte-exactly through the binaryFile source, idempotently") {
    import org.apache.spark.sql.functions._
    val path = tmpDir("objects_")
    val src = Tables.documents(spark, sf).where(col("doc_id") % 10 === 7)
      .select(concat(lit("doc_"), col("doc_id").cast("string")).as("name"),
        operators.Multimodal.payloadCol(col("text")).as("content"))
    Sinks.binaryObjects(src, path)
    Sinks.binaryObjects(src, path) // replay: same names, same bytes — overwrite, no dups
    val back = spark.read.format("binaryFile").load(path + "/*.bin")
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("did"),
        col("content").as("got"))
    val expect = Tables.documents(spark, sf).where(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("did"),
        operators.Multimodal.payloadCol(col("text")).as("want"))
    val joined = back.join(expect, "did")
    assert(back.count() === expect.count(), "one object per exported doc, no dups")
    assert(joined.where(col("got") =!= col("want")).count() === 0,
      "every payload byte-identical after export + binaryFile ingest")
  }

  test("binaryFile file-stream: checkpointed restart ingests only NEW objects — no re-read, no loss") {
    // st110's source contract: the file-source log owns seen-object
    // offsets, so a killed-and-resumed ingest must pick up exactly
    // the objects that landed while it was down.
    val objDir = tmpDir("objs_")
    val outDir = tmpDir("objout_")
    val cp = tmpDir("cp_objs_")
    def land(id: Long): Unit =
      Files.write(Paths.get(objDir, s"doc_$id.bin"),
        Array[Byte](id.toByte, 1, 2, 3))
    def runOnce(): Unit = {
      val q = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(objDir + "/*.bin")
        .select(regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"), col("length"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land(1); land(2)
    runOnce() // pass 1, then the writer "dies"
    assert(spark.read.parquet(outDir).count() === 2)
    land(3)
    runOnce() // resumed from the same checkpoint
    val ids = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L),
      s"exactly-once object ingest: old not re-read, new not lost — got $ids")
  }

  test("IdempotentBatchAppend: replaying a batch does not duplicate rows") {
    val path = tmpDir("append_")
    val sink = new IdempotentBatchAppend(spark, path)
    sink.append(kv((1, "a", 1)), 0)
    sink.append(kv((2, "b", 1), (3, "c", 1)), 1)
    assert(sink.read().count() === 3)
    sink.append(kv((2, "b", 1), (3, "c", 1)), 1) // at-least-once replay
    assert(sink.read().count() === 3)
    assert(sink.read().where(col("k") === 2).count() === 1)
  }
}
