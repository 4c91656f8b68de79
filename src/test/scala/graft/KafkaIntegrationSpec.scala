package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources
import graft.sinks.Sinks

/** DEPLOY-TIME Kafka integration spec (r17 verdict task 5): executes
  * the S1–S3/K1 contracts against a REAL broker the moment one is
  * reachable. This container ships no broker and no
  * `spark-sql-kafka-0-10` connector (the offline coursier cache holds
  * neither — re-checked each round, last 2026-08-16; see the attempt
  * log in [[graft.sources.Sources]]), so by default every test here
  * CANCELS (`assume`), keeping `sbt test` green while making the
  * executed round trip a one-env-var activation at deploy time:
  *
  * {{{
  *   SPARK_GRAFT_KAFKA_BROKER=broker:9092 sbt "testOnly graft.KafkaIntegrationSpec"
  * }}}
  *
  * (plus `--jars spark-sql-kafka-0-10_2.13.jar,kafka-clients.jar` on
  * the test classpath). The round trip is the reference's own shape:
  * produce JSON envelopes to a topic (K1, ref utils/KafkaStreamSink
  * .scala:20-37), read them back from earliest/latest/explicit
  * offsets (S1–S3, ref utils/KafkaStreamUtils.scala:33-59 /
  * MykafkaUtil), parse the value bytes through [[Sources.parseEnvelope]].
  */
class KafkaIntegrationSpec extends SparkSpecBase {

  private val broker = sys.env.get("SPARK_GRAFT_KAFKA_BROKER")

  private def connectorPresent: Boolean =
    scala.util.Try(
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
    ).isSuccess

  /** One gate for every test: a broker URL AND the connector jar. */
  private def gate(): String = {
    assume(broker.isDefined,
      "SPARK_GRAFT_KAFKA_BROKER not set — deploy-time spec, canceled in this container")
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector not on the classpath — add it to run this spec")
    broker.get
  }

  // one topic per suite run so reruns never read stale records
  private lazy val topic = s"graft_it_${System.currentTimeMillis()}"

  test("K1 -> S1/S3: produced envelopes round-trip through the broker") {
    val b = gate()
    import spark.implicits._
    val events = (1 to 20)
      .map(i => (s"u$i", s"""{"user_id":"u$i","amount":${i * 100}}"""))
      .toDF("key", "value")
    // K1: the kafkaSink option contract, executed as a batch produce
    events
      .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .options(Sinks.kafkaSink(b, topic))
      .save()

    // S3 shape (batch): read back from earliest explicit offsets
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", b)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.LongType)))
    val parsed = Sources.parseEnvelope(back, schema)
      .select(col("parsed.user_id"), col("parsed.amount"))
    assert(parsed.count() === 20L)
    assert(parsed.where(col("amount") === 2000L).count() === 1L)
  }

  test("S1: the streaming kafkaLatest contract loads and drains new records") {
    val b = gate()
    import spark.implicits._
    // start the stream at latest, then produce AFTER it is running:
    // exactly the reference's at-latest consumer contract
    val ckpt = tmpDir("graft_kafka_ckpt_")
    val stream = Sources.kafkaLatest(b, topic).load(spark)
      .selectExpr("CAST(value AS STRING) AS value")
    val q = stream.writeStream
      .format("memory").queryName("kafka_s1_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      (21 to 30)
        .map(i => (s"u$i", s"""{"user_id":"u$i","amount":${i * 100}}"""))
        .toDF("key", "value")
        .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
        .write.format("kafka").options(Sinks.kafkaSink(b, topic)).save()
      q.processAllAvailable()
      val n = spark.table("kafka_s1_sink").count()
      assert(n === 10L, s"latest-offset stream saw $n of the 10 post-start records")
    } finally q.stop()
  }
}
