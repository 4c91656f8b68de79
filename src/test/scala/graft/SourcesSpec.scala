package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import graft.sinks.Sinks

/** Source/sink config contracts (S1–S3, S7, S9, K1, K4): the option
  * maps the Kafka/JDBC connectors receive at deploy time.
  */
class SourcesSpec extends AnyFunSuite {

  test("S1: latest-offsets subscription") {
    val o = Sources.kafkaLatest("b1:9092,b2:9092", "ods_events").options
    assert(o("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    assert(o("subscribe") === "ods_events")
    assert(o("startingOffsets") === "latest")
  }

  test("S2: consumer group is advisory; offsets still checkpoint-managed") {
    val o = Sources.kafkaGroup("b:9092", "t", "graft_app").options
    assert(o("kafka.group.id") === "graft_app")
    assert(o("startingOffsets") === "latest")
  }

  test("S3: explicit per-partition offset resume") {
    val json = """{"t":{"0":123,"1":456}}"""
    val o = Sources.kafkaFromOffsets("b:9092", "t", json).options
    assert(o("startingOffsets") === json)
  }

  test("S7: JDBC scan is partitioned, not a single connection") {
    val o = Sources.jdbcPartitioned("jdbc:mysql://h/db", "orders", "id", 0L, 1000000L, 16).options
    assert(o("partitionColumn") === "id")
    assert(o("numPartitions") === "16")
    assert(o("lowerBound") === "0" && o("upperBound") === "1000000")
  }

  test("S8: ES search pushes the query DSL; get-by-id composes onto it") {
    val s = Sources.esSearch("es1:9200,es2:9200", "gmall_order",
      Some("""{"query":{"match":{"name":"w"}}}""")).options
    assert(s("es.nodes") === "es1:9200,es2:9200")
    assert(s("es.resource") === "gmall_order")
    assert(s("es.query") === """{"query":{"match":{"name":"w"}}}""")
    assert(!Sources.esSearch("es1:9200", "idx").options.contains("es.query"),
      "no query → full index scan, option absent")
    val g = Sources.esGet("es1:9200", "idx", "42").options
    assert(g("es.query") === """{"query":{"ids":{"values":["42"]}}}""")
  }

  test("S9: properties loading") {
    val props = "kafka.broker.list=b:9092\nredis.host=r1\n"
    val m = Sources.loadProperties(
      new java.io.ByteArrayInputStream(props.getBytes("UTF-8")))
    assert(m === Map("kafka.broker.list" -> "b:9092", "redis.host" -> "r1"))
  }

  test("S8: esGet JSON-escapes hostile ids (no query-DSL injection)") {
    val g = Sources.esGet("es1:9200", "idx", """a"b\c""").options
    assert(g("es.query") === """{"query":{"ids":{"values":["a\"b\\c"]}}}""")
    val ctl = Sources.esGet("es1:9200", "idx", "x\ny").options
    assert(ctl("es.query") ===
      "{\"query\":{\"ids\":{\"values\":[\"x\\u000ay\"]}}}")
  }

  test("K1/K4: sink option maps") {
    assert(Sinks.kafkaSink("b:9092", "dwd_wide") ===
      Map("kafka.bootstrap.servers" -> "b:9092", "topic" -> "dwd_wide"))
    val j = Sinks.jdbcAppend("jdbc:ch://h/db", "t_order_wide", 500, 4)
    assert(j("batchsize") === "500" && j("numPartitions") === "4")
  }
}
