package graft

import org.apache.spark.sql.functions._
import graft.functions.ByteStatsUtil
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `byte_stats` expression: the feature
  * vector must equal a first-principles Scala model of the same byte
  * math on real document bytes, plus hand-computed fixtures for the
  * stride boundaries and the normalization constants.
  */
class ByteStatsSpec extends SparkSpecBase {

  /** Independent model — straight from the documented definition, not
    * shared code with ByteStatsUtil.
    */
  private def model(buf: Array[Byte]): Array[Double] = {
    val vs = buf.map(_ & 0xff)
    val n = vs.length
    val strides = Array(
      vs.slice(0, n / 4), vs.slice(n / 4, 2 * n / 4),
      vs.slice(2 * n / 4, 3 * n / 4), vs.slice(3 * n / 4, n))
    strides.map(s => s.map(_.toLong).sum.toDouble / (s.length * 255.0)) ++
      Array(vs.min / 255.0, vs.max / 255.0,
        vs.map(_.toLong).sum.toDouble / (n * 255.0),
        vs.distinct.length / 256.0)
  }

  test("byte_stats matches the first-principles model on real documents") {
    GraftExtensions.register(spark)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"), call_function("byte_stats", encode(col("text"), "utf-8")).as("fs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = model(r.getString(0).getBytes("UTF-8"))
      val got = r.getSeq[Double](1)
      assert(got === expect.toSeq, s"mismatch on ${r.getString(0).take(40)}")
    }
  }

  test("byte_stats returns null (not NaN) below the 4-byte stride minimum") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val got = Seq(Tuple1(Array[Byte](1, 2, 3)), Tuple1(Array[Byte]()),
        Tuple1(Array[Byte](1, 2, 3, 4)))
      .toDF("b").select(call_function("byte_stats", col("b")).as("fs"))
      .collect().map(r => Option(r.getSeq[Double](0)))
    assert(got(0).isEmpty && got(1).isEmpty, "short inputs must yield null")
    assert(got(2).nonEmpty, "4 bytes is the shortest defined input")
  }

  test("byte_stats hand-computed: 8 bytes, exact stride means") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // bytes 0,255,10,20,30,40,250,0 -> strides [0,255][10,20][30,40][250,0]
    val got = Seq(Tuple1(Array[Byte](0, -1, 10, 20, 30, 40, -6, 0)))
      .toDF("b").select(call_function("byte_stats", col("b")))
      .collect().head.getSeq[Double](0)
    val expect = Seq(
      255.0 / (2 * 255.0), 30.0 / (2 * 255.0), 70.0 / (2 * 255.0), 250.0 / (2 * 255.0),
      0.0, 1.0, 605.0 / (8 * 255.0), 7.0 / 256.0)
    assert(got === expect)
  }

  test("byte_stats stride boundaries use integer division (n = 7)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // n=7: b1=1, b2=3, b3=5 -> strides of length 1,2,2,2
    val got = Seq(Tuple1(Array[Byte](7, 1, 2, 3, 4, 5, 6)))
      .toDF("b").select(call_function("byte_stats", col("b")))
      .collect().head.getSeq[Double](0)
    assert(got.take(4) === Seq(
      7.0 / 255.0, 3.0 / (2 * 255.0), 7.0 / (2 * 255.0), 11.0 / (2 * 255.0)))
  }

  test("byte_stats null input propagates") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val r = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(call_function("byte_stats", col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("util and a fresh model agree feature count") {
    assert(ByteStatsUtil.NumFeatures === 8)
  }
}
