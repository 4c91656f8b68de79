package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `blockhash64` expression: the 4-band
  * signature must equal a first-principles Scala model of the
  * documented stride mapping + exact integer mean compares, plus
  * fixtures for the perceptual properties the mm07 join relies on
  * (identity, one-byte robustness, short-input null).
  */
class Blockhash64Spec extends SparkSpecBase {

  import spark.implicits._

  /** Independent model — straight from the documented definition:
    * stride of byte i = i·64/n; bit s set iff sum_s·n > total·len_s.
    */
  private def model(buf: Array[Byte]): Seq[Long] = {
    val n = buf.length
    val vs = buf.map(_ & 0xff)
    val total = vs.map(_.toLong).sum
    val bands = new Array[Long](4)
    for (s <- 0 until 64) {
      val members = vs.indices.filter(i => i.toLong * 64 / n == s)
      val sum = members.map(vs(_).toLong).sum
      if (sum * n > total * members.length)
        bands(s / 16) |= 1L << (s % 16)
    }
    bands.toSeq
  }

  private def run(buf: Array[Byte]): Option[Seq[Long]] = {
    GraftExtensions.register(spark)
    val r = Seq(Tuple1(buf)).toDF("b")
      .select(call_function("blockhash64", col("b")).as("bands"))
      .collect().head
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  test("blockhash64 matches the first-principles model on real document bytes") {
    GraftExtensions.register(spark)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"),
        call_function("blockhash64", encode(col("text"), "utf-8")).as("bands"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val buf = r.getString(0).getBytes("UTF-8")
      if (buf.length < 64)
        assert(r.isNullAt(1), "sub-stride docs must yield null")
      else
        assert(r.getSeq[Long](1) === model(buf),
          s"mismatch on ${r.getString(0).take(40)}")
    }
  }

  test("identity, sub-stride robustness, and the short-input null") {
    val base = (0 until 256).map(i => ((i * 7) % 251).toByte).toArray
    val sig = run(base).get
    assert(sig === model(base))
    assert(run(base.clone()).get === sig, "equal bytes must hash equal")
    // a one-byte nudge moves one stride's mean a little: most bands hold
    val nudged = base.clone(); nudged(100) = (nudged(100) + 1).toByte
    val dist = run(nudged).get.zip(sig)
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(dist <= 3, s"one-byte perturbation must stay under the join threshold, got $dist")
    assert(run(Array.fill[Byte](63)(1)).isEmpty, "under 64 bytes yields null")
  }
}
