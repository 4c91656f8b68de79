package graft

import org.apache.spark.sql.functions._
import graft.functions.Pcm16FramesUtil
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `pcm16_frames` expression: per-frame
  * stats must equal a first-principles Scala model of the same LE-int16
  * decode + framing on real document bytes, plus hand-computed fixtures
  * for the sign conventions (negative samples, zero never crosses, odd
  * trailing byte dropped, partial tail frame).
  */
class Pcm16FramesSpec extends SparkSpecBase {

  import spark.implicits._

  /** Independent model — straight from the documented definition. */
  private def model(buf: Array[Byte]): Seq[(Long, Long, Long, Long, Long)] = {
    val samples = buf.grouped(2).filter(_.length == 2)
      .map(p => (((p(0) & 0xff) | (p(1) << 8)).toShort.toInt)).toArray
    samples.grouped(Pcm16FramesUtil.FrameLen).zipWithIndex.map { case (fr, f) =>
      val cross = fr.sliding(2).count(p => p.length == 2 && p(0).toLong * p(1) < 0)
      (f.toLong, fr.length.toLong, fr.map(s => s.toLong * s).sum,
        if (fr.isEmpty) 0L else fr.map(s => math.abs(s.toLong)).max, cross.toLong)
    }.toSeq
  }

  private def run(buf: Array[Byte]): Seq[(Long, Long, Long, Long, Long)] = {
    GraftExtensions.register(spark)
    Seq(Tuple1(buf)).toDF("b")
      .select(explode(call_function("pcm16_frames", col("b"))).as("fr"))
      .select(col("fr.frame_id"), col("fr.n_samples"), col("fr.sum_sq"),
        col("fr.peak"), col("fr.n_cross"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  private def le16(ss: Int*): Array[Byte] =
    ss.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray

  test("hand-computed fixture: signs, zero-no-cross, peak, sum_sq") {
    // samples: 100, -200, 0, 300, -32768 (int16 min), 1
    val got = run(le16(100, -200, 0, 300, -32768, 1))
    // crossings: (100,-200) yes; (-200,0) no; (0,300) no; (300,-32768) yes;
    // (-32768,1) yes -> 3
    val sumSq = 100L * 100 + 200L * 200 + 0 + 300L * 300 + 32768L * 32768 + 1
    assert(got === Seq((0L, 6L, sumSq, 32768L, 3L)))
  }

  test("odd trailing byte is dropped; <2 bytes yields null") {
    val got = run(le16(7, -7) :+ 0x55.toByte) // 5 bytes -> 2 samples
    assert(got === Seq((0L, 2L, 98L, 7L, 1L)))
    GraftExtensions.register(spark)
    val nulls = Seq(Tuple1(Array[Byte](1)), Tuple1(Array.empty[Byte]))
      .toDF("b").select(call_function("pcm16_frames", col("b")).as("f"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("framing: a 130-sample signal yields frames of 64/64/2") {
    val buf = le16((1 to 130).map(i => if (i % 2 == 0) -i else i): _*)
    val got = run(buf)
    assert(got.map(t => (t._1, t._2)) === Seq((0L, 64L), (1L, 64L), (2L, 2L)))
    assert(got === model(buf))
  }

  test("pcm16_frames matches the first-principles model on real document bytes") {
    GraftExtensions.register(spark)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"),
        call_function("pcm16_frames", encode(col("text"), "utf-8")).as("frames"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val buf = r.getString(0).getBytes("UTF-8")
      val got = r.getSeq[org.apache.spark.sql.Row](1).map(fr =>
        (fr.getLong(0), fr.getLong(1), fr.getLong(2), fr.getLong(3), fr.getLong(4)))
      assert(got === model(buf), s"mismatch on ${r.getString(0).take(40)}")
    }
  }

  /** Independent per-window peak model for `pcm16_peaks`. */
  private def peakModel(buf: Array[Byte]): Seq[Long] = {
    val samples = buf.grouped(2).filter(_.length == 2)
      .map(p => (((p(0) & 0xff) | (p(1) << 8)).toShort.toInt)).toArray
    samples.grouped(Pcm16FramesUtil.PeakWin)
      .map(w => if (w.isEmpty) 0L else w.map(s => math.abs(s.toLong)).max)
      .toSeq
  }

  test("pcm16_peaks matches the per-window model on real document bytes; <2 bytes yields null") {
    GraftExtensions.register(spark)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"),
        call_function("pcm16_peaks", encode(col("text"), "utf-8")).as("peaks"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val buf = r.getString(0).getBytes("UTF-8")
      assert(r.getSeq[Long](1) === peakModel(buf),
        s"peak mismatch on ${r.getString(0).take(40)}")
    }
    val short = Seq(Tuple1(Array[Byte](7)))
      .toDF("b").select(call_function("pcm16_peaks", col("b"))).collect()
    assert(short.head.isNullAt(0), "sub-sample input must yield null")
  }

  test("pcm16_peaks negative-peak fixture: |-32768| wins its window") {
    GraftExtensions.register(spark)
    val got = Seq(Tuple1(le16(100, -32768, 5, -6)))
      .toDF("b").select(call_function("pcm16_peaks", col("b"))).collect()
    assert(got.head.getSeq[Long](0) === Seq(32768L))
  }
}
