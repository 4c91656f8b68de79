package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Parity + property lock for the codegen'd `dhash64` expression and
  * the mm10 query built on it: the 4-band signature must equal a
  * first-principles Scala model of the documented 65-stride mapping +
  * exact adjacent-stride cross-multiplied compares, the
  * brightness-shift INVARIANCE identity must hold bit for bit (the
  * property mm10's near-dup recall rests on), and mm10 must recover
  * every planted shifted copy at hamming 0.
  */
class DHash64Spec extends SparkSpecBase {

  import spark.implicits._

  /** Independent model — straight from the documented definition:
    * stride of byte i = i·65/n; bit s set iff
    * sum_s·len_{s+1} > sum_{s+1}·len_s.
    */
  private def model(buf: Array[Byte]): Seq[Long] = {
    val n = buf.length
    val vs = buf.map(_ & 0xff)
    val bands = new Array[Long](4)
    def members(s: Int) = vs.indices.filter(i => i.toLong * 65 / n == s)
    for (s <- 0 until 64) {
      val a = members(s)
      val b = members(s + 1)
      val sa = a.map(vs(_).toLong).sum
      val sb = b.map(vs(_).toLong).sum
      if (sa * b.length > sb * a.length)
        bands(s / 16) |= 1L << (s % 16)
    }
    bands.toSeq
  }

  private def run(buf: Array[Byte]): Option[Seq[Long]] = {
    GraftExtensions.register(spark)
    val r = Seq(Tuple1(buf)).toDF("b")
      .select(call_function("dhash64", col("b")).as("bands"))
      .collect().head
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  test("dhash64 matches the first-principles model on real document bytes") {
    GraftExtensions.register(spark)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"),
        call_function("dhash64", encode(col("text"), "utf-8")).as("bands"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val buf = r.getString(0).getBytes("UTF-8")
      if (buf.length < 65)
        assert(r.isNullAt(1), "sub-stride docs must yield null")
      else
        assert(r.getSeq[Long](1) === model(buf),
          s"mismatch on ${r.getString(0).take(40)}")
    }
  }

  test("uniform byte shift leaves every dhash AND ahash bit unchanged " +
      "(the shared cross-mult cancellation identity)") {
    GraftExtensions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(encode(col("text"), "utf-8").as("b"))
      .where(octet_length(col("b")) >= 65)
    for (c <- Seq(1, 7, 100); f <- Seq("dhash64", "blockhash64")) {
      val diff = docs.select(
          call_function(f, col("b")).as("h0"),
          call_function(f,
            call_function("byte_shift", col("b"), lit(c))).as("h1"))
        .where(not(col("h0") === col("h1")))
        .count()
      // ASCII corpus + c ≤ 129 keeps (byte + c) < 256: no mod wrap, so
      // the cross-mult cancellation applies to every compare
      assert(diff === 0L, s"shift +$c flipped $f bits on $diff docs")
    }
  }

  /** The mm10 fixture's local edit: middle tenth of the bytes +50. */
  private def patch(b: org.apache.spark.sql.Column) = {
    val n = octet_length(b)
    val off = (n / 2).cast("int")
    val len = (n / 10).cast("int")
    concat(b.substr(lit(1), off - 1),
      call_function("byte_shift", b.substr(off, len), lit(50)),
      b.substr(off + len, n - off - len + 1))
  }

  test("a LOCAL patch stays under the dhash locality bound but sprays " +
      "aHash bits signature-wide — the separation mm10 exists to exploit") {
    GraftExtensions.register(spark)
    def ham(f: String, a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column) =
      aggregate(zip_with(call_function(f, a), call_function(f, b),
        (x, y) => call_function("bit_count", x.bitwiseXOR(y)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(encode(col("text"), "utf-8").as("b"))
      .where(octet_length(col("b")) >= 130) // ≥ 2 bytes/stride
    val r = docs.select(ham("dhash64", col("b"), patch(col("b"))).as("dh"),
        ham("blockhash64", col("b"), patch(col("b"))).as("ah"))
      .agg(max(col("dh")).as("max_dh"), max(col("ah")).as("max_ah"),
        sum(when(col("dh") <= 3, 1L).otherwise(0L)).as("dh_in"),
        sum(when(col("ah") <= 3, 1L).otherwise(0L)).as("ah_in"),
        count(lit(1)).as("n"))
      .collect().head
    val n = r.getAs[Long]("n")
    assert(n > 0)
    // locality bound: a patch of L = n/10 bytes overlaps ≤ ⌊L·65/n⌋+2
    // ≈ 8 strides → ≤ 9 adjacent compares can move
    assert(r.getAs[Long]("max_dh") <= 9L,
      s"dhash hamming ${r.getAs[Long]("max_dh")} exceeds the locality bound")
    // and in practice almost all sit inside the LSH threshold, while
    // the global-mean hash blows past it on a majority
    assert(r.getAs[Long]("dh_in") * 10 >= n * 9,
      s"only ${r.getAs[Long]("dh_in")}/$n patched docs inside hamming 3 for dhash")
    assert(r.getAs[Long]("ah_in") * 2 <= n,
      s"${r.getAs[Long]("ah_in")}/$n patched docs inside hamming 3 for aHash — " +
        "expected the block-mean hash to lose most of them")
  }

  test("mm10 recovers every planted patched copy whose signature distance " +
      "admits it (pigeonhole recall at hamming <= 3)") {
    GraftExtensions.register(spark)
    val found = graft.operators.Multimodal.mm10_media_dhash(spark, sf)
      .where(col("doc_b") >= 3000000L && col("doc_a") === col("doc_b") - 3000000L)
      .select(col("doc_a"), col("hamming"))
      .collect()
    // ground truth straight from the signatures: planted copies at
    // true hamming ≤ 3 MUST all surface (banded pigeonhole guarantee)
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") % 10 === 3)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("b"))
      .select(col("doc_id"),
        aggregate(zip_with(
          call_function("dhash64", col("b")),
          call_function("dhash64", patch(col("b"))),
          (x, y) => call_function("bit_count", x.bitwiseXOR(y)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("dh"))
      .where(col("dh").isNotNull && col("dh") <= 3)
      .collect().map(_.getLong(0)).toSet
    assert(truth.nonEmpty)
    val got = found.map(_.getLong(0)).toSet
    assert(truth.subsetOf(got),
      s"missing planted copies: ${(truth -- got).take(5)}")
  }

  test("byte_shift wraps mod 256 and short dhash inputs yield null") {
    GraftExtensions.register(spark)
    val r = Seq(Tuple1(Array[Byte](250.toByte, 3, byteOf(200))))
      .toDF("b")
      .select(call_function("byte_shift", col("b"), lit(10)).as("s"))
      .collect().head.getAs[Array[Byte]](0)
    assert(r.map(_ & 0xff).toSeq === Seq(4, 13, 210))
    assert(run(Array.fill[Byte](64)(1)).isEmpty, "64 bytes is one short of 65 strides")
    assert(run(Array.fill[Byte](65)(1)).nonEmpty)
  }

  private def byteOf(i: Int): Byte = i.toByte
}
