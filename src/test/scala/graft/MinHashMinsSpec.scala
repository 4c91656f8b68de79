package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `minhash_mins` expression against the
  * builtin k-pass formulation it replaced in d02.
  */
class MinHashMinsSpec extends SparkSpecBase {

  private val K = 12
  private lazy val seedsCsv = Portable.xorSeeds.take(K).mkString(",")

  test("minhash_mins matches k interpreted array_min(transform(xor)) passes") {
    GraftExtensions.register(spark)
    val th = spark.read.parquet(s"$sf/documents.parquet")
      .select(Portable.hash60Array(split(col("text"), " ")).as("hs"))
    val folds = (0 until K).map(i =>
      array_min(transform(col("hs"), h => Portable.xorMix(i, h))).as(s"f$i"))
    val diff = th.select(
        call_function("minhash_mins", col("hs"), lit(seedsCsv)).as("m") +: folds: _*)
      .where((0 until K).map(i =>
        element_at(col("m"), i + 1) =!= col(s"f$i")).reduce(_ || _))
      .count()
    assert(diff === 0L)
  }

  test("minhash_mins on a hand-computed array") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val hs = Seq(7L, 1L)
    val expect = Portable.xorSeeds.take(K).map(s => hs.map(_ ^ s).min)
    val got = Seq(Tuple1(hs)).toDF("hs")
      .select(call_function("minhash_mins", col("hs"), lit(seedsCsv)))
      .collect().head.getSeq[Long](0)
    assert(got === expect)
  }
}
