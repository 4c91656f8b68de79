package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftExtensions

/** gram_keys parity + properties: the codegen'd rotate-xor fold must
  * be bit-identical to the builtin shiftleft/shiftright/xor
  * formulation, tag the n-family into bits 60+, be position-sensitive
  * (the rotation), and produce exactly len-n+1 keys.
  */
class GramKeysSpec extends SparkSpecBase {

  import spark.implicits._

  private def gk(c: org.apache.spark.sql.Column, n: Int) =
    call_function("gram_keys", c, lit(n))

  test("matches the builtin rotate-xor fold, tag included") {
    GraftExtensions.register(spark)
    val df = Seq(
      "the quick brown fox jumps over a lazy dog",
      "a b a b a b a b",
      "single",
      "two words"
    ).toDF("text").select(
      Portable.hash60Array(filter(split(col("text"), " "), t => length(t) > 0)).as("th"))
    def rot7(x: org.apache.spark.sql.Column) =
      shiftleft(pmod(x, lit(1L << 53)), 7).bitwiseOR(shiftright(x, 53))
    for (n <- Seq(2, 3, 5)) {
      val ref = when(size(col("th")) >= n,
        transform(sequence(lit(1), size(col("th")) - (n - 1)), i =>
          (1 until n).foldLeft(element_at(col("th"), i)) { (acc, o) =>
            rot7(acc).bitwiseXOR(element_at(col("th"), i + o))
          }.bitwiseOR(lit(n.toLong << 60))))
        .otherwise(array().cast("array<long>"))
      df.select(gk(col("th"), n).as("fast"), ref.as("ref")).collect().foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n mismatch")
      }
    }
  }

  test("tag recovery, length, and position sensitivity") {
    GraftExtensions.register(spark)
    val df = Seq("w1 w2 w3 w4 w5 w6 w7", "a b", "b a").toDF("text").select(
      col("text"),
      Portable.hash60Array(filter(split(col("text"), " "), t => length(t) > 0)).as("th"))
    val rows = df.select(col("text"), gk(col("th"), 2).as("g2"), gk(col("th"), 5).as("g5"))
      .collect().map(r => r.getString(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val (g2, g5) = rows("w1 w2 w3 w4 w5 w6 w7")
    assert(g2.size === 6 && g5.size === 3)
    assert(g2.forall(k => (k >> 60) === 2L) && g5.forall(k => (k >> 60) === 5L))
    assert(g2.distinct.size === 6, "distinct grams must key distinctly")
    // position sensitivity: "a b" and "b a" must not collide
    assert(rows("a b")._1.head !== rows("b a")._1.head)
    // a doc shorter than n yields no keys
    assert(rows("a b")._2.isEmpty)
  }
}
