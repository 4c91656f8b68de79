package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `simhash48` expression: bit-identical
  * to the builtin interpreted formulation (the `aggregate`/`zip_with`
  * per-bit majority fold d03 used before the expression existed), plus
  * a hand-computed case.
  */
class Simhash48Spec extends SparkSpecBase {

  private val SimBits = 48

  /** The pre-expression builtin formulation (interpreted HOFs). */
  private def foldFp(th: org.apache.spark.sql.Column) = {
    val counts = aggregate(
      th,
      array_repeat(lit(0), SimBits),
      (acc, h) => zip_with(
        acc,
        array((0 until SimBits).map(k =>
          shiftright(h, k).bitwiseAND(lit(1L)).cast("int")): _*),
        (a, b) => a + b))
    (0 until SimBits).map { k =>
      (element_at(counts, k + 1) * 2 > size(th)).cast("long") * lit(1L << k)
    }.reduce(_ + _)
  }

  test("simhash48 matches the interpreted majority fold on real documents") {
    GraftExtensions.register(spark)
    val th = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Portable.hash60Array(split(col("text"), " ")).as("th"))
    val diff = th.select(
        call_function("simhash48", col("th")).as("expr_fp"),
        foldFp(col("th")).as("fold_fp"))
      .where(col("expr_fp") =!= col("fold_fp"))
      .count()
    assert(diff === 0L)
  }

  test("simhash48 on a hand-computed array") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // bits: b0 {1,1,1}=3 of 3 -> set; b1 {0,0,1}=1 -> clear; b2 {1,0,1}=2 -> set (2*2>3)
    val got = Seq(Tuple1(Seq(5L, 1L, 7L))).toDF("th")
      .select(call_function("simhash48", col("th")))
      .collect().head.getLong(0)
    assert(got === 5L)
  }
}
