package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `trigram_hits` expression against the
  * builtin interpreted formulation it replaced in t06.
  */
class TrigramHitsSpec extends SparkSpecBase {

  private val Profile = Seq(
    "the", "he ", " th", "ing", "ng ", "and", "nd ", " an", "ion", "on ",
    " of", "of ", "ed ", " in", "er ", "es ", " to", "to ", "at ", " a ")

  test("trigram_hits matches the interpreted transform/filter chain on real documents") {
    GraftExtensions.register(spark)
    val txt = lower(col("text"))
    val nTg = length(txt) - 2
    val tgs = transform(sequence(lit(1), nTg), i => txt.substr(i, lit(3)))
    val fold = size(filter(tgs, t => t.isin(Profile: _*)))
    val diff = spark.read.parquet(s"$sf/documents.parquet")
      .where(length(col("text")) >= 3)
      .select(
        call_function("trigram_hits", txt, lit(Profile.mkString(graft.functions.TrigramHits.ProfileSep))).as("x"),
        fold.as("f"))
      .where(col("x") =!= col("f"))
      .count()
    assert(diff === 0L)
  }

  test("trigram_hits on hand-computed strings") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val got = Seq("the thing", "xx", "aaa").toDF("t")
      .select(call_function("trigram_hits", col("t"), lit(Profile.mkString(graft.functions.TrigramHits.ProfileSep))))
      .collect().map(_.getInt(0)).toSeq
    // "the thing": the, he , e t,  th, thi, hin, ing -> the, "he ", " th", ing = 4
    assert(got === Seq(4, 0, 0))
  }
}
