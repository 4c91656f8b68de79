package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `winnow_min` expression against the
  * builtin formulation it replaced in t04.
  */
class WinnowMinSpec extends SparkSpecBase {

  private val W = 8

  test("winnow_min matches the interpreted window-build + hash60 + array_min chain") {
    GraftExtensions.register(spark)
    val toks = col("toks")
    val nWin = size(toks) - (W - 1)
    val fold = array_min(Portable.hash60Array(
      transform(sequence(lit(0), nWin - 1), i =>
        concat_ws(" ", (0 until W).map(o => element_at(toks, i + o + 1)): _*))))
    val diff = spark.read.parquet(s"$sf/documents.parquet")
      .select(split(col("text"), " ").as("toks"))
      .where(size(toks) >= W)
      .select(call_function("winnow_min", toks, lit(W)).as("x"), fold.as("f"))
      .where(!(col("x") <=> col("f")))
      .count()
    assert(diff === 0L)
  }

  test("winnow_min is null below the window width and exact at it") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = Seq("a b c", "a b c d e f g h")
      .toDF("t").select(split(col("t"), " ").as("toks"))
      .select(call_function("winnow_min", col("toks"), lit(W)).as("fp"))
      .collect()
    assert(rows(0).isNullAt(0), "3 tokens < window width -> null")
    // exactly one window: fingerprint = hash60 of the full string
    val expect = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("a b c d e f g h".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    assert(rows(1).getLong(0) === expect)
  }
}
