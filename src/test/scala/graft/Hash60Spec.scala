package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftExtensions

/** hash60_arr parity: the codegen'd array hash must be bit-identical
  * to the builtin conv(substr(md5(s),1,15),16,10) formulation,
  * including unicode, empty strings, null elements, empty arrays.
  */
class Hash60Spec extends SparkSpecBase {

  import spark.implicits._

  test("matches the builtin md5 formulation element-for-element") {
    GraftExtensions.register(spark)
    val df = Seq(
      Seq("hello", "", "a b c", "日本語テキスト", "ünïcødé", "x" * 500),
      Seq("the quick brown fox"),
      Seq.empty[String]
    ).toDF("arr")
    val rows = df.select(
      Portable.hash60Array(col("arr")).as("fast"),
      transform(col("arr"), s => Portable.hash60(s)).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("null elements propagate as null elements; null array as null") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, Some(Seq(Some("a"), None, Some("b")))),
      (2L, None: Option[Seq[Option[String]]])
    ).toDF("id", "arr")
      .select(col("id"), Portable.hash60Array(col("arr")).as("h"))
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    val r1 = byId(1L).getSeq[Any](1)
    assert(r1.size === 3 && r1(1) == null && r1(0) != null)
    assert(byId(2L).isNullAt(1))
  }
}
