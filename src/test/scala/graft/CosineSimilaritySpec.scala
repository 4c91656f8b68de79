package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** The custom Catalyst expression: codegen/interpreted parity against
  * the built-in HOF formulation, null handling, SQL registration.
  */
class CosineSimilaritySpec extends SparkSpecBase {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),   // identical -> 1.0
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),   // orthogonal -> 0.0
    (3L, Array(1.5f, -2.0f, 0.5f), Array(-0.5f, 3.25f, 1.0f)) // arbitrary
  ).toDF("id", "a", "b")

  test("matches the built-in HOF formulation bit-for-bit") {
    GraftExtensions.register(spark)
    def hof(an: String, bn: String) = {
      val ad = transform(col(an), x => x.cast("double"))
      val bd = transform(col(bn), x => x.cast("double"))
      aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(ad, lit(0.0), (s, x) => s + x * x)) *
          sqrt(aggregate(bd, lit(0.0), (s, x) => s + x * x)))
    }
    val rows = vecs.select(
      call_function("cosine_sim", col("a"), col("b")).as("fast"),
      hof("a", "b").as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null inputs yield null, not a crash") {
    GraftExtensions.register(spark)
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("registers through spark.sql.extensions for SQL users") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("cos_vecs")
    val one = spark.sql("SELECT cosine_sim(a, b) AS c FROM cos_vecs WHERE id = 1")
      .collect().head.getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("rejects non-float-array arguments at analysis time") {
    GraftExtensions.register(spark)
    val bad = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    }
  }
}
