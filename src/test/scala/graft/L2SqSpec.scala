package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Parity lock for the codegen'd `l2_sq` expression: must equal the
  * interpreted HOF formulation it replaces, bit for bit, on real
  * embeddings (same double accumulation order).
  */
class L2SqSpec extends SparkSpecBase {

  test("l2_sq matches the interpreted HOF formulation on real embeddings") {
    GraftExtensions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.alias("a").join(e.alias("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    val builtin = aggregate(
      zip_with(transform(col("x"), _.cast("double")),
        transform(col("y"), _.cast("double")),
        (p, q) => (p - q) * (p - q)),
      lit(0.0), (acc, v) => acc + v)
    val rows = pairs
      .select(call_function("l2_sq", col("x"), col("y")).as("fast"),
        builtin.as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("l2_sq hand-computed fixture") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val got = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, 4.0f, 1.0f)))
      .toDF("x", "y")
      .select(call_function("l2_sq", col("x"), col("y")))
      .collect().head.getDouble(0)
    assert(got === 0.25 + 4.0 + 4.0)
  }
}
