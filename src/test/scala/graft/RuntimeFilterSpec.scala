package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SPARK-32268, `InjectRuntimeFilter`)
  * — the row-level sibling of dynamic partition pruning and a genuine
  * 100 TB lever: when one join side carries a selective filter,
  * Catalyst builds a bloom filter over its join keys at runtime and
  * injects `bloom_filter_might_contain` into the OTHER side's scan,
  * so non-joinable rows die at the scan instead of riding the shuffle.
  *
  * This is demonstrated as a SPEC rather than a registered query
  * because the injection thresholds are SESSION confs
  * (applicationSideScanSizeThreshold defaults to 10 GB — nothing at
  * test scale qualifies), and a registered query must not mutate the
  * shared session other queries plan under (the plan-lock contract).
  * The thresholds are lowered here, the injection is asserted in the
  * optimized plan, the results are proven identical to the
  * unfiltered-plan join, and every conf is restored.
  */
class RuntimeFilterSpec extends SparkSpecBase {

  test("runtime bloom filter: selective build side injects bloom_filter_might_contain into the probe scan; rows unchanged") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: with a broadcast join the probe side
      // still scans everything, which is exactly what the bloom
      // filter exists to stop
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }

    def join() = {
      val o = Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }

    val expected = join().collect().toSet // thresholds untouched: no injection
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = join()
      val plan = j.queryExecution.optimizedPlan.toString
      // Spark 4.1 pretty-prints the pair as might_contain(...) over a
      // bloom_filter_agg(...) scalar subquery on the creation side
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter was not injected:\n$plan")
      assert(j.collect().toSet === expected,
        "the bloom filter is a may-contain pre-filter — it must never change the join result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
