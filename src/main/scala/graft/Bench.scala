package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line and (because sbt wraps
  * stdout in `[info]` prefixes that break the driver's parse) also
  * writes the same line to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_out.json` in the cwd).
  *
  * Methodology (fixes the round-1 verdict findings):
  *  - a warmup pass at sf0.001 first, so JVM/JIT/codegen warmup is not
  *    billed to whichever query happens to run first;
  *  - results are materialized with a `noop`-format write, not
  *    `count()` — a count lets Catalyst prune every projection
  *    expression, under-measuring pure-projection queries; noop
  *    executes the full plan and discards rows executor-side;
  *  - failures are recorded per query (`"failed":[...]`) and excluded
  *    from the total instead of being silently reported as fast runs.
  */
object Bench {
  private val WarmupDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS); see graft.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // warmup at the smallest SF: same plans (only the scan path differs),
    // so codegen + JIT are hot before anything is timed.
    if (Files.exists(Paths.get(WarmupDir)))
      SparkEntry.queries.foreach { case (name, fn) => exec(name, fn, WarmupDir) }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, ok) = exec(name, fn, sfDir)
      (name, sec, ok)
    }
    val good = results.filter(_._3)
    val failed = results.filterNot(_._3).map(_._1)
    val qs = good.map { case (k, v, _) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")
    try Files.writeString(Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    spark.stop()
  }
}
