package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Measurement utility (optimization guide §1.2/§7.2): dumps each named
  * query's `.explain("formatted")` physical plan to `<outDir>/<name>.txt`
  * so before/after plan evidence can be committed (plans/r18/...).
  * Batch queries only render the initial (pre-AQE) plan — the same
  * deterministic view PlanLockSpec digests; no job is executed.
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> [suffix] [names...]"
  *
  * `suffix` (e.g. `_before`/`_after`) is appended to each file name.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
          println(s"[plandump] wrote $name$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
