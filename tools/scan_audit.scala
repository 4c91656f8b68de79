val spark2 = org.apache.spark.sql.SparkSession.builder().config("spark.sql.shuffle.partitions","8").config("spark.sql.session.timeZone","UTC").config("spark.sql.legacy.parquet.nanosAsLong","true").config("spark.sql.maxMetadataStringLength","10000").getOrCreate()
val d = "/root/testdata/sf0.001"
val heavy = Seq("lineitem", "orders", "events", "documents", "embeddings")
val names = graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("st"))
for (n <- names) {
  try {
    val plan = graft.SparkEntry.queries(n)(spark2, d).queryExecution.executedPlan.toString
    val counts = heavy.map(t => t -> s"$t\\.parquet".r.findAllIn(plan).length).filter(_._2 >= 2)
    if (counts.nonEmpty) println("MULTI " + n + " " + counts.map{case(t,c)=>s"$t=$c"}.mkString(","))
  } catch { case e: Throwable => println("ERR " + n + " " + e.getClass.getSimpleName) }
}
println("AUDIT_DONE " + names.length)
sys.exit(0)
