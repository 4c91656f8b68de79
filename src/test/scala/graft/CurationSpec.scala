package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Cross-query contracts of the curation capstones: the audit's verdict
  * partition must agree with the manifests it explains, and the landed
  * manifest table must actually prune on its partition keys.
  */
class CurationSpec extends SparkSpecBase {

  test("c03 audit partitions the corpus; kept set equals c02's manifest ids") {
    try {
      val nDocs = Tables.documents(spark, sf).count()
      val audit = Curation.c03_curation_audit(spark, sf).cache()
      assert(audit.count() === nDocs, "audit must verdict every document exactly once")
      assert(audit.groupBy(col("doc_id")).count().where(col("count") > 1).count() === 0)
      val kept = audit.where(col("stage") === "kept").select(col("doc_id"))
      val manifest = Curation.c02_curated_manifest(spark, sf).select(col("doc_id"))
      assert(kept.exceptAll(manifest).count() === 0 &&
        manifest.exceptAll(kept).count() === 0,
        "audit 'kept' set must equal the c02 manifest id set")
    } finally spark.catalog.clearCache()
  }

  test("c03 stage labels are exactly the gate order taxonomy") {
    try {
      val stages = Curation.c03_curation_audit(spark, sf)
        .select(col("stage")).distinct().collect().map(_.getString(0)).toSet
      val legal = Set("1_heuristic", "2_duplicate", "3_contaminated",
        "4_sampled_out", "5_perplexity", "6_classifier", "kept")
      assert(stages.subsetOf(legal), s"unknown stage labels: ${stages -- legal}")
      assert(stages.contains("kept"), "fixture must keep at least one document")
    } finally spark.catalog.clearCache()
  }

  test("c04 real-manifest read-back prunes on (split, shard) at the directory level") {
    try {
      val q = Curation.c04_manifest_table(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), s"no partition filter in plan:\n$plan")
      val files = q.select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0))
      assert(files.nonEmpty, "pruned read-back must still scan the matching partitions")
      assert(files.forall(f => f.contains("split=train") &&
        "shard=(\\d+)".r.findFirstMatchIn(f).exists(_.group(1).toInt < 8)),
        s"scanned a non-matching partition directory:\n${files.mkString("\n")}")
    } finally spark.catalog.clearCache()
  }
}
