package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Curation, Dedup, Layout, Multimodal, Quality, Relational, Similarity, TextAnalysis}
import graft.streaming.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a pure
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the DuckDB
  * twin for the driver's differential check. Column names/aliases agree
  * on both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (M0): brand revenue star join — scan → broadcast dim
    * join → partial agg → single shuffle. Driver smoke-checks rows>0 at
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.a01_brand_revenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ TextAnalysis.queries ++
      Similarity.queries ++ Multimodal.queries ++ StreamQueries.queries ++
      Curation.queries ++ Layout.queries ++ Quality.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Dedup.oracles ++ TextAnalysis.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ StreamQueries.oracles ++
      Curation.oracles ++ Layout.oracles ++ Quality.oracles
}
