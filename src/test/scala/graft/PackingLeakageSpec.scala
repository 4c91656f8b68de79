package graft

import org.apache.spark.sql.functions._

/** Structural invariants of t42 (sequence packing) and t43 (split
  * leakage) that the differential oracle cannot express directly —
  * conservation, bounds and partition-exactness properties that must
  * hold for ANY corpus, not just hash-equality on this one.
  */
class PackingLeakageSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sf)

  test("t42: packing conserves every token and every document exactly once") {
    val out = operators.TextAnalysis.queries("t42_sequence_packing")(spark, sf)
      .select(col("win_id"), col("n_docs"), col("doc_tokens"), col("first_doc"))
      .orderBy(col("win_id"))
      .collect()
    val perDoc = docs
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .agg(sum(col("n_tok")).as("tot"), count(lit(1)).as("n"))
      .head()
    val (totTok, nDocs) = (perDoc.getLong(0), perDoc.getLong(1))
    // conservation: every token and every document lands in exactly
    // one window (start-window attribution is a partition of docs)
    assert(out.map(_.getLong(2)).sum === totTok)
    assert(out.map(_.getLong(1)).sum === nDocs)
    // window ids live inside the corpus token budget; a window can be
    // start-empty only when a long doc spans it, so ids need not be
    // contiguous — but the max start offset bounds them from above
    val maxWin = (totTok - 1) / 512
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= maxWin))
    // the global order is real: first_doc strictly increases with win_id
    val firsts = out.map(_.getLong(3))
    assert(firsts.zip(firsts.tail).forall { case (a, b) => a < b })
  }

  test("t43: the split partitions the corpus and leakage is a bounded per-mille") {
    val split = docs.select(col("doc_id"),
      operators.TextAnalysis.isTrainSplit(col("doc_id")).as("is_train"))
    val n = docs.count()
    val nTrain = split.where(col("is_train")).count()
    val nVal = split.where(!col("is_train")).count()
    assert(nTrain + nVal === n) // disjoint-exhaustive: no doc unassigned
    assert(nTrain > 0 && nVal > 0)

    val out = operators.TextAnalysis.queries("t43_split_leakage")(spark, sf)
      .collect()
    // one score row per val doc that HAS shingles (≥3 tokens); never
    // a train doc, never a duplicate
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    val valIds = split.where(!col("is_train"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.forall(valIds.contains))
    // bounds: 0 ≤ n_leaked ≤ n_shingles, leak_pm = floor ratio in [0, 1000]
    out.foreach { r =>
      val (nSh, nLk, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSh > 0 && nLk >= 0 && nLk <= nSh)
      assert(pm === nLk * 1000 / nSh)
      assert(pm >= 0 && pm <= 1000)
    }
  }
}
