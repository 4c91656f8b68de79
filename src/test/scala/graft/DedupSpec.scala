package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dedup/text-analysis invariants over a hand-built corpus with known
  * duplicates (the testdata's planted copies are asserted structurally
  * by the differential gate; this fixes exact expected pairs).
  */
class DedupSpec extends SparkSpecBase {

  import spark.implicits._

  /** doc 0 (30 tokens, %10==0 → gets a planted copy by the operators),
    * docs 1 and 2 share identical text (natural exact dup), doc 3 is
    * unrelated.
    */
  private lazy val fixtureDir: String = {
    val dir = tmpDir("docs_fixture_")
    val t0 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val t1 = (1 to 12).map(i => s"dup$i").mkString(" ")
    val t3 = (1 to 12).map(i => s"other$i").mkString(" ")
    Seq(
      (0L, t0, "en", "web", t0.length.toLong),
      (1L, t1, "en", "web", t1.length.toLong),
      (2L, t1, "en", "web", t1.length.toLong),
      (3L, t3, "en", "web", t3.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("d01: exact groups, deterministic keeper, copy counts") {
    val got = Dedup.d01_exact_dedup(spark, fixtureDir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // keeper 0 has its planted copy (id 1000000); keeper 1 has doc 2; doc 3 alone
    assert(got === Map(0L -> 2L, 1L -> 2L, 3L -> 1L))
  }

  test("d02: MinHash-LSH finds the planted near-dup and the exact dup") {
    val pairs = Dedup.d02_minhash_lsh(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1000000L)), "head-truncated near-copy missed")
    assert(pairs.contains((1L, 2L)), "identical docs missed")
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 3L) },
      "unrelated docs must not pair")
  }

  test("d04: exact Jaccard equals 1.0 for identical docs") {
    val rows = Dedup.d04_ngram_jaccard(spark, fixtureDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((1L, 2L)) === 1.0)
    assert(rows((0L, 1000000L)) >= 0.5)
  }

  test("d04: planted stop-shingle (df > cap) no longer pairs; discriminative dups still do") {
    val dir = tmpDir("docs_dfcap_")
    // docs 1-5: identical text whose ONLY shingle ("zz zz zz") lands in
    // all five docs — df = 5 > cap, so the cap must kill every pairing.
    // docs 21/22: identical text over discriminative shingles (df = 2)
    // — must still pair with Jaccard 1.0.
    val stop = "zz zz zz zz zz zz"
    val disc = "aa bb cc dd ee ff"
    val rows = (1L to 5L).map(i => (i, stop, "en", "web", stop.length.toLong)) ++
      Seq((21L, disc, "en", "web", disc.length.toLong),
          (22L, disc, "en", "web", disc.length.toLong))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val capped = Dedup.ngramJaccard(spark, dir, dfCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a <= 5 && b <= 5 },
      s"stop-shingle docs must not pair under the df-cap, got $capped")
    assert(capped.contains((21L, 22L)), "discriminative dup pair lost by the cap")

    // sanity: without the cap the stop-shingle docs DO pair (the
    // quadratic blowup the cap exists to prevent)
    val uncapped = Dedup.ngramJaccard(spark, dir, dfCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)), "fixture must pair without the cap")
  }

  test("d07: propagation converged at K rounds; every d35 pair co-clusters; keeper is the min id") {
    val k = Dedup.ClusterIters
    val atK = Dedup.clusterLabels(spark, sf, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val atK1 = Dedup.clusterLabels(spark, sf, k + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atK === atK1, "one more round must change nothing (converged)")
    // the cluster contract is the transitive closure of the SHARED
    // edge artifact — d35's rot-block pairs since r18 (d03 pairs the
    // blocking misses at hamming 3-5 are NOT guaranteed to co-cluster)
    val pairs = Dedup.d35_simhash_rotblock(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(atK(a) === atK(b), s"pair ($a,$b) split across clusters")
    }
    atK.groupBy(_._2).foreach { case (lblId, members) =>
      assert(lblId === members.keys.min, s"cluster $lblId keeper not the min id")
    }
  }

  test("d07 fixpoint driver loop: converges, matches the fixed-K clusters, bounded rounds") {
    val (fixDf, rounds) = Dedup.clusterLabelsFixpoint(spark, sf)
    val fix = fixDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixedK = Dedup.clusterLabels(spark, sf, Dedup.ClusterIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix === fixedK,
      "fixpoint labels must equal the oracle-checked fixed-K labels")
    // converged strictly before the safety bound, and within the
    // fixed-K budget + the one confirming round
    assert(rounds >= 1 && rounds <= Dedup.ClusterIters + 1,
      s"unexpected round count $rounds")
  }

  test("d34: alternating stars land exactly on the converged propagation labels") {
    val stars = Dedup.d34_star_components(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (fixDf, _) = Dedup.clusterLabelsFixpoint(spark, sf)
    val fix = fixDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars === fix,
      "star-forest labels must equal the fixpoint propagation labels")
    // the keeper flag marks exactly the component minima
    val keepers = Dedup.d34_star_components(spark, sf)
      .where(col("is_keeper")).collect().map(_.getLong(0)).toSet
    assert(keepers === fix.values.toSet,
      "keepers must be exactly the component-min labels")
  }

  test("d34 fixpoint driver loop: converges inside the fixed budget, matches the fixed-round form") {
    val (starFixDf, rounds) = Dedup.starComponentsFixpoint(spark, sf)
    val starFix = starFixDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixedR = Dedup.d34_star_components(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starFix === fixedR,
      "fixpoint star labels must equal the registered fixed-round labels")
    assert(rounds >= 1 && rounds <= Dedup.StarRounds,
      s"star alternation took $rounds rounds, budget ${Dedup.StarRounds}")
  }

  test("d08: leaked eval item contaminates exactly its source doc") {
    // fixture doc 0 is the only id % 50 == 0 → one planted eval item
    // (head-truncated copy, id 2000000) sharing 23 rare shingles with
    // doc 0; docs 1-3 share nothing with it.
    val rows = Dedup.d08_decontam(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((0L, 1L, 23L)),
      s"expected only doc 0 contaminated once with overlap 23, got ${rows.toSeq}")
  }

  test("st16: streaming decontamination agrees with d08 on the planted fixture") {
    // caps are non-binding on 4 docs, so the eval-df rule and d08's
    // combined-df rule coincide: the replayed ingest must find exactly
    // the batch answer.
    val streamed = graft.streaming.StreamQueries.st16_stream_decontam(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = Dedup.d08_decontam(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    spark.catalog.clearCache()
    assert(streamed.toSeq === Seq((0L, 1L, 23L)))
    assert(streamed.toSeq === batch.toSeq,
      s"ingest-time and batch decontamination disagree: ${streamed.toSeq} vs ${batch.toSeq}")
  }

  test("t14: packing is contiguous per shard — seq/offset from the running token sum") {
    val dir = tmpDir("t14_fixture_")
    // four docs in the SAME shard (ids ≡ 0 mod 32), token counts
    // 3000/2000/1000/5000 → starts 0, 3000, 5000, 6000 under budget 4096
    def txt(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((0L, txt(3000)), (32L, txt(2000)), (64L, txt(1000)), (96L, txt(5000)))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t14_pack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 0L, 3000L, 0L, 0L),
      (32L, 0L, 2000L, 0L, 3000L),
      (64L, 0L, 1000L, 1L, 904L),
      (96L, 0L, 5000L, 1L, 1904L)), s"got ${got.toSeq}")
  }

  /** d18's planted half-excerpts must surface with full containment:
    * every shingle of the excerpt appears in its source, and kept-ness
    * under the df-cap is global per shingle, so the per-mille stays
    * 1000 whatever the cap drops. Docs too short to clear the
    * ContainMinShingles floor are exempt by construction.
    */
  test("d18: every long-enough planted excerpt is contained in its source at ~1000 per-mille") {
    val out = graft.operators.Dedup.d18_containment(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val planted = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 17 === 4)
      // excerpt = ceil(n/2) tokens → needs n ≥ 23 for ≥10 shingles
      .where(size(split(col("text"), " ")) >= 23)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty, "fixture must plant qualifying excerpts")
    for (id <- planted) {
      val hit = out.exists { case (sub, sup, pm) =>
        ((sub == id + 1000000L && sup == id) || (sub == id && sup == id + 1000000L)) &&
          pm >= 990
      }
      assert(hit, s"excerpt of doc $id not detected as contained")
    }
  }

  /** d19's whole point: DETECTED near-dups never straddle the
    * train/eval fence (detection recall is d03's banding contract,
    * not d19's — a copy the LSH missed is a d03 fixture fact). The
    * invariant is that split is a pure function of cluster_id; the
    * non-vacuity check shows the naive doc_id-hash rule WOULD
    * straddle at least one detected pair that cluster-hashing keeps
    * together.
    */
  test("d19: split is per-cluster; doc-hash splitting would straddle a detected pair") {
    val rows = graft.operators.Dedup.d19_cluster_split(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // one split per cluster
    val byCluster = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    assert(byCluster.forall(_._2.size == 1),
      s"clusters with mixed splits: ${byCluster.filter(_._2.size > 1).keys.take(3).toSeq}")
    assert(rows.map(_._3).toSet === Set("train", "val", "test"),
      "all three splits should be populated at this corpus size")
    // contrast: under split-by-doc_id, some multi-doc cluster straddles
    def docSplit(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    val multi = rows.groupBy(_._2).filter(_._2.length >= 2)
    assert(multi.nonEmpty, "fixture must produce multi-doc clusters")
    val straddles = multi.values.exists { members =>
      members.map(m => docSplit(m._1) match {
        case b if b < 80 => "train"; case b if b < 90 => "val"; case _ => "test"
      }).distinct.size > 1
    }
    assert(straddles,
      "doc-hash splitting never straddles any detected pair here — the contrast is vacuous")
  }

  /** d21's planted delta-quotes-standing excerpts must surface against
    * their sources (conservative denominator, so ≥900‰, not ==1000‰:
    * a source shingle the df-cap dropped counts against the score by
    * design).
    */
  test("d21: every long-enough planted delta excerpt is flagged against its standing source") {
    val out = graft.operators.Dedup.d21_incremental_containment(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .where(size(split(col("text"), " ")) >= 23)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty, "fixture must plant qualifying excerpts")
    for (id <- planted)
      assert(out.contains((id + 1000000L, id)),
        s"delta excerpt of standing doc $id not flagged as contained")
  }

  /** t28's real payoff is the estimator: the k-doc priority sample +
    * τ = (k+1)-th priority gives the unbiased Horvitz–Thompson
    * estimate Σ max(wᵢ, τ) of the corpus's TOTAL weight — asserted
    * here against the true total (the differential gate checks the
    * sample rows; only the spec can check the estimate contract).
    */
  test("t28: Horvitz-Thompson estimate from the priority sample tracks the true total") {
    val k = TextAnalysis.WSampleK
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("double").as("w"),
        (col("n_chars").cast("double") * lit(1152921504606846976.0) /
          (graft.functions.Portable.hash60(
            concat(lit("wsample:"), col("doc_id").cast("string"))) + lit(1L))
            .cast("double")).as("pri"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      .sortBy { case (_, pri) => -pri }
    val trueTotal = docs.map(_._1).sum
    assert(docs.length > k + 1, "fixture must exceed the sample size")
    val tau = docs(k)._2
    val est = docs.take(k).map { case (w, _) => math.max(w, tau) }.sum
    val relErr = math.abs(est - trueTotal) / trueTotal
    assert(relErr <= 0.25, s"HT estimate $est vs true $trueTotal (relErr $relErr)")
  }

  test("t15: stratified sample keeps every non-en doc, downsamples en, deterministically") {
    val dir = tmpDir("t15_fixture_")
    val docs = (0 until 200).map(i => (i.toLong, s"en text $i", "en", "web", 10L)) ++
      (200 until 250).map(i => (i.toLong, s"fr texte $i", "fr", "web", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val a = TextAnalysis.t15_stratified_sample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val b = TextAnalysis.t15_stratified_sample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq, "sampling must be deterministic across runs")
    assert(a.count(_._2 == "fr") === 50, "rate-1.0 stratum must survive intact")
    val en = a.filter(_._2 == "en")
    assert(en.forall(_._3 < 3500L), "kept en docs must sit under the rate threshold")
    // hash-uniform: 200 en docs at 35% → ~70 kept; allow wide slack
    assert(en.length > 40 && en.length < 100, s"en kept ${en.length}, expected ≈70")
  }

  test("t07: scrubber masks planted email, url and number") {
    val dir = tmpDir("t07_fixture_")
    // doc_id 7 gets the planted PII suffix (7 % 7 == 0)
    val t = "hello world"
    Seq((7L, t, "en", "web", t.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.t07_scrub(spark, dir).collect().head
    assert(r.getAs[Long]("n_emails") === 1L)
    assert(r.getAs[Long]("n_urls") === 1L)
    assert(r.getAs[Long]("n_nums") === 1L)
    assert(r.getAs[String]("clean_text") ===
      "hello world contact <EMAIL> via <URL> id <NUM>")
  }

  test("t02: token stats on a known text") {
    val dir = tmpDir("t02_fixture_")
    Seq((1L, "a bb ccc", "en", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.t02_token_stats(spark, dir).collect().head
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("n_distinct") === 3L)
    assert(r.getAs[Double]("ttr") === 1.0)
    assert(r.getAs[Double]("avg_token_len") === 2.0)
  }

  test("st18: the composed ingest pipeline gates, dedups, decontaminates and model-gates a crafted corpus") {
    // English texts that pass every heuristic gate (quality 3, trigram
    // ratio > 4%, sample bucket < 80 — verified constants):
    //   doc 10 (%10==0) gets a planted exact copy  -> dedups to one,
    //   then the TRAINED perplexity gate rejects it: doc 10 lands in
    //   the 5-doc fixture's VAL split, so every bigram is unseen by
    //   the LM and its mean log-prob sits far under the gate — the
    //   round-8 composition (st18 = c02's gate chain) working as
    //   specified on a tiny corpus
    //   docs 11/12 share identical text -> ONE output row (train-split
    //   text: in-model bigrams, passes both trained gates)
    //   doc 0 (%50==0) seeds the eval item: 5 junk tokens + doc 13's
    //   text, so its head-truncated eval twin IS doc 13's text — both
    //   doc 0 and doc 13 share 32 rare shingles with it -> both drop
    val t10 = "the quick brown fox jumped over one lazy dog and then ran into a bright " +
      "green field of tall grass while many small birds sang sweet songs during the " +
      "warm morning hours near an old wooden barn"
    val t11 = "a gentle river flowed past the quiet village and carried small boats " +
      "toward the distant sea while children played along its grassy banks under the " +
      "shade of ancient willow trees every summer afternoon"
    val t13 = "an old lighthouse stood on the rocky shore and guided weary sailors " +
      "through the stormy night while huge waves crashed against its strong stone " +
      "walls during the long cold winter season of that year"
    val t0 = "j1 j2 j3 j4 j5 " + t13
    val dir = tmpDir("st18_fixture_")
    Seq((0L, t0), (10L, t10), (11L, t11), (12L, t11), (13L, t13))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = try graft.streaming.StreamQueries.st18_stream_curation(spark, dir).collect()
      finally spark.catalog.clearCache()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.map(_.getAs[String]("content_hash")).toSet === Set(md5hex(t11)),
      s"got ${rows.mkString("; ")}")
    assert(rows.length === 1,
      "the natural dup must collapse to one row; doc 10 falls to the OOV perplexity gate")
    assert(rows.forall(r => r.getAs[Long]("quality_score") === 3L &&
      r.getAs[Long]("n_bpe_tokens") > 0L &&
      r.getAs[Double]("avg_lp_micro") >= TextAnalysis.PplGateMicro.toDouble &&
      r.getAs[Long]("log_odds_micro") >= 0L))
  }

  test("d09: candidates and recall are monotone along nested band chains") {
    // bands of r' nest inside bands of r along 12→6→4→2→1 and 6→3→2
    // (every r-block contains a full aligned r'-band), so the stricter
    // config's candidate set is a SUBSET of the looser one's — counts
    // and true positives must be nondecreasing along the chain.
    val rows = try Dedup.d09_lsh_tuning(spark, sf).collect()
      finally spark.catalog.clearCache()
    val byRows = rows.map(r =>
      r.getAs[Int]("n_rows") -> (r.getAs[Long]("n_cand"), r.getAs[Long]("n_tp"))).toMap
    assert(byRows.keySet === Set(12, 6, 4, 3, 2, 1))
    for (chain <- Seq(Seq(12, 6, 4, 2, 1), Seq(6, 3, 2)); Seq(a, b) <- chain.sliding(2)) {
      assert(byRows(a)._1 <= byRows(b)._1,
        s"candidates must not shrink from r=$a to r=$b: ${byRows(a)._1} > ${byRows(b)._1}")
      assert(byRows(a)._2 <= byRows(b)._2,
        s"true positives must not shrink from r=$a to r=$b")
    }
    val nTrue = rows.head.getAs[Long]("n_true")
    assert(rows.forall(_.getAs[Long]("n_true") === nTrue),
      "the exact ground truth is config-independent")
  }

  test("pickBanding: decision rule — meets target recall, max precision, ties to stricter") {
    val sweep = Seq(
      ("b1r12", 1, 12, 10L, 10L, 100L, Some(1.0), Some(0.10)),
      ("b3r4", 3, 4, 90L, 88L, 100L, Some(0.977), Some(0.88)),
      ("b4r3", 4, 3, 100L, 96L, 100L, Some(0.96), Some(0.96)),
      ("b6r2", 6, 2, 110L, 96L, 100L, Some(0.96), Some(0.96)),
      ("b12r1", 12, 1, 900L, 99L, 100L, Some(0.11), Some(0.99)))
      .toDF("cfg", "n_bands", "n_rows", "n_cand", "n_tp", "n_true", "prec", "recall")
    // b4r3 and b6r2 tie on precision among viable configs → stricter wins
    assert(Dedup.pickBanding(sweep, 0.95) === (4, 3))
    // unreachable target → fall back to the highest-recall config
    assert(Dedup.pickBanding(sweep, 0.999) === (12, 1))
    // a zero-candidate config (null prec) is never picked
    val degenerate = Seq(
      ("b1r12", 1, 12, 0L, 0L, 100L, None: Option[Double], Some(0.0)),
      ("b12r1", 12, 1, 900L, 50L, 100L, Some(0.056), Some(0.50)))
      .toDF("cfg", "n_bands", "n_rows", "n_cand", "n_tp", "n_true", "prec", "recall")
    assert(Dedup.pickBanding(degenerate, 0.95) === (12, 1))
  }

  test("pickBanding on the fixture sweep returns PickedBanding — the config d02 runs under") {
    val sweep = try Dedup.d09_lsh_tuning(spark, sf)
      finally {}
    try assert(Dedup.pickBanding(sweep, Dedup.TargetRecall) === Dedup.PickedBanding,
      "the monitor→decide→act loop must be closed: d02's banding IS the sweep's pick")
    finally spark.catalog.clearCache()
  }

  test("d11: standing-corpus copies drop at the anti-join; replants lose to their originals") {
    import org.apache.spark.sql.functions._
    val out = Dedup.d11_incremental_dedup(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty, "the delta must contribute new keepers")
    // a replanted copy (+1000000) can never beat its lower-id original
    assert(rows.forall(_.getLong(1) < 1000000L), "a planted copy became keeper")
    // every hash planted from the standing corpus must be absent
    val staleHashes = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select(md5(col("text")).as("content_hash"))
    assert(out.join(staleHashes, Seq("content_hash")).count() === 0L,
      "a standing-corpus hash slipped past the anti-join")
  }

  test("d12: every planted near-copy is flagged against its own standing original") {
    val pairs = try Dedup.d12_incremental_neardup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.catalog.clearCache()
    assert(pairs.nonEmpty, "the planted near-copies must surface")
    val planted = pairs.filter(_._1 >= 3000000L)
    assert(planted.nonEmpty, "no planted delta ids in the pair set")
    val missed = planted.collect {
      case (d, _) if !pairs.contains((d, d - 3000000L)) => d
    }
    assert(missed.isEmpty,
      s"planted copies not matched to their originals: $missed")
  }

  test("t18: training-split documents have zero unseen bigrams") {
    // every bigram of a train-split doc is, by construction, in the
    // model's count table; OOV can only come from the val split
    val lm = TextAnalysis.t18_bigram_lm(spark, sf)
    val splits = TextAnalysis.t09_split(spark, sf).select(col("doc_id"), col("split"))
    val trainOov = try lm.join(splits, "doc_id")
        .where(col("split") === "train" && col("n_oov") > 0).count()
      finally spark.catalog.clearCache()
    assert(trainOov === 0L, s"$trainOov train docs report unseen bigrams")
  }

  test("d13: shared passages drop from every carrier, unique text survives in order") {
    import spark.implicits._
    val boiler = "x1 x2 x3 x4 x5" // one exact 5-token passage shared by docs 1 and 2
    val docs = Seq(
      (1L, s"$boiler a1 a2 a3 a4 a5"),
      (2L, s"$boiler b1 b2 b3 b4 b5 b6 b7"), // tail chunk is SHORT (2 tokens)
      (3L, "c1 c2 c3 c4 c5"), // fully unique doc
      (4L, boiler)) // nothing but the shared passage -> empty survivor
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.passageDedup(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the shared passage vanishes from BOTH carriers; order is preserved
    assert(out(1L).getString(3) === "a1 a2 a3 a4 a5")
    assert(out(2L).getString(3) === "b1 b2 b3 b4 b5 b6 b7")
    assert(out(2L).getLong(1) === 3 && out(2L).getLong(2) === 2) // short tail kept
    // a unique doc is untouched
    assert(out(3L).getString(3) === "c1 c2 c3 c4 c5")
    // a doc that was ALL boilerplate still emits its row, empty
    assert(out(4L).getLong(2) === 0 && out(4L).getString(3) === "")
  }

  test("d15: every planted character mutation survives blocking and verifies") {
    val out = graft.operators.Dedup.d15_fuzzy_match(spark, sf).collect()
    val planted = out.filter(r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 1000000L)
    val expected = Tables.documents(spark, sf)
      .where(col("doc_id") % 10 === 0).count()
    assert(planted.length.toLong === expected,
      "each fuzzed copy must block with its original and pass the distance cap")
    assert(planted.forall(_.getAs[Long]("edit_dist") <= 16L))
    assert(planted.exists(_.getAs[Long]("edit_dist") > 0L),
      "the mid-text substitution must register a nonzero distance")
  }

  test("d15: an over-cap prefix block is dropped whole; discriminative recall survives") {
    // 5 docs share one 16-char boilerplate prefix (block size 5 > cap 4):
    // a skewed block whose fan-out would square — the cap must kill every
    // pairing inside it, including genuinely-near texts.
    val boiler = "SAMEPREFIX16CHAR" // exactly 16 chars = the whole block key
    val skewed = (1L to 5L).map(i => (i, s"$boiler unique tail $i"))
    // docs 21/22: a planted single-token mutation over a discriminative
    // prefix (block size 2 <= cap) — recall must survive the cap.
    val keep = Seq(
      21L -> "discriminative prefix alpha beta gamma delta",
      22L -> "discriminative prefix alpha beta gammaX delta")
    val corpus = (skewed ++ keep).toDF("doc_id", "text")
    val pairs = Dedup.fuzzyPairs(corpus, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((21L, 22L)),
      "cap must bind on the skewed block and ONLY the planted pair survive")
  }

  test("d14: one rank-maximal canonical per cluster; hubs rank above isolates") {
    val out = graft.operators.Dedup.d14_canonical_rank(spark, sf).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      val canon = rows.filter(_.getAs[Boolean]("is_canonical"))
      assert(canon.length === 1, s"cluster $cid must have exactly one canonical")
      val cb = (canon.head.getAs[Long]("rank_pico"), -canon.head.getAs[Long]("doc_id"))
      rows.foreach { r =>
        val rb = (r.getAs[Long]("rank_pico"), -r.getAs[Long]("doc_id"))
        assert(Ordering[(Long, Long)].lteq(rb, cb),
          s"cluster $cid: canonical must dominate on (rank, min id): $r")
      }
    }
    val sizes = byCluster.view.mapValues(_.length).toMap
    val (iso, conn) = out.partition(r => sizes(r.getAs[Long]("cluster_id")) == 1)
    assert(iso.nonEmpty && conn.nonEmpty, "fixture must have both isolates and clusters")
    iso.foreach(r => assert(r.getAs[Boolean]("is_canonical"),
      "an isolated doc is its own canonical"))
    val teleOnly = iso.map(_.getAs[Long]("rank_pico")).distinct
    assert(teleOnly.length === 1,
      "every isolated doc carries exactly the teleport-only rank")
    assert(conn.map(_.getAs[Long]("rank_pico")).max > teleOnly.head,
      "connected docs must accumulate inflow above the teleport floor")
  }

  test("d22/d23: a planted 3-clique yields one triangle per node, coefficient 1000, one frequency community") {
    import spark.implicits._
    val dir = tmpDir("docs_tri_")
    val base = (1 to 14).map(i => s"tok$i").mkString(" ")
    val pair = (1 to 14).map(i => s"pair$i").mkString(" ")
    // suffixes chosen so pairwise simhash hammings are ≤ 2 — inside
    // the rot-block geometry's pigeonhole-guaranteed radius (the r18
    // edge keying): base+alpha/upsilon/phi are [2,2,0] apart,
    // pair+alpha/sfx15 are 2 apart; the far doc is 17+ from everything
    Seq(
      (1L, base + " alpha", "en", "web", 100L),
      (2L, base + " upsilon", "en", "web", 100L),
      (3L, base + " phi", "en", "web", 100L),
      (4L, (1 to 14).map(i => s"far$i").mkString(" "), "en", "web", 80L),
      (5L, pair + " alpha", "en", "web", 100L),
      (6L, pair + " sfx15", "en", "web", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val tri = Dedup.d22_triangle_count(spark, dir)
      .where(col("doc_id").isin(1L, 2L, 3L)).collect()
    assert(tri.length === 3, s"clique nodes missing from d22: ${tri.toSeq}")
    tri.foreach { r =>
      assert(r.getAs[Long]("n_tri") === 1L && r.getAs[Long]("deg") === 2L &&
        r.getAs[Long]("clustering_pm") === 1000L,
        s"clique node verdict wrong: $r")
    }
    val com = Dedup.d23_lpa_communities(spark, dir)
    val c123 = com.where(col("doc_id").isin(1L, 2L, 3L))
      .select(col("community")).distinct().collect()
    assert(c123.length === 1, "the clique must share one frequency community")
    val c4 = com.where(col("doc_id") === 4L).head()
    assert(c4.getAs[Long]("community") === 4L &&
      c4.getAs[Long]("community_size") === 1L,
      "the isolate keeps its own singleton community")
    // the label-retention guarantee: a dup PAIR converges to ONE
    // community (pure synchronous LPA would 2-cycle and land back on
    // singletons after even rounds)
    val c56 = com.where(col("doc_id").isin(5L, 6L))
      .select(col("community")).distinct().collect()
    assert(c56.length === 1,
      "a pair must converge to one community — the retention self-vote")
  }

  test("t33: normalization is idempotent and merges case/punct/whitespace variants into one group") {
    import spark.implicits._
    val dir = tmpDir("docs_norm_")
    Seq(
      (1L, "Hello,   World! This is FINE.", "en", "web", 30L),
      (2L, "hello world this is fine", "en", "web", 24L),
      (3L, "HELLO WORLD--this is fine?!", "en", "web", 27L),
      (4L, "something else entirely", "en", "web", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.t33_normalize(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("changed"), r.getAs[String]("norm_hash"),
          r.getAs[Long]("n_same_norm"))).toMap
    assert(out(1L)._2 === out(2L)._2 && out(2L)._2 === out(3L)._2,
      "case/punct/whitespace variants must share the normalized key")
    assert(out(1L)._3 === 3L && out(4L)._3 === 1L, "group sizes wrong")
    assert(out(1L)._1 && out(3L)._1 && !out(2L)._1,
      "changed flag must mark exactly the non-canonical docs")
    // idempotence over the real corpus: a second application is a no-op
    val norm = TextAnalysis.normText(col("text"))
    val viol = graft.Tables.documents(spark, sf)
      .where(!(TextAnalysis.normText(norm) <=> norm)).count()
    assert(viol === 0L, s"normalization not idempotent on $viol docs")
  }

  test("d22: triangle mass on the corpus is divisible by 3; coefficients are valid per-mille") {
    val r = Dedup.d22_triangle_count(spark, sf)
    val tot = r.agg(coalesce(sum(col("n_tri")), lit(0L))).head().getLong(0)
    assert(tot % 3 === 0, s"per-node triangle mass $tot not divisible by 3")
    assert(r.where(col("clustering_pm") < 0 || col("clustering_pm") > 1000)
      .count() === 0, "clustering coefficient out of [0, 1000]")
  }
}
