package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Blockhash64, BloomMightContain, ByteShift, DHash64, ByteStats, CharCounts, CosineSimilarity, GramKeys, Hash60Array, L2Sq, MaxIntersect, MinHashMins, NibbleHist, Pcm16Frames, Pcm16Peaks, PeakPairs, RepStats, Simhash48, TrigramHits, WinnowMin, WordShingles3}

/** Session extensions registering graft's native Catalyst functions —
  * the `spark.sql.extensions` entry point, so SQL and `expr(...)` users
  * get them in any session:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * Currently: `cosine_sim(array<float>, array<float>) -> double`
  * ([[graft.functions.CosineSimilarity]], whole-stage-codegen'd).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.hash60Arr)
    ext.injectFunction(GraftExtensions.simhash48)
    ext.injectFunction(GraftExtensions.trigramHits)
    ext.injectFunction(GraftExtensions.minhashMins)
    ext.injectFunction(GraftExtensions.wordShingles3)
    ext.injectFunction(GraftExtensions.winnowMin)
    ext.injectFunction(GraftExtensions.byteStats)
    ext.injectFunction(GraftExtensions.l2Sq)
    ext.injectFunction(GraftExtensions.gramKeys)
    ext.injectFunction(GraftExtensions.bloomContains)
    ext.injectFunction(GraftExtensions.pcm16Frames)
    ext.injectFunction(GraftExtensions.pcm16Peaks)
    ext.injectFunction(GraftExtensions.blockhash64)
    ext.injectFunction(GraftExtensions.dhash64)
    ext.injectFunction(GraftExtensions.byteShift)
    ext.injectFunction(GraftExtensions.nibbleHist)
    ext.injectFunction(GraftExtensions.charCounts)
    ext.injectFunction(GraftExtensions.maxIntersect)
    ext.injectFunction(GraftExtensions.repStats)
    ext.injectFunction(GraftExtensions.peakPairs)
  }
}

object GraftExtensions {
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
      CosineSimilarity(args.head, args(1))
    })

  val hash60Arr: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hash60_arr"),
    new ExpressionInfo(classOf[Hash60Array].getName, "hash60_arr"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"hash60_arr expects 1 argument, got ${args.length}")
      Hash60Array(args.head)
    })

  val simhash48: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash48"),
    new ExpressionInfo(classOf[Simhash48].getName, "simhash48"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"simhash48 expects 1 argument, got ${args.length}")
      Simhash48(args.head)
    })

  val trigramHits: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("trigram_hits"),
    new ExpressionInfo(classOf[TrigramHits].getName, "trigram_hits"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"trigram_hits expects 2 arguments, got ${args.length}")
      TrigramHits(args.head, args(1))
    })

  val minhashMins: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_mins"),
    new ExpressionInfo(classOf[MinHashMins].getName, "minhash_mins"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"minhash_mins expects 2 arguments, got ${args.length}")
      MinHashMins(args.head, args(1))
    })

  val wordShingles3: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles3"),
    new ExpressionInfo(classOf[WordShingles3].getName, "word_shingles3"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"word_shingles3 expects 1 argument, got ${args.length}")
      WordShingles3(args.head)
    })

  val winnowMin: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_min"),
    new ExpressionInfo(classOf[WinnowMin].getName, "winnow_min"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"winnow_min expects 2 arguments, got ${args.length}")
      WinnowMin(args.head, args(1))
    })

  val byteStats: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("byte_stats"),
    new ExpressionInfo(classOf[ByteStats].getName, "byte_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"byte_stats expects 1 argument, got ${args.length}")
      ByteStats(args.head)
    })

  val l2Sq: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_sq"),
    new ExpressionInfo(classOf[L2Sq].getName, "l2_sq"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"l2_sq expects 2 arguments, got ${args.length}")
      L2Sq(args.head, args(1))
    })

  val gramKeys: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gram_keys"),
    new ExpressionInfo(classOf[GramKeys].getName, "gram_keys"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"gram_keys expects 2 arguments, got ${args.length}")
      GramKeys(args.head, args(1))
    })

  val bloomContains: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_contains"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"bloom_contains expects 2 arguments, got ${args.length}")
      BloomMightContain(args.head, args(1))
    })

  val pcm16Frames: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pcm16_frames"),
    new ExpressionInfo(classOf[Pcm16Frames].getName, "pcm16_frames"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"pcm16_frames expects 1 argument, got ${args.length}")
      Pcm16Frames(args.head)
    })

  val pcm16Peaks: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pcm16_peaks"),
    new ExpressionInfo(classOf[Pcm16Peaks].getName, "pcm16_peaks"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"pcm16_peaks expects 1 argument, got ${args.length}")
      Pcm16Peaks(args.head)
    })

  val blockhash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("blockhash64"),
    new ExpressionInfo(classOf[Blockhash64].getName, "blockhash64"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"blockhash64 expects 1 argument, got ${args.length}")
      Blockhash64(args.head)
    })

  val dhash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dhash64"),
    new ExpressionInfo(classOf[DHash64].getName, "dhash64"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"dhash64 expects 1 argument, got ${args.length}")
      DHash64(args.head)
    })

  val byteShift: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("byte_shift"),
    new ExpressionInfo(classOf[ByteShift].getName, "byte_shift"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"byte_shift expects 2 arguments, got ${args.length}")
      val c = args(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case e => throw new IllegalArgumentException(
          s"byte_shift: shift must be a foldable int literal, got $e")
      }
      ByteShift(args.head, c)
    })

  val maxIntersect: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("max_intersect"),
    new ExpressionInfo(classOf[MaxIntersect].getName, "max_intersect"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"max_intersect expects 2 arguments, got ${args.length}")
      MaxIntersect(args.head, args(1))
    })

  val peakPairs: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("peak_pairs"),
    new ExpressionInfo(classOf[PeakPairs].getName, "peak_pairs"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"peak_pairs expects 2 arguments, got ${args.length}")
      PeakPairs(args.head, args(1))
    })

  val repStats: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rep_stats"),
    new ExpressionInfo(classOf[RepStats].getName, "rep_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"rep_stats expects 1 argument, got ${args.length}")
      RepStats(args.head)
    })

  val charCounts: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_counts"),
    new ExpressionInfo(classOf[CharCounts].getName, "char_counts"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"char_counts expects 1 argument, got ${args.length}")
      CharCounts(args.head)
    })

  val nibbleHist: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nibble_hist"),
    new ExpressionInfo(classOf[NibbleHist].getName, "nibble_hist"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"nibble_hist expects 1 argument, got ${args.length}")
      NibbleHist(args.head)
    })

  /** Imperative registration for sessions created without the
    * `spark.sql.extensions` config (e.g. an already-running REPL).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(cosineSim, hash60Arr, simhash48, trigramHits, minhashMins,
        wordShingles3, winnowMin, byteStats, l2Sq, gramKeys,
        bloomContains, pcm16Frames, pcm16Peaks, blockhash64, dhash64,
        byteShift, nibbleHist, charCounts, maxIntersect, repStats,
        peakPairs).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
