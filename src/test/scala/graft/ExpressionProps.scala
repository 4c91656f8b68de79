package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{HashUtil, MinHashUtil, ShingleUtil, SimhashUtil, TrigramUtil, WinnowUtil}

/** Property-based checks of the codegen'd expression kernels against
  * independent first-principles models (pure Scala, no Spark session —
  * the Spark-side parity specs cover eval/codegen integration; these
  * cover the input space).
  */
object ExpressionProps extends Properties("graft.expressions") {

  private def arr(xs: Seq[Any]): GenericArrayData =
    new GenericArrayData(xs.toArray)

  private val longs = Gen.listOf(Gen.long)
  private val token = Gen.oneOf("a", "b", "ab", "zz", "", "tok")
  private val tokens = Gen.listOf(token)

  property("simhash48 = per-bit strict majority") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { hs =>
      val got = SimhashUtil.simhash48(arr(hs))
      (0 until 48).forall { k =>
        val cnt = hs.count(h => ((h >>> k) & 1L) == 1L)
        val want = 2 * cnt > hs.size
        (((got >>> k) & 1L) == 1L) == want
      }
    }

  property("minhash_mins(j) = min over (h xor seed_j)") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { hs =>
      val seeds = graft.functions.Portable.xorSeeds.take(12).toArray
      val got = MinHashUtil.mins(arr(hs), seeds)
      (0 until 12).forall { j =>
        got.getLong(j) == hs.map(_ ^ seeds(j)).min
      }
    }

  property("word_shingles3 = distinct sliding-3 windows, first-occurrence order") =
    forAll(tokens) { ts =>
      val text = ts.mkString(" ")
      val got = {
        val a = ShingleUtil.shingles3(UTF8String.fromString(text))
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      // model: java split round-trips the join exactly
      val toks = text.split(" ", -1).toSeq
      val want =
        if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      got == want
    }

  property("winnow_min = min hash60 over windows; sentinel below width") =
    forAll(tokens, Gen.choose(1, 5)) { (ts, w) =>
      val got = WinnowUtil.winnowMin(
        arr(ts.map(UTF8String.fromString)), w)
      if (ts.size < w) got == Long.MinValue
      else {
        val want = ts.sliding(w).map(win =>
          HashUtil.hash60(UTF8String.fromString(win.mkString(" ")))).min
        got == want
      }
    }

  property("hash60 = first 15 md5 hex chars as a long") =
    forAll(Gen.asciiPrintableStr) { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      HashUtil.hash60(UTF8String.fromString(s)) ==
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }

  property("nibble_hist = per-byte high-nibble counts") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val got = graft.functions.NibbleHistUtil.nibbleHist(bs.toArray)
      got.numElements() == 16 && (0 until 16).forall { k =>
        got.getLong(k) == bs.count(b => ((b & 0xff) >> 4) == k)
      }
    }

  property("char_counts = code-point frequency table, first-occurrence order") =
    forAll(Gen.listOf(Gen.oneOf('a', 'b', 'é', '世', 'z', ' '))) { cs =>
      val s = cs.mkString
      val a = graft.functions.CharCountsUtil.charCounts(UTF8String.fromString(s))
      val got = (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      // model: java code-point iteration, LinkedHashMap semantics
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      s.codePoints().toArray.foreach { cp =>
        val k = new String(Character.toChars(cp))
        m(k) = m.getOrElse(k, 0L) + 1L
      }
      got == m.toSeq
    }

  property("max_intersect = max over items of |distinct(es) ∩ distinct(ds)|") =
    forAll(Gen.listOf(Gen.listOf(Gen.choose(0L, 12L))), Gen.listOf(Gen.choose(0L, 12L))) {
      (ess, ds) =>
        val got = graft.functions.MaxIntersectUtil.maxIntersect(
          arr(ess.map(es => arr(es))), arr(ds))
        val want = (0 +: ess.map(es => (es.toSet intersect ds.toSet).size)).max
        got == want
    }

  property("rep_stats = per-family (top, npos, dup) of the tagged gram-key multiset") =
    forAll(Gen.listOf(Gen.choose(0L, 6L))) { hs => // tiny domain forces repeats
      val a = arr(hs)
      val row = graft.functions.RepStatsUtil.stats(a)
      Seq(2, 3, 5).zipWithIndex.forall { case (n, fi) =>
        // model: the exploded formulation — GramKeys.fold keys, grouped
        val ks = graft.functions.GramKeys.fold(a, n)
        val counts = (0 until ks.numElements()).map(ks.getLong)
          .groupBy(identity).values.map(_.size.toLong)
        val top = if (counts.isEmpty) 0L else counts.max
        val dup = counts.filter(_ > 1L).sum
        row.getLong(fi * 3) == top &&
          row.getLong(fi * 3 + 1) == ks.numElements().toLong &&
          row.getLong(fi * 3 + 2) == dup
      }
    }

  property("peak_pairs = (anchor, packed-hash) pairs, fanout-bounded, in order") =
    forAll(Gen.listOf(Gen.choose(0L, 32000L)), Gen.choose(1, 5)) { (ps, f) =>
      val got = graft.functions.PeakPairsUtil.pairs(arr(ps), f)
      val want = ps.zipWithIndex.flatMap { case (p, i) =>
        (1 to f).filter(d => i + d <= ps.length - 1).map(d =>
          (i.toLong, p * 131072L + ps(i + d) * 4L + d.toLong))
      }
      val gotSeq = (0 until got.numElements()).map { k =>
        val r = got.getStruct(k, 2); (r.getLong(0), r.getLong(1))
      }
      gotSeq == want
    }

  property("trigram_hits = count of sliding-3 windows in the profile") = {
    val profile = Seq("abc", "bca", "aab")
    val set = new java.util.HashSet[UTF8String]()
    profile.foreach(t => set.add(UTF8String.fromString(t)))
    forAll(Gen.listOf(Gen.oneOf('a', 'b', 'c'))) { cs =>
      val s = cs.mkString
      val want =
        if (s.length < 3) 0
        else s.sliding(3).count(profile.contains)
      TrigramUtil.count(UTF8String.fromString(s), set) == want
    }
  }
}
