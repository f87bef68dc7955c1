package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** Pins [[Bpe]] against an INDEPENDENT scan-and-skip reference: the
  * classic BPE loop over symbol vectors (count adjacent pairs, take the
  * global argmax, greedy non-overlapping left-to-right replace). The
  * Spark implementation encodes words as boundary-delimited strings and
  * merges via `replace`; these tests prove that encoding is equivalent —
  * including back-to-back repeated symbols (" a  a  a  a "), where
  * non-overlapping-scan semantics are the whole argument, and symbols
  * containing quote/backslash metacharacters, which would corrupt
  * patterns spliced into SQL text (the merge patterns are lit() columns).
  */
class BpeSpec extends SparkSuite {

  // ---- reference implementation: symbol vectors, no Spark ----

  private def refWords(texts: Seq[String]): Map[Vector[String], Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (w, occ) =>
        w.split("").filter(_.nonEmpty).toVector -> occ.size.toLong
      }

  private def refPairCounts(
      words: Map[Vector[String], Long]): Map[(String, String), Long] =
    words.toSeq
      .flatMap { case (syms, cnt) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> cnt }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  /** Greedy non-overlapping left-to-right merge — the classic scan-and-skip. */
  private def refMergeWord(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn up to n merges; returns (merges, final word table). Argmax
    * tie-break (count DESC, lhs ASC, rhs ASC) — same as the engine. */
  private def refLearn(texts: Seq[String], n: Int)
      : (Seq[(Int, String, String, Long)], Map[Vector[String], Long]) = {
    var words = refWords(texts)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= n && !done) {
      val pc = refPairCounts(words)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        merges += ((step, l, r, c))
        words = words.map { case (syms, cnt) => refMergeWord(syms, l, r) -> cnt }
        step += 1
      }
    }
    (merges.result(), words)
  }

  /** Reference word table rendered in the engine's boundary encoding. */
  private def refSeqs(words: Map[Vector[String], Long]): Set[(String, Long)] =
    words.map { case (syms, cnt) => (" " + syms.mkString("  ") + " ", cnt) }.toSet

  private def learnAndCompare(texts: Seq[String], n: Int): Unit = {
    val docs = frame("text" -> texts)
    val got = Bpe.learnMerges(docs, n).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val (want, refFinal) = refLearn(texts, n)
    assert(got == want, s"merges diverge:\n got  $got\n want $want")
    // applyMerges replays the learned merges — final segmentation must
    // equal the reference's final word table, byte for byte
    val gotSeqs = Bpe.applyMerges(docs, want.map(m => (m._2, m._3))).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotSeqs == refSeqs(refFinal),
      s"segmentation diverges:\n got  $gotSeqs\n want ${refSeqs(refFinal)}")
  }

  test("classic corpus: merges and final segmentation match scan-and-skip") {
    learnAndCompare(
      Seq("low low low lower lower newest newest newest",
        "lowest newest wider new new"),
      n = 8)
  }

  test("repeated-symbol words merge pairwise-greedily (' a  a  a  a ' form)") {
    // 'aaaa' must become (aa)(aa), 'aaa' must become (aa)(a) — the
    // non-overlapping scan; an overlapping or rescanning replace would
    // produce different counts on the very next iteration
    learnAndCompare(Seq("aaaa aaa aa aaaa aaaa", "aaaaa aa a"), n = 4)
  }

  test("symbols containing quotes and backslashes survive pattern building") {
    // after merge 1 the lhs/rhs symbols themselves contain \ and ' —
    // spliced SQL would mis-escape them; lit() patterns must not
    learnAndCompare(Seq("""a\b a\b a\b c'd c'd x''y x\\z"""), n = 5)
  }

  test("learnMerges stops early when no pair remains") {
    val docs = frame("text" -> Seq("a b c a b", "c a"))
    assert(Bpe.learnMerges(docs, 10).count() == 0L)
  }

  test("tokenizeReport: per-source totals match the reference segmentation") {
    val texts = Map(
      "s1" -> Seq("low low lower", "newest low"),
      "s2" -> Seq("newest newest wider"))
    val all = texts.values.flatten.toSeq
    val n = 4
    val (want, _) = refLearn(all, n)
    // reference per-source totals: segment each word with the learned
    // merges, weight by per-source occurrences
    def segLen(w: String): Long = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      want.foreach { case (_, l, r, _) => syms = refMergeWord(syms, l, r) }
      syms.length.toLong
    }
    val expect = texts.map { case (src, ts) =>
      val ws = ts.flatMap(_.split(" ").filter(_.nonEmpty))
      val chars = ws.map(_.length.toLong).sum
      val toks = ws.map(segLen).sum
      src -> ((ws.size.toLong, chars, toks,
        math.round(chars.toDouble / toks * 1e6) / 1e6))
    }
    val docs = frame(
      "source" -> texts.toSeq.flatMap { case (s, ts) => ts.map(_ => s) },
      "text" -> texts.toSeq.flatMap(_._2))
    val got = graft.ops.Bpe.tokenizeReport(docs, nMerges = n).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got == expect, s"\n got  $got\n want $expect")
  }

  test("charSeq has no trailing-empty artifact: ' h  i  s ' exactly") {
    val got = frame("w" -> Seq("his", "a"))
      .select(Bpe.charSeq(col("w")).as("s"))
      .orderBy(length(col("s")).desc).collect().map(_.getString(0)).toSeq
    assert(got == Seq(" h  i  s ", " a "), s"got ${got.map("[" + _ + "]")}")
  }
}
