package graft

import graft.ops.{Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-13 stats batch: Poisson
  * bootstrap, Kruskal–Wallis, Good–Turing.
  */
class StatsExtrasSpec extends SparkSuite {

  /** JVM reference of the pinned Poisson(1) threshold draw. */
  private def refWeight(id: Long, r: Int, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pb:$salt:$id:$r".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(hex.take(8), 16)
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L, 4294962463L,
      4294966817L, 4294967252L, 4294967292L)
    ts.count(u >= _).toLong
  }

  test("poissonBootstrapMean: exact point mean, JVM-replayed replicate " +
      "means, rank-exact CI bounds, reproducible") {
    val n = 200
    val ids = (1L to n.toLong)
    val xs = ids.map(i => i * 10L) // mean = 1005.0 exactly
    val d = frame("id" -> ids.toSeq, "x" -> xs.toSeq)
    val out = Stats.poissonBootstrapMean(d, "id", "x",
      reps = 48, salt = "t").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(0) === n.toLong)
    assert(r.getDouble(2) === 1005.0) // exact integer mean
    // JVM replay of every replicate mean -> expected se and CI ranks
    val ms = (0 until 48).flatMap { rep =>
      val (sw, swx) = ids.foldLeft((0L, BigInt(0))) { case ((a, b), i) =>
        val w = refWeight(i, rep, "t")
        (a + w, b + BigInt(w) * (i * 10L))
      }
      if (sw == 0) None
      else Some((BigInt(2) * swx * 1000000 + sw) / (BigInt(2) * sw))
    }
    assert(r.getLong(1) === ms.length.toLong, "reps_used")
    val sorted = ms.sorted
    assert(r.getDouble(4) === sorted(1).toDouble / 1e6, "ci_lo = rank 2")
    assert(r.getDouble(5) === sorted(46).toDouble / 1e6, "ci_hi = rank 47")
    val b = ms.length
    if (b == 48) {
      val sm = ms.sum; val smm = ms.map(m => m * m).sum
      val se = math.sqrt((BigInt(b) * smm - sm * sm).toDouble /
        (48.0 * 48.0 * 47.0)) / 1e6
      assert(r.getDouble(3) === BigDecimal(se)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val again = Stats.poissonBootstrapMean(d, "id", "x",
      reps = 48, salt = "t").collect()(0)
    assert(r.toSeq === again.toSeq)
    intercept[IllegalArgumentException] {
      Stats.poissonBootstrapMean(d, "id", "x", reps = 4)
    }
  }

  test("kruskalWallis: textbook no-tie fixture H = 3.857143; tie fixture " +
      "matches the hand correction; all-tied yields NULL h_adj") {
    // A = {1,2,3}, B = {4,5,6}: R_A = 6, R_B = 15, H = 27/7
    val d1 = frame("g" -> Seq("A", "A", "A", "B", "B", "B"),
      "v" -> Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val r1 = Stats.kruskalWallis(d1, col("g"), col("v")).collect()(0)
    assert(r1.getLong(0) === 6L && r1.getLong(1) === 2L)
    assert(r1.getDouble(2) === 3.857143)
    assert(r1.getDouble(3) === 3.857143) // no ties: h_adj == h
    // A = {1,1}, B = {2,2}: H_unc = 2.4, C = 1 - 12/60 = 0.8 -> 3.0
    val d2 = frame("g" -> Seq("A", "A", "B", "B"),
      "v" -> Seq(1L, 1L, 2L, 2L))
    val r2 = Stats.kruskalWallis(d2, col("g"), col("v")).collect()(0)
    assert(r2.getDouble(2) === 2.4)
    assert(r2.getDouble(3) === 3.0)
    // all values tied: zero correction denominator -> NULL h_adj
    val d3 = frame("g" -> Seq("A", "B"), "v" -> Seq(7L, 7L))
    val r3 = Stats.kruskalWallis(d3, col("g"), col("v")).collect()(0)
    assert(r3.getDouble(2) === 0.0)
    assert(r3.isNullAt(3))
  }

  test("goodTuring: hand frequency-of-frequencies, smoothed r*, unseen " +
      "mass N1/N, zero-filled sparse frequencies") {
    // tokens: a a a b b c -> N1=N2=N3=1, vocab 3, N 6
    val d = frame("text" -> Seq("a a a b b", "c"))
    val out = TextAnalysis.goodTuring(d).orderBy("r").collect()
    assert(out.length === 10)
    val byR = out.map(r => r.getLong(0) -> r).toMap
    assert(byR(1L).getLong(1) === 1L && byR(2L).getLong(1) === 1L &&
      byR(3L).getLong(1) === 1L)
    assert((4L to 10L).forall(byR(_).getLong(1) === 0L))
    assert(byR(1L).getDouble(2) === 2.0) // 2*N2/N1
    assert(byR(2L).getDouble(2) === 3.0) // 3*N3/N2
    assert(byR(3L).getDouble(2) === 0.0) // 4*N4/N3 with N4 = 0
    assert((4L to 10L).forall(byR(_).isNullAt(2)))
    for (r <- out) {
      assert(r.getLong(3) === 3L) // vocab
      assert(r.getLong(4) === 6L) // n_tokens
      assert(r.getDouble(5) === 0.166667) // p_unseen = 1/6
    }
  }
}
