package graft

import graft.functions.Similarity
import graft.ops.{Experiments, Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-13 stats batch: Poisson
  * bootstrap, Kruskal–Wallis, Good–Turing.
  */
class StatsExtrasSpec extends SparkSuite {

  /** JVM reference of Experiments' md5 variant assignment. */
  private def refVariant(userId: Long, n: Int, salt: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$salt:$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % n).toInt
  }

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

  test("zipfFit: a perfect tf = C/rank corpus fits slope -1, r2 1, " +
      "intercept ln C; a single-term corpus degenerates to NULLs") {
    // tf: a=6, b=3, c=2 -> y = ln 6 - ln rank exactly
    val d = frame("text" -> Seq("a a a a a a b b b", "c c"))
    val r = TextAnalysis.zipfFit(d).collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === -1.0)
    assert(r.getDouble(2) === BigDecimal(math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(3) === 1.0)
    val deg = TextAnalysis.zipfFit(frame("text" -> Seq("a a"))).collect()(0)
    assert(deg.getLong(0) === 1L)
    assert(deg.isNullAt(1) && deg.isNullAt(2) && deg.isNullAt(3))
  }

  test("jsDivergence: identical distributions -> 0; disjoint vocab -> " +
      "ln 2 (the pair grid keeps zero-overlap pairs); partial overlap " +
      "matches the replayed formula") {
    val same = TextAnalysis.jsDivergence(
      frame("lang" -> Seq("g1", "g2"), "text" -> Seq("a b", "a b")))
      .collect()(0)
    assert(same.getLong(2) === 2L && same.getDouble(3) === 0.0)
    val disj = TextAnalysis.jsDivergence(
      frame("lang" -> Seq("g1", "g2"), "text" -> Seq("a", "b")))
      .collect()(0)
    assert(disj.getLong(2) === 0L)
    assert(disj.getDouble(3) === 0.693147) // ln 2
    // g1 = "a a b" vs g2 = "a c c": only `a` shared
    val part = TextAnalysis.jsDivergence(
      frame("lang" -> Seq("g1", "g2"), "text" -> Seq("a a b", "a c c")))
      .collect()(0)
    val (pa, pb) = (2.0 / 3.0, 1.0 / 3.0)
    val t = BigDecimal(
      0.5 * pa * math.log(2.0 * pa / (pa + pb))
        + 0.5 * pb * math.log(2.0 * pb / (pa + pb)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val js = BigDecimal(t + 0.34657359027997264
      * (2.0 - 2.0 / 3.0 - 1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(part.getLong(2) === 1L)
    assert(part.getDouble(3) === js)
  }

  test("cmhTest: single-stratum fixture reduces to the plain 2x2 with " +
      "continuity correction; hand-replayed E/V/OR") {
    val users = (1L to 40L)
    val conv = users.filter(_ % 3 == 0).toSet
    val ev = frame(
      "user_id" -> users.toSeq,
      "event_type" -> users.map(u =>
        if (conv(u)) "purchase" else "view").toSeq,
      "value" -> users.map(u => if (conv(u)) 200.0 else 10.0).toSeq,
      "ts_ns" -> users.map(_ => 86400L * 1000000000L * 100L).toSeq)
    val out = Experiments.cmhTest(ev, salt = "s").collect()(0)
    val treat = users.filter(u => refVariant(u, 2, "s") == 1).toSet
    val n11 = users.count(u => treat(u) && conv(u)).toLong
    val n10 = users.count(u => treat(u) && !conv(u)).toLong
    val n01 = users.count(u => !treat(u) && conv(u)).toLong
    val n00 = users.count(u => !treat(u) && !conv(u)).toLong
    val n = 40.0
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = r12((n11 + n10).toDouble * (n11 + n01) / n)
    val v = r12((n11 + n10).toDouble * (n01 + n00) * (n11 + n01)
      * (n10 + n00) / (n * n * (n - 1.0)))
    val g = math.max(math.abs(n11 - e) - 0.5, 0.0)
    assert(out.getLong(0) === 1L, "single stratum")
    assert(out.getLong(1) === n11)
    assert(out.getDouble(2) === BigDecimal(g * g / v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val orMh = r12(n11 * n00 / n) / r12(n10 * n01 / n)
    assert(out.getDouble(3) === BigDecimal(orMh)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("conformalCalibration: exact-rank qhat on the calibration half, " +
      "coverage audited on the test half") {
    // cal (even ids): values 10,20,30,40 -> mean 25, scores {15,5,5,15}
    // target = min(ceil(5*0.9), 4) = 4 -> qhat = 15
    // test (odd ids): values 24,26,45 -> scores {1,1,20} -> coverage 2/3
    val d = frame(
      "id" -> Seq(2L, 4L, 6L, 8L, 1L, 3L, 5L),
      "g" -> Seq("g", "g", "g", "g", "g", "g", "g"),
      "v" -> Seq(10L, 20L, 30L, 40L, 24L, 26L, 45L))
    val r = Stats.conformalCalibration(d, col("g"), col("v"), col("id"),
      alpha100 = 10).collect()(0)
    assert(r.getString(0) === "g")
    assert(r.getLong(1) === 4L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 25.0) // calibration mean (model center)
    assert(r.getDouble(4) === 15.0) // qhat
    assert(r.getDouble(5) === 0.666667)
    intercept[IllegalArgumentException] {
      Stats.conformalCalibration(d, col("g"), col("v"), col("id"),
        alpha100 = 0)
    }
  }

  test("ppsSample: JVM-replayed exact-integer inclusion, certainty " +
      "units always enter, HT estimate matches the hand formula") {
    def refU(id: Long, salt: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"pps:$salt:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    // weights 1..50 plus one dominating unit (id 99, w 1000): with
    // n = 10, certainty iff 10w >= W = 2275 -> only the big unit
    val ids = (1L to 50L) :+ 99L
    val ws = (1L to 50L) :+ 1000L
    val d = frame("id" -> ids.toSeq, "w" -> ws.toSeq)
    val out = graft.ops.Splits.ppsSample(d, "id", "w", n = 10L,
      salt = "t").collect()(0)
    val bigW = BigInt(2275)
    val incl = ids.zip(ws).filter { case (id, w) =>
      BigInt(w) * 10 >= bigW ||
        BigInt(refU(id, "t")) * bigW < BigInt(w) * 10 * BigInt(4294967296L)
    }
    val cert = ids.zip(ws).filter { case (_, w) => BigInt(w) * 10 >= bigW }
    assert(out.getLong(0) === 51L)
    assert(out.getLong(1) === cert.size.toLong)
    assert(cert.size === 1 && cert.head._1 === 99L,
      "the dominating unit must be the one certainty unit")
    assert(out.getLong(2) === incl.size.toLong)
    assert(out.getLong(3) === 2275L)
    val m = (incl.size - cert.size).toDouble
    val ht = 1000.0 + m * 2275.0 / 10.0
    assert(out.getDouble(4) === BigDecimal(ht)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getDouble(5) === BigDecimal((ht - 2275.0) / 2275.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // reproducible
    val again = graft.ops.Splits.ppsSample(d, "id", "w", n = 10L,
      salt = "t").collect()(0)
    assert(out.toSeq === again.toSeq)
  }

  test("dispersionAudit: constant counts -> VMR 0; planted burstiness " +
      "-> hand-computed VMR and overdispersion flag; degenerate NULLs") {
    // type 'flat': every user exactly 2 events -> variance 0, VMR 0
    // type 'burst': counts 1,1,1,9 -> mean 3, var (3*4+36)/3 = 16, VMR 16/3
    val ev = frame(
      "event_type" -> (Seq.fill(8)("flat") ++
        Seq("burst", "burst", "burst") ++ Seq.fill(9)("burst")),
      "user_id" -> (Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L) ++
        Seq(1L, 2L, 3L) ++ Seq.fill(9)(4L)))
    val out = Stats.dispersionAudit(ev).orderBy("event_type").collect()
    val burst = out(0); val flat = out(1)
    assert(flat.getString(0) === "flat" && flat.getLong(1) === 4L)
    assert(flat.getDouble(2) === 2.0 && flat.getDouble(3) === 0.0)
    assert(!flat.getBoolean(5))
    assert(burst.getLong(1) === 4L && burst.getDouble(2) === 3.0)
    val vmr = 16.0 / 3.0
    assert(burst.getDouble(3) === BigDecimal(vmr)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val z = math.sqrt(2.0 * (3.0 * vmr)) - math.sqrt(2.0 * 3.0 - 1.0)
    assert(burst.getDouble(4) === BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(burst.getBoolean(5) === (z > 3.0))
    // single-user type: NULL vmr/z, flag false
    val deg = Stats.dispersionAudit(
      frame("event_type" -> Seq("only"), "user_id" -> Seq(1L)))
      .collect()(0)
    assert(deg.isNullAt(3) && deg.isNullAt(4) && !deg.getBoolean(5))
  }

  test("wasserstein1Matrix: shifted-uniform hand values, identical " +
      "groups at 0, every pair agrees with the single-pair op, empty " +
      "group yields NULL") {
    // A = {0,10}, B = {5,15} (A shifted +5), C = copy of A
    val d = frame(
      "g" -> Seq("A", "A", "B", "B", "C", "C"),
      "v" -> Seq(0L, 10L, 5L, 15L, 0L, 10L))
    val m = Stats.wasserstein1Matrix(d, "g", col("v"),
      Seq("A", "B", "C")).orderBy("group_a", "group_b").collect()
    assert(m.length === 3)
    val byPair = m.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byPair(("A", "B")).getDouble(4) === 5.0)
    assert(byPair(("A", "C")).getDouble(4) === 0.0)
    assert(byPair(("B", "C")).getDouble(4) === 5.0)
    assert(m.forall(r => r.getLong(2) === 2L && r.getLong(3) === 2L))
    // cross-check against the single-pair implementation on a messier
    // fixture (ties, skewed sizes)
    val d2 = frame(
      "g" -> Seq("A", "A", "A", "B", "B", "C", "C", "C", "C"),
      "v" -> Seq(1L, 1L, 7L, 2L, 9L, 1L, 3L, 3L, 20L))
    val mm = Stats.wasserstein1Matrix(d2, "g", col("v"),
      Seq("A", "B", "C")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    for ((a, b) <- Seq(("A", "B"), ("A", "C"), ("B", "C"))) {
      val single = Stats.wasserstein1(d2, "g", col("v"), a, b)
        .collect()(0).getDouble(4)
      assert(mm((a, b)) === single, s"pair ($a,$b)")
    }
    // a listed group with no rows: NULL w1 on its pairs
    val sparse = Stats.wasserstein1Matrix(d, "g", col("v"),
      Seq("A", "B", "Z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(sparse(("A", "Z")).isNullAt(4))
    assert(sparse(("A", "B")).getDouble(4) === 5.0)
  }

  test("empty-input edges survive ANSI mode: goodTuring grid on an " +
      "empty corpus, retrieval metrics on an empty query frame") {
    val emptyDocs = frame("text" -> Seq("x")).filter(col("text") === "y")
    val gt = TextAnalysis.goodTuring(emptyDocs).orderBy("r").collect()
    assert(gt.length === 10) // the grid survives
    assert(gt.forall(r => r.getLong(1) === 0L && r.isNullAt(2) &&
      r.getLong(3) === 0L && r.getLong(4) === 0L && r.isNullAt(5)))
    val emb = frame("vec_id" -> Seq(0L, 1L, 2L),
      "embedding" -> Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.5, 0.5)))
    val noQ = emb.filter(col("vec_id") < 0)
    val rm = Similarity.retrievalMetrics(noQ, emb, k = 2,
      nCells = 2, nprobe = 2).collect()(0)
    assert(rm.getLong(0) === 0L && rm.isNullAt(2) && rm.isNullAt(3) &&
      rm.isNullAt(4))
    val rb = Similarity.rboAudit(noQ, emb, k = 2, nCells = 2,
      nprobe = 2).collect()(0)
    assert(rb.getLong(0) === 0L && rb.isNullAt(2))
  }

  test("groupSequentialAudit: JVM-replayed looks, cumulative pooled z, " +
      "pinned OBF boundaries, conservative-early ordering") {
    val users = (1L to 40L)
    val conv = users.filter(_ % 4 == 0).toSet
    val ev = frame(
      "user_id" -> users.toSeq,
      "event_type" -> users.map(u =>
        if (conv(u)) "purchase" else "view").toSeq,
      "value" -> users.map(u => if (conv(u)) 200.0 else 10.0).toSeq,
      "ts_ns" -> users.map(u => u * 1000000000L).toSeq) // arrival = id
    val out = Experiments.groupSequentialAudit(ev, salt = "s", looks = 5)
      .orderBy("look").collect()
    assert(out.length === 5)
    // JVM replay: rank = user id (entry == id); look = ceil(rank/8)
    for (k <- 1 to 5) {
      val cut = users.filter(_ <= k * 8L)
      val treat = cut.filter(u => refVariant(u, 2, "s") == 1)
      val ctrl = cut.filterNot(u => refVariant(u, 2, "s") == 1)
      val (nt, ct) = (treat.size, treat.count(conv))
      val (nc, cc) = (ctrl.size, ctrl.count(conv))
      val r = out(k - 1)
      assert(r.getLong(0) === k.toLong)
      assert(r.getLong(1) === (k * 8).toLong)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        === ((nt.toLong, ct.toLong, nc.toLong, cc.toLong)))
      if (nt > 0 && nc > 0) {
        val p = (ct + cc).toDouble / (nt + nc)
        val se = math.sqrt(p * (1.0 - p) * (1.0 / nt + 1.0 / nc))
        if (se != 0.0) {
          val z = BigDecimal((ct.toDouble / nt - cc.toDouble / nc) / se)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(r.getDouble(6) === z, s"z at look $k")
          assert(r.getBoolean(8) ===
            (math.abs(z) >= r.getDouble(7)), s"crossed at look $k")
        }
      }
    }
    // pinned boundaries, strictly decreasing (conservative early)
    val bs = out.map(_.getDouble(7)).toSeq
    assert(bs === Seq(4.562249, 3.225998, 2.634016, 2.281125, 2.0403))
    assert(bs === bs.sorted.reverse)
    intercept[IllegalArgumentException] {
      Experiments.groupSequentialAudit(ev, looks = 1)
    }
  }

  test("sampledQuantileAudit: JVM-replayed hash sample, exact rank " +
      "selections on both tables, rank error in rank space") {
    def refU(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"sq:t:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val n = 1000
    val d = frame("id" -> (1L to n.toLong).toSeq,
      "v" -> (1L to n.toLong).toSeq) // value == id == full rank
    val out = graft.ops.Sketches.sampledQuantileAudit(d, col("v"),
      col("id"), rate = 4, pcts = Seq(50, 90), salt = "t")
      .orderBy("pct").collect()
    val sampled = (1L to n.toLong).filter(refU(_) < (1L << 30)).sorted
    val m = sampled.length.toLong
    assert(out.length === 2)
    for (r <- out) {
      val pct = r.getLong(0)
      val tf = (pct * n + 99) / 100
      val ts = math.max((pct * m + 99) / 100, 1L)
      assert(r.getLong(1) === n.toLong && r.getLong(2) === m)
      assert(r.getLong(4) === tf, "exact quantile of 1..n is its rank")
      val est = sampled((ts - 1).toInt)
      assert(r.getLong(3) === est, s"sample quantile at pct $pct")
      assert(r.getLong(5) === math.abs(est - tf))
      assert(r.getDouble(6) === BigDecimal(
        math.abs(est - tf).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // a reasonable 1/4 sample of 1000 uniform values should land the
    // median within a few percent of rank space
    assert(out(0).getDouble(6) < 0.1, s"median rank err ${out(0)}")
  }

  test("retrieval pinned constants: nDCG discounts and RBO weights " +
      "match hand values; RBO weights sum to the perfect score 1") {
    val d = Similarity.ndcgDiscounts(3)
    assert(d.map(_.toString) === Seq("1.000000000000",
      "0.630929753571", "0.500000000000"))
    val w = Similarity.rboWeights(2)
    // norm = 0.1/0.19; F(1) = norm*(1 + 0.45); F(2) = norm*0.45
    assert(w.map(_.toString) === Seq("0.763157894737", "0.236842105263"))
    assert(w.sum === BigDecimal("1.000000000000"))
    assert(Similarity.rboWeights(5).sum.setScale(6,
      BigDecimal.RoundingMode.HALF_UP) === BigDecimal("1.000000"))
  }

  test("retrievalMetrics + rboAudit: probing every cell makes IVF equal " +
      "brute force -> all metrics exactly 1; starving probes degrades " +
      "them into (0, 1)") {
    val vecs = Seq(
      Seq(1.0, 0.0), Seq(0.0, 1.0), // ids 0/1 double as centroids
      Seq(0.99, 0.1), Seq(0.1, 0.99),
      Seq(0.95, 0.05), Seq(0.05, 0.95),
      Seq(0.9, 0.2), Seq(0.2, 0.9))
    val emb = frame("vec_id" -> (0L to 7L).toSeq, "embedding" -> vecs)
    val qs = emb.filter(col("vec_id") < 2)
    val full = Similarity.retrievalMetrics(qs, emb, k = 3,
      nCells = 2, nprobe = 2).collect()(0)
    assert(full.getLong(0) === 2L && full.getLong(1) === 3L)
    assert(full.getDouble(2) === 1.0 && full.getDouble(3) === 1.0 &&
      full.getDouble(4) === 1.0)
    val rboFull = Similarity.rboAudit(qs, emb, k = 3,
      nCells = 2, nprobe = 2).collect()(0)
    assert(rboFull.getDouble(2) === 1.0 && rboFull.getDouble(3) === 1.0)
    // nprobe = 1: each query only sees its own cell; cross-cell true
    // neighbors (every list has 3 slots but only ~3 same-cell mates,
    // with ranks shifted) degrade the metrics without zeroing them
    val starved = Similarity.retrievalMetrics(qs, emb, k = 4,
      nCells = 2, nprobe = 1).collect()(0)
    assert(starved.getDouble(2) < 1.0 && starved.getDouble(2) > 0.0,
      s"recall ${starved.getDouble(2)}")
    assert(starved.getDouble(4) < 1.0 && starved.getDouble(4) > 0.0)
    val rboStarved = Similarity.rboAudit(qs, emb, k = 4,
      nCells = 2, nprobe = 1).collect()(0)
    assert(rboStarved.getDouble(2) < 1.0 && rboStarved.getDouble(2) > 0.0)
  }
}
