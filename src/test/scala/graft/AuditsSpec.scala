package graft

import graft.ops.{EventAnalytics, Graphs, Integrity, Profiling, Sketches,
  Skew, Stats, Survival, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the x153-x160 surface: Kaplan-Meier
  * survival, MAD robust outliers, l-diversity, triangle census, key-skew
  * Gini audit, Benford digits, one-pass profiling, inverted index.
  */
class AuditsSpec extends SparkSuite {

  private def dayNs(n: Long): Long = n * 86400L * 1000000000L

  test("kaplanMeier: hand-computed KM curve with censoring") {
    // max day = 100, censorDays = 7 -> churned iff last_day <= 93
    // (user, first, last): A(0,10) B(5,15) C(0,20) D(90,100) E(98,100)
    // lifetimes: A t=10 churn, B t=10 churn, C t=20 churn,
    //            D t=10 censored, E t=2 censored
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L),
      "ts_ns" -> Seq(dayNs(0), dayNs(10), dayNs(5), dayNs(15),
        dayNs(0), dayNs(20), dayNs(90), dayNs(100), dayNs(98), dayNs(100)))
    val out = Survival.kaplanMeier(ev, censorDays = 7)
      .orderBy("t_days").collect()
    // t=2: n_risk 5, d 0, c 1, S = 1.0
    // t=10: n_risk 4, d 2, c 1, S = 1 * (1 - 2/4) = 0.5
    // t=20: n_risk 1, d 1, c 0, S = 0.5 * 0 = 0.0
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq === Seq(
      (2L, 5L, 0L, 1L, 1.0),
      (10L, 4L, 2L, 1L, 0.5),
      (20L, 1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: all users censored keeps survival at 1") {
    // every user's last day is the corpus max day -> nobody churns
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 2L),
      "ts_ns" -> Seq(dayNs(0), dayNs(50), dayNs(30), dayNs(50)))
    val out = Survival.kaplanMeier(ev, censorDays = 7)
      .orderBy("t_days").collect()
    assert(out.forall(_.getDouble(4) === 1.0))
    assert(out.map(_.getLong(2)).sum === 0L) // n_churned
  }

  test("logRank: hand-computed two-cohort statistic") {
    // max day 100, censorDays 7 -> churned iff last <= 93; A = even id
    // A: u2 t=10 churn, u4 t=20 churn, u6 t=2 censored   (n_a = 3)
    // B: u1 t=10 churn, u3 t=10 churn, u5 t=10 censored  (n_b = 3)
    // at-risk (desc-cum counts): A t=2:3 t=10:2 t=20:1; B t=10:3
    // t=10: da=1 d=3 na=2 n=5 -> E=2*3/5=1.2  V=3*2*3*2/(25*4)=0.36
    // t=20: da=1 d=1 na=1 n=1 -> E=1.0        V=0 (n<2)
    // O=2, E=2.2, V=0.36 -> chi2 = (2-2.2)^2/0.36 = 0.111111
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L, 6L, 6L),
      "ts_ns" -> Seq(dayNs(0), dayNs(10), dayNs(0), dayNs(10),
        dayNs(5), dayNs(15), dayNs(0), dayNs(20),
        dayNs(90), dayNs(100), dayNs(98), dayNs(100)))
    val out = Survival.logRank(ev, pmod(col("user_id"), lit(2)) === 0,
      censorDays = 7).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 2L)))
    assert(r.getDouble(3) === 2.2)
    assert(r.getDouble(4) === 0.111111)
  }

  test("logRank: single-cohort input yields NULL chi2 (zero variance)") {
    val ev = frame(
      "user_id" -> Seq(2L, 2L, 4L, 4L),
      "ts_ns" -> Seq(dayNs(0), dayNs(10), dayNs(0), dayNs(50)))
    val r = Survival.logRank(ev, lit(true), censorDays = 7).collect()(0)
    // everyone in A: O = E exactly, V = 0 -> chi2 NULL
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
    assert(r.getLong(2).toDouble === r.getDouble(3)) // o_a == e_a
    assert(r.isNullAt(4))
  }

  test("madOutliers: planted extreme flagged; constant group has zero " +
      "outliers at MAD 0") {
    val df = frame(
      "g" -> (Seq.fill(10)("a") ++ Seq.fill(4)("b")),
      "v" -> (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0) ++
        Seq(7.0, 7.0, 7.0, 7.0)))
    val out = Stats.madOutliers(df, "g", "v").orderBy("g").collect()
    val a = out(0)
    // median of 1..9,1000 = 5.5; MAD = median of devs = 2.5;
    // |v-5.5|*0.6745 > 8.75 <=> |v-5.5| > 12.97 -> only 1000
    assert(a.getLong(1) === 10L && a.getDouble(2) === 5.5 &&
      a.getDouble(3) === 2.5 && a.getLong(4) === 1L &&
      a.getDouble(5) === 0.1)
    val b = out(1)
    // constant group: MAD 0, zero deviation -> zero outliers
    assert(b.getDouble(2) === 7.0 && b.getDouble(3) === 0.0 &&
      b.getLong(4) === 0L)
  }

  test("lDiversity: group with one sensitive value fails, mixed group " +
      "passes") {
    val df = frame(
      "g" -> Seq("g1", "g1", "g1", "g2", "g2", "g2"),
      "s" -> Seq(1L, 1L, 2L, 3L, 3L, 3L))
    val r = Integrity.lDiversity(df, Seq("g"), "s", l = 2).collect()(0)
    assert(r.getLong(0) === 2L)      // l
    assert(r.getLong(1) === 6L)      // n_rows
    assert(r.getLong(2) === 2L)      // n_groups
    assert(r.getLong(3) === 1L)      // min_diversity (g2)
    assert(r.getLong(4) === 1L)      // n_failing
    assert(r.getLong(5) === 3L)      // n_rows_failing
    assert(r.getDouble(6) === 0.5)   // failing_rate
  }

  test("triangleStats: one closed triangle plus a tail; open square has " +
      "zero") {
    val tri = frame(
      "part_a" -> Seq(1L, 1L, 2L, 3L),
      "part_b" -> Seq(2L, 3L, 3L, 4L))
    val r = Graphs.triangleStats(tri).collect()(0)
    // deg: 1->2, 2->2, 3->3, 4->1; wedges = 1+1+3+0 = 5; triangles = 1
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L &&
      r.getLong(2) === 5L && r.getLong(3) === 1L)
    assert(r.getDouble(4) === 0.6) // 3*1/5
    val square = frame(
      "part_a" -> Seq(1L, 2L, 3L, 1L),
      "part_b" -> Seq(2L, 3L, 4L, 4L))
    val rs = Graphs.triangleStats(square).collect()(0)
    assert(rs.getLong(3) === 0L && rs.getDouble(4) === 0.0)
  }

  test("keySkewAudit: hand-computed Gini, hot key, top share") {
    val df = frame("k" -> Seq("a", "a", "a", "b", "c"))
    val r = Skew.keySkewAudit(df, "k").collect()(0)
    // freq a:3 b:1 c:1; positions asc (n, key): b=1, c=2, a=3
    // gini = (2*(1+2+9) - 4*5) / (3*5) = 4/15
    assert(r.getString(0) === "k")
    assert(r.getLong(1) === 5L && r.getLong(2) === 3L && r.getLong(3) === 3L)
    assert(r.getString(4) === "a")
    assert(r.getDouble(5) === 0.6)
    assert(r.getDouble(6) === BigDecimal(4.0 / 15.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // uniform keys -> gini 0
    val uni = Skew.keySkewAudit(frame("k" -> Seq("x", "y", "z")), "k")
      .collect()(0)
    assert(uni.getDouble(6) === 0.0)
  }

  test("benford: digits from exact cents; non-positive rows excluded") {
    val df = frame("v" ->
      Seq(1.0, 19.99, 2.5, 0.05, 30.0, -5.0, 0.0))
    val out = Profiling.benford(df, "v").orderBy("digit").collect()
    // digits: 1.0->1, 19.99->1, 2.5->2, 0.05->5, 30.0->3 (neg/zero out)
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 2L), (2, 1L), (3, 1L), (5, 1L)))
    val d1 = out(0)
    assert(d1.getDouble(2) === 0.4) // share 2/5
    assert(d1.getDouble(3) === 0.30103) // log10(2) @ 6dp
    assert(d1.getDouble(4) === BigDecimal(0.4 - 0.30103)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("profile: nulls, distincts, numeric min/max; strings get NULL " +
      "min/max") {
    val df = frame(
      "x" -> Seq[Any](1L, 2L, 2L, null),
      "s" -> Seq[Any]("p", "q", null, null))
    val out = Profiling.profile(df, Seq("x", "s"))
      .orderBy("col_name").collect()
    val s = out(0); val x = out(1)
    assert(s.getString(0) === "s" && s.getLong(1) === 4L &&
      s.getLong(2) === 2L && s.getLong(3) === 2L &&
      s.isNullAt(4) && s.isNullAt(5))
    assert(x.getString(0) === "x" && x.getLong(2) === 1L &&
      x.getLong(3) === 2L && x.getDouble(4) === 1.0 &&
      x.getDouble(5) === 2.0)
  }

  test("invertedIndex: df/total_tf exact, postings ascending and capped, " +
      "minDf filters singletons") {
    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L),
      "text" -> Seq("a b a z", "a c", "b c c"))
    val out = TextAnalysis.invertedIndex(docs, maxPostings = 1, minDf = 2)
      .orderBy("tok").collect()
    // z (df 1) filtered; postings capped at the FIRST doc id
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq === Seq(
      ("a", 2L, 3L, "1"), ("b", 2L, 2L, "1"), ("c", 2L, 3L, "2")))
    val full = TextAnalysis.invertedIndex(docs, maxPostings = 16, minDf = 2)
      .orderBy("tok").collect()
    assert(full.map(_.getString(3)).toSeq === Seq("1,2", "1,3", "2,3"))
  }

  test("timeDecayAttribution: dyadic day-gap credits, lag window cut") {
    // conversion at day 10; touches at gaps 0, 1, 6 days (weights 1,
    // 0.5, 0.015625) and one at 8 days — outside the 7-day lag
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 1L, 1L),
      "event_type" -> Seq("purchase", "view", "click", "view", "click"),
      "ts_ns" -> Seq(dayNs(10), dayNs(10), dayNs(9), dayNs(4), dayNs(2)))
    val out = EventAnalytics.timeDecayAttribution(ev)
      .orderBy("channel").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq === Seq(("click", 1L, 0.5), ("view", 2L, 1.015625)))
    val total = 1.515625
    assert(out(0).getDouble(3) === BigDecimal(0.5 / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1).getDouble(3) === BigDecimal(1.015625 / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("scd2History: consecutive equal values collapse; intervals chain; " +
      "last is current") {
    val df = frame(
      "k" -> Seq(1L, 1L, 1L, 1L),
      "attr" -> Seq("A", "A", "B", "A"),
      "ts" -> Seq(100L, 200L, 300L, 400L),
      "id" -> Seq(1L, 2L, 3L, 4L))
    val out = EventAnalytics.scd2History(df, "k", "attr", "ts", "id")
      .orderBy("valid_from").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq ===
      Seq(("A", 100L, 300L, false), ("B", 300L, 400L, false),
        ("A", 400L, -1L, true)))
  }

  test("hllReport: matches a JVM reference of the identical register " +
      "algorithm; estimate within 20% on a real corpus slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = Sketches.hllReport(docs, p = 10).collect()(0)
    // JVM reference: same 32-bit md5 prefix hash, same registers
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = docs.select(explode(split(col("text"), " ")))
      .distinct().collect().map(_.getString(0))
    val regs = new Array[Int](1024)
    for (t <- toks) {
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(8)
      val v = java.lang.Long.parseLong(hex, 16)
      val bucket = (v >> 22).toInt
      val rest = v & ((1L << 22) - 1)
      val rho = if (rest == 0) 23
        else 23 - java.lang.Long.toBinaryString(rest).length
      regs(bucket) = math.max(regs(bucket), rho)
    }
    val num = regs.map(mj => 1L << (23 - mj)).sum
    val raw = 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 *
      (1L << 23).toDouble / num.toDouble
    val zeros = regs.count(_ == 0)
    val est = if (zeros > 0 && raw <= 2560.0)
      1024.0 * math.log(1024.0 / zeros) else raw
    assert(r.getLong(3) === toks.length.toLong) // n_exact
    assert(r.getDouble(4) === BigDecimal(est)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(r.getDouble(5)) < 0.2,
      s"HLL rel_err ${r.getDouble(5)} out of band")
  }

  test("ksTest: identical samples d=0, disjoint d=1, half-shifted d=0.5") {
    def ks(a: Seq[Double], b: Seq[Double]) = Stats.ksTest(
      frame("g" -> (a.map(_ => "A") ++ b.map(_ => "B")),
        "v" -> (a ++ b)), "g", "v", "A", "B").collect()(0)
    assert(ks(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)).getDouble(4) === 0.0)
    assert(ks(Seq(1.0, 2.0), Seq(10.0, 11.0)).getDouble(4) === 1.0)
    // a={1,2}, b={2,3}: sup|F_a-F_b| at v=1 is |1/2-0| = 0.5
    val r = ks(Seq(1.0, 2.0), Seq(2.0, 3.0))
    assert(r.getDouble(4) === 0.5)
    assert(r.getDouble(5) === BigDecimal(1.358 * math.sqrt(4.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("chiSquare: exact independence scores 0; planted dependence and " +
      "an ABSENT cell contribute expected mass") {
    def cat(pairs: Seq[(String, String)]) = frame(
      "a" -> pairs.map(_._1), "b" -> pairs.map(_._2))
    // O = [[1,2],[3,6]] is exactly independent (E == O)
    val ind = cat(
      Seq.fill(1)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
        Seq.fill(3)(("y", "u")) ++ Seq.fill(6)(("y", "v")))
    assert(Stats.chiSquare(ind, "a", "b").collect()(0).getDouble(4) === 0.0)
    // diagonal [[10,0],[0,10]] -> chi2 = N = 20, dof 1; the two zero
    // cells exist only in the GRID, not in the observed groupBy
    val dep = cat(Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v")))
    val d = Stats.chiSquare(dep, "a", "b").collect()(0)
    assert(d.getLong(0) === 20L && d.getLong(3) === 1L &&
      d.getDouble(4) === 20.0)
    // hand-computed 2x2 with one absent cell: chi2 = 3.75 exactly
    val part = cat(Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("x", "v")) ++
      Seq.fill(5)(("y", "u")))
    assert(Stats.chiSquare(part, "a", "b").collect()(0).getDouble(4) === 3.75)
  }

  test("itemCosine: hand-computed cosine, minSupport cut") {
    // baskets o1{1,2} o2{1,2} o3{1,3}: pair (1,2) co-occurs 2x,
    // item counts 1->3, 2->2; cosine = 2/sqrt(6); (1,3) cut at support 2
    val li = frame(
      "l_orderkey" -> Seq(1L, 1L, 2L, 2L, 3L, 3L),
      "l_partkey" -> Seq(1L, 2L, 1L, 2L, 1L, 3L))
    val out = graft.ops.Baskets.itemCosine(li, minSupport = 2).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 2L &&
      out(0).getLong(2) === 2L)
    assert(out(0).getDouble(3) === BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ewmaBacktest: hand-computed MAE/MAPE over consecutive days") {
    // type a: day counts 4, 2, 3 -> ewma 2, 2, 2.5; backtest pairs
    // (f=2, act=2) err 0 and (f=2, act=3) err 1, ape 1/3
    val rows = Seq.fill(4)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(3)(2L)
    val ev = frame(
      "event_type" -> rows.map(_ => "a"),
      "ts_ns" -> rows.zipWithIndex.map { case (d, i) => dayNs(d) + i })
    val r = EventAnalytics.ewmaBacktest(ev, windowDays = 5).collect()(0)
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5) // (0 + 1) / 2
    assert(r.getDouble(3) === BigDecimal(0.333333 / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("variantCi: Wilson bounds match the closed form; p=0.5 centers " +
      "exactly") {
    // nVariants=1 puts all 4 users in variant 0; users 1,2 convert
    val ev = frame(
      "user_id" -> Seq(1L, 2L, 3L, 4L),
      "event_type" -> Seq("purchase", "purchase", "purchase", "view"),
      "value" -> Seq(200.0, 200.0, 100.0, 500.0))
    val r = graft.ops.Experiments.variantCi(ev, nVariants = 1, salt = "s")
      .collect()(0)
    assert(r.getLong(0) === 0L && r.getLong(1) === 4L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 0.5)
    val (p, n) = (0.5, 4.0)
    val z2 = 1.96 * 1.96
    val denom = 1.0 + z2 / n
    val center = (p + z2 / (2.0 * n)) / denom
    val half = 1.96 * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === r6(center - half))
    assert(r.getDouble(5) === r6(center + half))
    assert(r6(center) === 0.5) // Wilson centers p=0.5 exactly
  }

  test("markovTransitions: journeys truncate at the first conversion; " +
      "touch-free converters go start->conv") {
    // u1: view -> purchase -> click (click AFTER conv is ignored)
    // u2: view (no conv) ; u3: purchase only
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 2L, 3L),
      "event_type" -> Seq("view", "purchase", "click", "view", "purchase"),
      "ts_ns" -> Seq(1L, 2L, 3L, 1L, 1L),
      "event_id" -> Seq(1L, 2L, 3L, 4L, 5L))
    val got = EventAnalytics.markovTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("__start__", "view") -> 2L,
      ("view", "__conv__") -> 1L,
      ("view", "__null__") -> 1L,
      ("__start__", "__conv__") -> 1L))
  }

  test("removalEffectAttribution: hand-iterated two-channel chain") {
    // start->view x2 (one converts, one drops), start->click x1
    // (converts): V = floor((2*500000 + 1000000)/3) = 666666; removing
    // either channel leaves V_c = 333333 -> removal effect 0.5 for both
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 3L, 3L),
      "event_type" -> Seq("view", "purchase", "view", "click", "purchase"),
      "ts_ns" -> Seq(1L, 2L, 1L, 1L, 2L),
      "event_id" -> Seq(1L, 2L, 3L, 4L, 5L))
    val out = EventAnalytics.removalEffectAttribution(ev)
      .orderBy("channel").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("click", "view"))
    for (r <- out) {
      assert(r.getDouble(1) === 0.666666) // floor fixed-point
      assert(r.getDouble(2) === 0.333333)
      assert(r.getDouble(3) === 0.5)
    }
  }

  test("removalEffectAttribution: no conversions yields NULL removal " +
      "effects, zero probabilities") {
    val ev = frame(
      "user_id" -> Seq(1L, 2L),
      "event_type" -> Seq("view", "click"),
      "ts_ns" -> Seq(1L, 2L),
      "event_id" -> Seq(1L, 2L))
    val out = EventAnalytics.removalEffectAttribution(ev).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(1) === 0.0 && r.isNullAt(3)))
  }

  test("containment: subset doc scores 1.0 on its side, Jaccard-diluted " +
      "pair still flagged") {
    val docs = frame(
      "doc_id" -> Seq(1L, 2L),
      "text" -> Seq("a b c d", "a b"))
    val pairs = frame("id_a" -> Seq(1L), "id_b" -> Seq(2L))
    val r = graft.ops.Dedup.containment(docs, pairs).collect()(0)
    assert(r.getLong(2) === 2L)
    assert(r.getDouble(3) === 0.5)  // |A∩B|/|A|
    assert(r.getDouble(4) === 1.0)  // B fully inside A
    assert(r.getDouble(5) === 1.0)
  }

  test("charsetProfile: hand-counted shares; empty-text group yields " +
      "NULL shares") {
    val docs = frame(
      "lang" -> Seq("en", "en", "xx"),
      "text" -> Seq("ab 12!", "zz", ""))
    val out = TextAnalysis.charsetProfile(docs).orderBy("lang").collect()
    val en = out(0)
    // en: 8 chars, 4 letters, 2 digits, 1 space, 1 other
    assert(en.getLong(1) === 2L && en.getLong(2) === 8L)
    assert(en.getDouble(3) === 0.5 && en.getDouble(4) === 0.25 &&
      en.getDouble(5) === 0.125 && en.getDouble(6) === 0.125)
    val xx = out(1)
    assert(xx.getLong(2) === 0L && xx.isNullAt(3) && xx.isNullAt(6))
  }
}
