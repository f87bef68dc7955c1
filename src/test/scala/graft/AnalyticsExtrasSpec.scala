package graft

import graft.ops.{Baskets, CustomerAnalytics, EventAnalytics, Experiments,
  Integrity, Layout, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the x131-x137 surface: A/B readouts,
  * basket pairs, z-order layout, EWMA smoothing, BM25, winsorized stats,
  * calibration bins.
  */
class AnalyticsExtrasSpec extends SparkSuite {

  private def sec(n: Long): Long = n * 1000000000L
  private def day(n: Long): Long = n * 86400L * 1000000000L

  /** JVM reference of Experiments' md5 variant assignment. */
  private def refVariant(userId: Long, n: Int, salt: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$salt:$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % n).toInt
  }

  test("abTest: JVM-reference variants, exact counts, pooled z formula") {
    // 12 users; conversion = purchase with value >= 150
    val users = (1L to 12L)
    val ev = frame(
      "user_id" -> (users ++ users).toSeq,
      "event_type" -> (users.map(_ => "view") ++
        users.map(u => if (u % 2 == 0) "purchase" else "view")).toSeq,
      "value" -> (users.map(_ => 10.0) ++
        users.map(u => if (u % 4 == 0) 200.0 else 100.0)).toSeq)
    val out = Experiments.abTest(ev, nVariants = 2, salt = "s")
      .orderBy("variant").collect()
    // reference: converted users are u % 4 == 0 AND the event is a purchase
    // (u % 2 == 0), i.e. u in {4, 8, 12}
    val byVariant = users.groupBy(u => refVariant(u, 2, "s"))
    val conv = users.filter(u => u % 4 == 0).groupBy(u => refVariant(u, 2, "s"))
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    for (r <- out) {
      val v = r.getLong(0).toInt
      assert(r.getLong(1) === byVariant(v).size.toLong, s"n_users v$v")
      assert(r.getLong(2) === conv.getOrElse(v, Seq()).size.toLong, s"n_conv v$v")
    }
    // z for the treatment row, recomputed with the documented formula
    val (n0, c0) = (byVariant(0).size.toDouble, conv.getOrElse(0, Seq()).size.toDouble)
    val (n1, c1) = (byVariant(1).size.toDouble, conv.getOrElse(1, Seq()).size.toDouble)
    val p = (c0 + c1) / (n0 + n1)
    val z = (c1 / n1 - c0 / n0) /
      math.sqrt(p * (1.0 - p) * (1.0 / n0 + 1.0 / n1))
    assert(out(0).isNullAt(4) && out(0).isNullAt(5)) // control: NULL lift/z
    assert(out(1).getDouble(5) === BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("withVariant: a salt containing a single quote assigns the same " +
      "variants as the JVM reference (typed API, no SQL splicing)") {
    val salt = "it's-q4'23"
    val ev = frame("user_id" -> (1L to 40L).toSeq)
    val out = Experiments.withVariant(ev, "user_id", 3, salt)
      .orderBy("user_id").collect()
    for (r <- out)
      assert(r.getLong(1) === refVariant(r.getLong(0), 3, salt).toLong,
        s"variant mismatch for user ${r.getLong(0)}")
    assert(out.map(_.getLong(1)).toSet.size > 1, "degenerate assignment")
  }

  test("abTest: saturated pooled rate yields NULL z, not a crash") {
    // every user converts -> pooled p = 1 -> zero standard error
    val ev = frame(
      "user_id" -> Seq(1L, 2L, 3L, 4L),
      "event_type" -> Seq("purchase", "purchase", "purchase", "purchase"),
      "value" -> Seq(500.0, 500.0, 500.0, 500.0))
    val out = Experiments.abTest(ev, nVariants = 2, salt = "s")
      .orderBy("variant").collect()
    assert(out.forall(r => r.getDouble(3) === 1.0)) // rate
    assert(out.filter(_.getLong(0) != 0L).forall(_.isNullAt(5))) // z NULL
  }

  test("pairLift: per-basket pairs, distinct lines, support and lift") {
    // o1 {1,2,3}, o2 {1,2} (part 1 twice -> counted once), o3 {2,3}, o4 {1}
    val li = frame(
      "l_orderkey" -> Seq(1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 4L),
      "l_partkey" -> Seq(1L, 2L, 3L, 1L, 1L, 2L, 2L, 3L, 1L))
    val out = Baskets.pairLift(li, minSupport = 2)
      .orderBy("part_a", "part_b").collect()
    assert(out.length === 2)
    val p12 = out(0)
    assert((p12.getLong(0), p12.getLong(1), p12.getLong(2)) === ((1L, 2L, 2L)))
    assert(p12.getDouble(3) === 0.5) // 2 of 4 orders
    assert(p12.getDouble(4) === BigDecimal(2.0 * 4 / (3 * 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val p23 = out(1)
    assert((p23.getLong(0), p23.getLong(1), p23.getLong(2)) === ((2L, 3L, 2L)))
    assert(p23.getDouble(4) === BigDecimal(2.0 * 4 / (3 * 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("zOrderStats: a 4x4 grid under 2-bit z-order buckets into exact " +
      "quadrants (the locality a single-column sort cannot give)") {
    val pts = for { x <- 0 to 3; y <- 0 to 3 } yield (x.toLong, y.toLong)
    val df = frame("x" -> pts.map(_._1), "y" -> pts.map(_._2))
    val out = Layout.zOrderStats(df, "x", "y", bits = 2, bucketShift = 2)
      .orderBy("bucket").collect()
    assert(out.length === 4)
    for (r <- out) {
      assert(r.getLong(1) === 4L) // 4 points per quadrant
      assert(r.getLong(3) - r.getLong(2) === 1L) // x span within quadrant
      assert(r.getLong(5) - r.getLong(4) === 1L) // y span within quadrant
    }
    // quadrant 0 is the (x<2, y<2) corner
    assert(out(0).getLong(2) === 0L && out(0).getLong(3) === 1L)
    assert(out(0).getLong(4) === 0L && out(0).getLong(5) === 1L)
  }

  test("ewmaDaily: exact dyadic smoothing, window cut, per-type isolation") {
    // type A: day0 cnt2, day1 cnt4, day2 cnt1; type B: day1 cnt8
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L),
      "event_type" -> (Seq.fill(2)("A") ++ Seq.fill(4)("A") ++ Seq("A") ++
        Seq.fill(8)("B")),
      "ts_ns" -> (Seq(day(0) + 1, day(0) + 2) ++
        (1L to 4L).map(i => day(1) + i) ++ Seq(day(2) + 1) ++
        (1L to 8L).map(i => day(1) + i)))
    val out = EventAnalytics.ewmaDaily(ev, windowDays = 2)
      .orderBy("event_type", "day").collect()
    val rows = out.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(("A", 0L)) === ((2L, 0.5 * 2.0)))
    assert(rows(("A", 1L)) === ((4L, 0.5 * (4.0 + 2.0 / 2)))) // 2.5
    // windowDays=2: day0's count falls OUT of day2's window
    assert(rows(("A", 2L)) === ((1L, 0.5 * (1.0 + 4.0 / 2)))) // 1.5
    assert(rows(("B", 1L)) === ((8L, 4.0))) // B unaffected by A
  }

  test("holtDaily: hand-computed level/trend; gaps skipped; single-day " +
      "type has zero trend") {
    // A: day0 cnt2, day1 cnt4, day2 cnt1:
    //   l1=2 b1=0; l2=.5*4+.5*2=3 b2=.5*(3-2)=0.5;
    //   l3=.5*1+.5*3.5=2.25 b3=.5*(2.25-3)+.25=-0.125
    // B: one day cnt8 -> level 8, trend 0
    // C: days 0 and 5 (gap), cnt1 each -> folds as consecutive days
    val ev = frame(
      "user_id" -> Seq.fill(17)(1L),
      "event_type" -> (Seq.fill(2)("A") ++ Seq.fill(4)("A") ++ Seq("A") ++
        Seq.fill(8)("B") ++ Seq("C", "C")),
      "ts_ns" -> (Seq(day(0) + 1, day(0) + 2) ++
        (1L to 4L).map(i => day(1) + i) ++ Seq(day(2) + 1) ++
        (1L to 8L).map(i => day(1) + i) ++ Seq(day(0) + 3, day(5) + 3)))
    val out = EventAnalytics.holtDaily(ev).orderBy("event_type").collect()
    val rows = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("A") === ((3L, 2.25, -0.125, 2.125)))
    assert(rows("B") === ((1L, 8.0, 0.0, 8.0)))
    // C: cnt1 then cnt1 -> l=.5*1+.5*1=1 b=0 forecast 1 (gap irrelevant)
    assert(rows("C") === ((2L, 1.0, 0.0, 1.0)))
  }

  test("cusumDaily: hand-computed dyadic case; reference fold on an " +
      "alarm-positive shift series") {
    // A: counts [1,1,5,5] on days 0-3. n=4 S=12 Q=52; mu=3;
    // sigma = sqrt((52-36)/4) = 2 (exact); kappa=1 h=8; muk=4 mku=2.
    // d0 y1: sp=0 sn=1; d1: sn=2; d2 y5: sp=1 sn=0 (2+2-5<0), max@2;
    // d3: sp=2 max@3. No alarms (2 < 8).
    val evA = frame(
      "user_id" -> Seq.fill(12)(1L),
      "event_type" -> Seq.fill(12)("A"),
      "ts_ns" -> (Seq(day(0) + 1, day(1) + 1) ++
        (1L to 5L).map(i => day(2) + i) ++ (1L to 5L).map(i => day(3) + i)))
    val a = EventAnalytics.cusumDaily(evA).collect()(0)
    assert(a.getLong(1) === 4L)
    assert(a.getDouble(2) === 3.0 && a.getDouble(3) === 2.0)
    assert(a.getDouble(4) === 2.0 && a.getDouble(5) === 0.0) // sp/sn end
    assert(a.getDouble(6) === 2.0 && a.getLong(7) === 3L)    // max @ day 3
    assert(a.getLong(8) === 0L)
    // B: a sustained level shift — 16 days at 1 then 16 at 3 — MUST
    // alarm; checked against an independent JVM fold of the same rule
    val counts = Seq.fill(16)(1) ++ Seq.fill(16)(3)
    val evB = frame(
      "user_id" -> counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(1L) },
      "event_type" -> Seq.fill(counts.sum)("B"),
      "ts_ns" -> counts.zipWithIndex.flatMap { case (c, d) =>
        (1L to c.toLong).map(i => day(d.toLong) + i) })
    val b = EventAnalytics.cusumDaily(evB).collect()(0)
    val n = counts.length
    val s = counts.sum.toDouble
    val q = counts.map(c => c * c).sum.toDouble
    val mu = s / n
    val sigma = math.sqrt(math.max(0.0, (q - s * s / n) / n))
    var (sp, sn, spMax, alarms) = (0.0, 0.0, 0.0, 0L)
    var tMax = -1L
    for ((c, d) <- counts.zipWithIndex) {
      sp = math.max(0.0, sp + (c - (mu + sigma / 2)))
      sn = math.max(0.0, sn + ((mu - sigma / 2) - c))
      if (sp > spMax) { spMax = sp; tMax = d.toLong }
      if (sp > 4 * sigma || sn > 4 * sigma) alarms += 1
    }
    assert(alarms > 0) // the fixture genuinely alarms
    assert(b.getLong(1) === n.toLong)
    assert(b.getDouble(2) === mu && b.getDouble(3) === sigma)
    assert(b.getDouble(4) === sp && b.getDouble(5) === sn)
    assert(b.getDouble(6) === spMax && b.getLong(7) === tMax)
    assert(b.getLong(8) === alarms)
  }

  test("dowProfile: planted weekly peak gets index > 1, off-days < 1") {
    // 14 days, cnt 1 except days 3 and 10 (same dow) with cnt 4:
    // dow 3: n=2 total=8 mean=4 index=8*14/(2*20)=2.8; others 0.7
    val counts = (0 until 14).map(d => if (d % 7 == 3) 4 else 1)
    val ev = frame(
      "user_id" -> counts.zipWithIndex.flatMap { case (c, _) =>
        Seq.fill(c)(1L) },
      "event_type" -> Seq.fill(counts.sum)("A"),
      "ts_ns" -> counts.zipWithIndex.flatMap { case (c, d) =>
        (1L to c.toLong).map(i => day(d.toLong) + i) })
    val out = EventAnalytics.dowProfile(ev).orderBy("dow").collect()
    assert(out.length === 7)
    val atPeak = out(3)
    assert(atPeak.getLong(2) === 2L && atPeak.getLong(3) === 8L)
    assert(atPeak.getDouble(4) === 4.0)
    assert(atPeak.getDouble(5) === 112.0 / 40.0)
    for (r <- out if r.getLong(1) != 3L)
      assert(r.getDouble(5) === 28.0 / 40.0)
  }

  test("acfDaily: zero-filled gap, exact integer-ratio lags, no row " +
      "past the overlap") {
    // days 0 and 2 with cnt 2 each; day 1 absent -> y = [2,0,2]
    // n=3 S=4 Q=8. lag1: A=0 B=2 C=2 m=2 ->
    //   num = 9*0-3*4*4+2*16 = -16; den = 9*8-3*16 = 24
    // lag2: A=4 B=2 C=2 m=1 -> num = 36-48+16 = 4
    val ev = frame(
      "user_id" -> Seq.fill(4)(1L),
      "event_type" -> Seq.fill(4)("A"),
      "ts_ns" -> Seq(day(0) + 1, day(0) + 2, day(2) + 1, day(2) + 2))
    val out = EventAnalytics.acfDaily(ev, maxLag = 7)
      .orderBy("lag_k").collect()
    assert(out.length === 2) // lags 3+ have no overlap, no rows
    assert(out(0).getLong(1) === 1L && out(0).getDouble(3) === -16.0 / 24.0)
    assert(out(1).getLong(1) === 2L && out(1).getDouble(3) === 4.0 / 24.0)
    // constant series -> zero denominator -> NULL acf
    val const = frame(
      "user_id" -> Seq(1L, 1L),
      "event_type" -> Seq("C", "C"),
      "ts_ns" -> Seq(day(0) + 1, day(1) + 1))
    val c = EventAnalytics.acfDaily(const, maxLag = 1).collect()
    assert(c.length === 1 && c(0).isNullAt(3))
  }

  test("theilSen: hand-sorted medians, outlier-robust, single-day type " +
      "excluded") {
    // A y=[1,3,2] on days 0-2: slopes {2, 0.5, -1} -> median 0.5
    // B y=[1,2,4,8]: slopes sorted [1, 1.5, 2, 7/3, 3, 4] -> (2+7/3)/2
    // D y=[1,2,3,4,100]: six of ten slopes are 1 -> median 1 (robust)
    // C: one day -> excluded
    def mk(t: String, counts: Seq[Int]): (Seq[Long], Seq[String], Seq[Long]) = {
      val rows = counts.zipWithIndex.flatMap { case (c, d) =>
        (1L to c.toLong).map(i => day(d.toLong) + i) }
      (Seq.fill(rows.length)(1L), Seq.fill(rows.length)(t), rows)
    }
    val parts = Seq(mk("A", Seq(1, 3, 2)), mk("B", Seq(1, 2, 4, 8)),
      mk("C", Seq(2)), mk("D", Seq(1, 2, 3, 4, 100)))
    val ev = frame(
      "user_id" -> parts.flatMap(_._1),
      "event_type" -> parts.flatMap(_._2),
      "ts_ns" -> parts.flatMap(_._3))
    val out = EventAnalytics.theilSen(ev).orderBy("event_type").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("A", "B", "D"))
    val byT = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byT("A") === ((3L, 3L, 0.5)))
    assert(byT("B") === ((4L, 6L, (2.0 + 7.0 / 3.0) / 2.0)))
    assert(byT("D") === ((5L, 10L, 1.0)))
  }

  test("ccfDaily: shifted series peaks at its lead; overlap shrinks " +
      "with |lag|") {
    // x on days 0-2 counts [1,2,3]; y = x shifted +1 day (days 1-3).
    // Joint span 0..3: x=[1,2,3,0], y=[0,1,2,3]; exact-moment r via
    // the operator's own formula replayed in-JVM
    val ev = frame(
      "user_id" -> Seq.fill(12)(1L),
      "event_type" -> (Seq.fill(6)("X") ++ Seq.fill(6)("Y")),
      "ts_ns" -> (Seq(day(0) + 1) ++ (1L to 2L).map(day(1) + _) ++
        (1L to 3L).map(day(2) + _) ++
        Seq(day(1) + 9) ++ (4L to 5L).map(day(2) + _) ++
        (1L to 3L).map(day(3) + _)))
    val out = EventAnalytics.ccfDaily(ev, "X", "Y", maxLag = 7)
      .orderBy("lag_k").collect()
    // span 4 days: only |k| <= 3 has overlap
    assert(out.map(_.getLong(0)).toSeq === (-3L to 3L))
    val xs = Seq(1L, 2L, 3L, 0L); val ys = Seq(0L, 1L, 2L, 3L)
    def ref(k: Int): Option[Double] = {
      val pairs = xs.indices.flatMap { t =>
        val u = t + k
        if (u >= 0 && u < ys.length) Some((xs(t), ys(u))) else None }
      val m = pairs.length.toLong
      val A = pairs.map { case (x, y) => x * y }.sum
      val bx = pairs.map(_._1).sum; val by = pairs.map(_._2).sum
      val qx = pairs.map(p => p._1 * p._1).sum
      val qy = pairs.map(p => p._2 * p._2).sum
      val vx = (m * qx - bx * bx).toDouble
      val vy = (m * qy - by * by).toDouble
      if (vx > 0 && vy > 0)
        Some((m * A - bx * by).toDouble / (math.sqrt(vx) * math.sqrt(vy)))
      else None
    }
    for (r <- out) {
      val k = r.getLong(0).toInt
      ref(k) match {
        case Some(v) => assert(r.getDouble(2) === v, s"lag $k")
        case None => assert(r.isNullAt(2), s"lag $k")
      }
    }
    // the planted +1 lead IS the argmax
    val best = out.filter(!_.isNullAt(2)).maxBy(_.getDouble(2))
    assert(best.getLong(0) === 1L && best.getDouble(2) > 0.99)
  }

  test("mutualInfo: hand contingency; independent table has zero MI") {
    // counts (p,u)=2 (p,v)=1 (q,u)=1 (q,v)=2; N=6, marginals all 3
    val df = frame(
      "a" -> Seq("p", "p", "p", "q", "q", "q"),
      "b" -> Seq("u", "u", "v", "u", "v", "v"))
    val out = graft.ops.Stats.mutualInfo(df, "a", "b")
      .orderBy("a", "b").collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t2 = r6((2.0 / 6.0) * math.log(12.0 / 9.0))
    val t1 = r6((1.0 / 6.0) * math.log(6.0 / 9.0))
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(6))).toSeq === Seq(("p", "u", 2L, t2),
      ("p", "v", 1L, t1), ("q", "u", 1L, t1), ("q", "v", 2L, t2)))
    // independence: every cell share = product of marginal shares
    val ind = frame(
      "a" -> Seq("p", "p", "q", "q"),
      "b" -> Seq("u", "v", "u", "v"))
    val zero = graft.ops.Stats.mutualInfo(ind, "a", "b").collect()
    assert(zero.forall(_.getDouble(6) === 0.0))
  }

  test("brrMeanCi: bitwise-equal to an independent JVM replay of the " +
      "replication estimator") {
    val ids = (1L to 200L)
    val df = frame("id" -> ids, "v" -> ids.map(i => i * 3 % 17))
    val out = graft.ops.Stats.brrMeanCi(df, "id", col("v"), b = 8,
      salt = "t").collect()(0)
    // JVM reference with the same md5-bit replicate rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = ids.map(i => (hex(s"t:$i"), (i * 3 % 17)))
    val n = rows.length.toLong
    val s = rows.map(_._2).sum
    val theta = s.toDouble / n.toDouble
    val reps = (0 until 8).flatMap { r =>
      val kept = rows.filter { case (h, _) =>
        val v = "0123456789abcdef".indexOf(h(r / 4))
        ((v >> (r % 4)) & 1) == 1 }
      if (kept.isEmpty) None
      else Some(kept.map(_._2).sum.toDouble / kept.length.toDouble)
    }
    val ss = reps.map { tr =>
      BigDecimal((tr - theta) * (tr - theta))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP) }.sum
    val se = math.sqrt(ss.toDouble / reps.length.toDouble)
    assert(out.getLong(0) === n && out.getLong(1) === reps.length.toLong)
    assert(out.getDouble(2) === theta && out.getDouble(3) === se)
    assert(out.getDouble(4) === theta - 1.96 * se)
    assert(out.getDouble(5) === theta + 1.96 * se)
    assert(se > 0.0) // the fixture genuinely varies across replicates
  }

  test("interArrival: power-of-two buckets, later-event labeling, " +
      "zero gaps, per-user isolation") {
    // user 1: A@0s, B@1s, A@4s, A@4s (same second), A@100s ->
    // gaps: 1s->B bucket1; 3s->A bucket2; 0s->A bucket0; 96s->A bucket6
    // user 2: one event, no gap
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 1L, 1L, 2L),
      "event_type" -> Seq("A", "B", "A", "A", "A", "A"),
      "event_id" -> Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "ts_ns" -> Seq(sec(0), sec(1), sec(4), sec(4), sec(100), sec(50)))
    val out = EventAnalytics.interArrival(ev)
      .orderBy("event_type", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("A", 0L, 1L, 1.0 / 3.0), ("A", 2L, 1L, 1.0 / 3.0),
      ("A", 6L, 1L, 1.0 / 3.0), ("B", 1L, 1L, 1.0)))
  }

  test("varianceRatio: mean-reverting 0, trending 1.6, constant NULL, " +
      "incomplete block absent") {
    def mk(t: String, counts: Seq[Int]) = {
      val ts = counts.zipWithIndex.flatMap { case (c, d) =>
        (1L to c.toLong).map(i => day(d.toLong) + i) }
      (Seq.fill(ts.length)(1L), Seq.fill(ts.length)(t), ts)
    }
    val parts = Seq(mk("A", Seq(1, 3, 1, 3)), mk("B", Seq(1, 2, 3, 4)),
      mk("C", Seq(2, 2)))
    val ev = frame(
      "user_id" -> parts.flatMap(_._1),
      "event_type" -> parts.flatMap(_._2),
      "ts_ns" -> parts.flatMap(_._3))
    val out = EventAnalytics.varianceRatio(ev, qs = Seq(2, 4, 8))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // A alternates 1,3: 2-day sums constant -> VR(2) = 0; VR(4) = 0
    assert(out(("A", 2L)).getDouble(4) === 0.0)
    assert(out(("A", 4L)).getDouble(4) === 0.0)
    // B trends: blocks [3,7]: 256/160 = 1.6 exactly
    assert(out(("B", 2L)).getDouble(4) === 1.6)
    // C constant: zero daily variance -> NULL
    assert(out(("C", 2L)).isNullAt(4))
    // q=8 has no complete 8-day block anywhere -> no rows
    assert(!out.keySet.exists(_._2 == 8L))
  }

  test("exactKth: forced multi-pass refinement, duplicates, negatives, " +
      "min/max k") {
    val vals = scala.util.Random.shuffle((1L to 100L).toList)
    val df = frame("v" -> vals)
    // buckets=4 over range 100 -> several refinement passes
    val med = graft.ops.Selection.exactKth(df, col("v"), buckets = 4)
      .collect()(0)
    assert((med.getLong(0), med.getLong(1), med.getLong(2)) ===
      ((100L, 50L, 50L)))
    val dup = frame("v" -> Seq(5L, 5L, 5L, 1L, 9L))
    val m2 = graft.ops.Selection.exactKth(dup, col("v"), buckets = 2)
      .collect()(0)
    assert(m2.getLong(2) === 5L) // sorted [1,5,5,5,9] -> 3rd = 5
    val neg = frame("v" -> Seq(-50L, -2L, 30L, -2L))
    assert(graft.ops.Selection.exactKth(neg, col("v"), n => 1L,
      buckets = 4).collect()(0).getLong(2) === -50L)
    assert(graft.ops.Selection.exactKth(neg, col("v"), n => n,
      buckets = 4).collect()(0).getLong(2) === 30L)
    assert(graft.ops.Selection.exactKth(neg, col("v"), n => 2L,
      buckets = 4).collect()(0).getLong(2) === -2L)
  }

  test("skyline2d: dominated points drop, frontier ties keep " +
      "multiplicity, equal-min at higher max dominates") {
    val pts = Seq((5L, 20L), (4L, 25L), (3L, 8L), (3L, 8L), (3L, 11L),
      (2L, 8L), (2L, 9L), (1L, 10L), (1L, 12L))
    val df = frame("q" -> pts.map(_._1), "p" -> pts.map(_._2))
    val out = graft.ops.Selection.skyline2d(df, col("q"), col("p"))
      .orderBy(col("max_v").desc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (4,25) dominated by (5,20); (2,8) by (3,8) (max strict, min tie);
    // (3,8) x2 both kept
    assert(out.toSeq === Seq((5L, 20L, 1L), (3L, 8L, 2L)))
  }

  test("partitionedRoundTrip: trailing-week filter correct AND the " +
      "scan partition-prunes") {
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 1L, 1L, 2L),
      "event_type" -> Seq("A", "A", "A", "A", "A", "B"),
      "ts_ns" -> Seq(day(0), day(7), day(14), day(21), day(28),
        day(28) + 5))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_x194_spec").toString
    val q = graft.ops.Layout.partitionedRoundTrip(ev, dir, lastWeeks = 4)
    // max week 4, cut 0 -> weeks 1..4 survive (day 0 excluded)
    val out = q.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(("A", 4L, 4L, 1L), ("B", 1L, 1L, 1L)))
    // the filter must reach the scan as a PARTITION filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    assert(plan.contains("(week"), "week filter missing from scan")
  }

  test("silhouette: separated clusters score 1; duplicate centroids " +
      "leave vectors unscored") {
    val sep = frame(
      "vec_id" -> Seq(1L, 2L, 3L, 4L),
      "embedding" -> Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0),
        Seq(0.0, 1.0)))
    val out = graft.functions.Similarity
      .silhouette(sep, nCells = 2, iters = 1).orderBy("cell").collect()
    // init c1=(1,0) c2=(0,1); own sim 1, other 0 -> s = 1 everywhere
    assert(out.length === 2)
    for (r <- out) {
      assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
      assert(r.getDouble(3) === 1.0)
    }
    val dup = frame(
      "vec_id" -> Seq(1L, 2L, 3L, 4L),
      "embedding" -> Seq.fill(4)(Seq(1.0, 0.0)))
    val d = graft.functions.Similarity
      .silhouette(dup, nCells = 2, iters = 1).collect()
    // both centroids identical -> second-best sim is 1 -> unscored
    assert(d.length === 1 && d(0).getLong(1) === 4L &&
      d(0).getLong(2) === 0L && d(0).isNullAt(3))
  }

  test("conversionLag: strict-after attribution, power-of-two buckets, " +
      "share normalization") {
    // u1: view@10s purchase@100s -> 90s -> bucket 6 (bin(91) 7 bits)
    // u2: purchase BEFORE view -> excluded
    // u3: same-ns view/purchase -> excluded (strict after)
    // u4: view@0s purchase@1s -> bucket 1
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L),
      "event_type" -> Seq("view", "purchase", "purchase", "view",
        "view", "purchase", "view", "purchase"),
      "ts_ns" -> Seq(sec(10), sec(100), sec(5), sec(10),
        sec(10), sec(10), sec(0), sec(1)))
    val out = EventAnalytics.conversionLag(ev, "view", "purchase")
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 1L, 0.5), (6L, 1L, 0.5)))
  }

  test("bm25TopK: hand-checked scores, doc without terms absent") {
    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L),
      "text" -> Seq("a b", "a a b", "c"))
    val out = TextAnalysis.bm25TopK(docs, Seq("a"), k = 10)
      .orderBy(col("score").desc, col("doc_id")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 1L)) // doc 3 has no 'a'
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double): Double = {
      val avgdl = 6.0 / 3.0
      val term = idf * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      val t12 = BigDecimal(term).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      t12.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0).getDouble(1) === s(2.0, 3.0))
    assert(out(1).getDouble(1) === s(1.0, 2.0))
    assert(out.forall(_.getLong(2) === 1L)) // n_terms
  }

  test("winsorizedStats: interpolated bounds clip exactly one outlier " +
      "per tail; robust mean matches hand computation") {
    val vals = (1L to 9L) :+ 100L
    val docs = frame(
      "source" -> Seq.fill(10)("s"),
      "n_chars" -> vals.toSeq)
    val out = TextAnalysis.winsorizedStats(docs, "source", "n_chars",
      lo = 0.05, hi = 0.95).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 1L) // one clip each tail
    // p05 = 1 + 0.45*(2-1) = 1.45 ; p95 = 9 + 0.55*(100-9) = 59.05
    assert(r.getDouble(5) === 1.45 && r.getDouble(6) === 59.05)
    val wmean = (1.45 + (2L to 9L).map(_.toDouble).sum + 59.05) / 10.0
    assert(r.getDouble(4) === BigDecimal(wmean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("scoreCalibration: bins partition the corpus; probs stay in-bin; " +
      "gap is the rounded difference") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.scoreCalibration(docs, dims = 64, bins = 10)
      .collect()
    val total = docs.count()
    assert(out.map(_.getLong(1)).sum === total)
    for (r <- out) {
      val bin = r.getLong(0)
      assert(bin >= 0 && bin <= 9)
      val meanProb = r.getDouble(2)
      // mean of in-bin probs lies in the bin (bin 9 also holds prob=1.0)
      assert(meanProb >= bin / 10.0 - 1e-6 &&
        meanProb <= (bin + 1) / 10.0 + 1e-6)
      val posRate = r.getDouble(4)
      assert(posRate >= 0.0 && posRate <= 1.0)
      assert(r.getDouble(5) === BigDecimal(posRate - meanProb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("topPaths: 3-gram counts, per-user isolation, tie-broken cut") {
    // user 1: a b c b c  -> abc, bcb, cbc ; user 2: a b c -> abc
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 1L, 1L, 2L, 2L, 2L),
      "event_type" -> Seq("a", "b", "c", "b", "c", "a", "b", "c"),
      "ts_ns" -> Seq(sec(1), sec(2), sec(3), sec(4), sec(5),
        sec(1), sec(2), sec(3)),
      "event_id" -> (1L to 8L))
    val out = EventAnalytics.topPaths(ev, k = 10).collect()
    val m = out.map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
      r.getLong(3)).toMap
    assert(m === Map(("a", "b", "c") -> 2L, ("b", "c", "b") -> 1L,
      ("c", "b", "c") -> 1L))
    // k cuts deterministically on (n DESC, path)
    val top1 = EventAnalytics.topPaths(ev, k = 1).collect()
    assert(top1.length === 1 &&
      top1(0).getString(0) === "a" && top1(0).getLong(3) === 2L)
  }

  test("rfm: quintile scores honor strict-greater thresholds; code " +
      "composes digits") {
    // 5 customers, one order each on distinct days/amounts: the
    // dimensions are perfectly rank-correlated, so scores are 1..5
    // (recency: LATER last order = smaller recency_days = LOWER score
    // under the monotone-in-value rule)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(
      base.getTime + d.toLong * 86400 * 1000)
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_custkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("o_orderdate",
        org.apache.spark.sql.types.TimestampType)))
    val rows = (1 to 5).map(i => org.apache.spark.sql.Row(
      i.toLong, i * 100.0, ts(i))).asJava
    val orders = spark.createDataFrame(rows, schema)
    val out = CustomerAnalytics.rfm(orders).orderBy("o_custkey").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 3L, 2L, 1L, 0L)) // recency
    assert(out.map(_.getLong(4)).toSeq === Seq(5L, 4L, 3L, 2L, 1L)) // r_score
    assert(out.map(_.getLong(6)).toSeq === Seq(1L, 2L, 3L, 4L, 5L)) // m_score
    // equal frequencies: every value ties at every threshold -> all score 1
    assert(out.map(_.getLong(5)).toSet === Set(1L))
    for (r <- out)
      assert(r.getLong(7) ===
        r.getLong(4) * 100 + r.getLong(5) * 10 + r.getLong(6))
  }

  test("fkAudit: planted orphans and null fks counted apart") {
    val child = frame(
      "fk" -> Seq[Any](1L, 1L, 2L, 99L, null, null),
      "v" -> Seq[Any](1L, 2L, 3L, 4L, 5L, 6L))
    val parent = frame("pk" -> Seq(1L, 2L, 3L))
    val out = Integrity.fkLeg("child.fk->parent.pk", child, "fk",
      parent, "pk").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getString(0) === "child.fk->parent.pk")
    assert(r.getLong(1) === 6L) // n_child
    assert(r.getLong(2) === 2L) // n_null_fk
    assert(r.getLong(3) === 1L) // n_orphan (the 99)
    assert(r.getDouble(4) === BigDecimal(1.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("fkAudit: clean relationship reports zero orphans, not null") {
    val child = frame("fk" -> Seq(1L, 2L), "v" -> Seq(1L, 2L))
    val parent = frame("pk" -> Seq(1L, 2L, 3L))
    val r = Integrity.fkLeg("c->p", child, "fk", parent, "pk").collect()(0)
    assert(r.getLong(3) === 0L && r.getDouble(4) === 0.0)
  }

  test("pageRank: hand-iterated star graph; symmetric cycle is a fixed " +
      "point; mass conserved up to floor loss") {
    // undirected star: c - a, c - b
    val edges = frame(
      "src" -> Seq("c", "c", "a", "b"),
      "dst" -> Seq("a", "b", "c", "c"))
    val out = graft.ops.Graphs.pageRank(edges, iters = 2)
      .orderBy("node").collect()
    val m = out.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // r1: a=b=150000+17*(1e6/2)/20=575000 ; c=150000+17*2e6/20=1850000
    // r2: a=b=150000+17*(1850000/2)/20=936250 ; c=150000+17*1150000/20=1127500
    assert(m("a") === 0.93625 && m("b") === 0.93625 && m("c") === 1.1275)
    assert(m.values.sum <= 3.0 + 1e-9 && m.values.sum > 2.99)
    // a 2-cycle is exactly stationary at rank 1.0 forever
    val cyc = frame("src" -> Seq("x", "y"), "dst" -> Seq("y", "x"))
    val c = graft.ops.Graphs.pageRank(cyc, iters = 4).collect()
      .map(_.getDouble(1)).toSeq
    assert(c === Seq(1.0, 1.0))
  }

  test("cmsHeavyHitters: estimates never undercount; exact top-k exact; " +
      "sketch mass = depth x token count") {
    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L),
      "text" -> Seq("a a a b", "a b c", "d e a"))
    val out = graft.ops.Sketches.cmsHeavyHitters(docs, topK = 3,
      depth = 4, width = 8).collect()
    assert(out.length === 3)
    assert(out(0).getString(0) === "a" && out(0).getLong(1) === 5L)
    for (r <- out) {
      assert(r.getLong(2) >= r.getLong(1), s"CMS undercounted ${r.getString(0)}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
    val sketch = graft.ops.Sketches.cmsSketch(docs, depth = 4, width = 8)
    val mass = sketch.agg(org.apache.spark.sql.functions.sum("cnt"))
      .head().getLong(0)
    assert(mass === 4L * 10L) // 10 tokens x 4 depths
  }

  test("kAnonymity: small-group rows counted against k; clean table " +
      "reports zero risk") {
    val df = frame(
      "qa" -> Seq("x", "y", "y", "z", "z", "z", "z", "z"),
      "qb" -> Seq("1", "1", "1", "1", "1", "1", "1", "1"))
    val r = Integrity.kAnonymity(df, Seq("qa", "qb"), k = 5).collect()(0)
    assert(r.getLong(0) === 5L && r.getLong(1) === 8L && r.getLong(2) === 3L)
    assert(r.getLong(3) === 1L) // min group
    assert(r.getLong(4) === 2L && r.getLong(5) === 3L) // 2 small groups, 3 rows
    assert(r.getDouble(6) === 0.375)
    val clean = Integrity.kAnonymity(df, Seq("qb"), k = 5).collect()(0)
    assert(clean.getLong(4) === 0L && clean.getDouble(6) === 0.0)
  }

  test("sessionSummary: rollup over hand sessions; one-event session has " +
      "zero duration") {
    // user 1: events at 0s,10s | gap | 4000s  -> sessions of 2 and 1 events
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L),
      "event_type" -> Seq("a", "a", "a"),
      "ts_ns" -> Seq(sec(0), sec(10), sec(4000)),
      "event_id" -> Seq(1L, 2L, 3L))
    val r = graft.ops.EventWindows.sessionSummary(ev, 1800).collect()(0)
    assert(r.getLong(1) === 2L) // n_sessions
    assert(r.getLong(2) === 3L) // n_events
    assert(r.getDouble(3) === 1.5) // mean events
    assert(r.getDouble(4) === 5.0) // mean duration: (10 + 0) / 2
    assert(r.getLong(5) === 10L)
  }

  test("funnelByVariant: segmented counts sum to the unsegmented funnel; " +
      "rates are within-variant") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val steps = Seq("signup", "view", "click", "purchase")
    val seg = EventAnalytics.funnelByVariant(ev, steps, nVariants = 2,
      salt = "s").collect()
    val whole = EventAnalytics.funnel(ev, steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val byStep = seg.groupBy(_.getLong(1))
      .map { case (s, rows) => s -> rows.map(_.getLong(3)).sum }
    assert(byStep === whole, "variant counts must partition the funnel")
    for (r <- seg.filter(_.getLong(1) == 1L))
      assert(r.getDouble(4) === 1.0, "step-1 rate is 1.0 within variant")
  }

  test("forgetAudit: deletion list counted per table, one scan, " +
      "duplicate ids in the list count rows once") {
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 3L),
      "v" -> Seq(1L, 2L, 3L, 4L))
    val dim = frame("user_id" -> Seq(1L, 9L), "w" -> Seq(1L, 2L))
    val ids = frame("user_id" -> Seq(1L, 1L, 7L))
    val out = Integrity.forgetAudit(Seq(("ev", ev, "user_id"),
        ("dim", dim, "user_id")), ids)
      .orderBy("table_name").collect()
    val m = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(m("ev") === ((4L, 2L, 2L, 0.5)))
    assert(m("dim") === ((2L, 1L, 1L, 0.5)))
  }

  test("activityHeatmap: epoch day 0 is Thursday (dow 3, Monday = 0); " +
      "distinct users per cell") {
    val h = 3600L * 1000000000L
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L, 1L),
      "event_type" -> Seq("a", "a", "a", "a"),
      // two events same user same cell (Thu 05h), one other user same
      // cell, one event four days later (Monday 00h)
      "ts_ns" -> Seq(5 * h, 5 * h + 1, 5 * h + 2, 4 * 24 * h))
    val out = EventAnalytics.activityHeatmap(ev)
      .orderBy("dow", "hod").collect()
    val m = out.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(m === Map((3L, 5L) -> ((3L, 2L)), (0L, 0L) -> ((1L, 1L))))
  }

  test("linearFit: exact line recovered exactly; constant x yields NULL " +
      "slope, not a crash") {
    val pts = frame("x" -> Seq(1L, 2L, 3L), "y" -> Seq(3L, 5L, 7L))
    val r = graft.ops.Stats.linearFit(pts, col("x"), col("y")).collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 2.0 && r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 1.0)
    val flat = frame("x" -> Seq(5L, 5L), "y" -> Seq(1L, 2L))
    val f = graft.ops.Stats.linearFit(flat, col("x"), col("y")).collect()(0)
    assert(f.isNullAt(1) && f.isNullAt(2) && f.isNullAt(3))
  }

  test("pairwiseCorr: perfect +/- correlation exact; constant column NULL") {
    val df = frame(
      "a" -> Seq(1L, 2L, 3L, 4L),
      "b" -> Seq(2L, 4L, 6L, 8L),
      "c" -> Seq(4L, 3L, 2L, 1L),
      "k" -> Seq(7L, 7L, 7L, 7L))
    val out = graft.ops.Stats.pairwiseCorr(df, Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "k" -> col("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("a", "b")) === Some(1.0))
    assert(out(("a", "c")) === Some(-1.0))
    assert(out(("a", "k")) === None && out(("b", "k")) === None)
    assert(out.size === 6)
  }

  test("cohortLtv: revenue conserved, cumulative monotone, hand LTV") {
    val wk = 7L * 86400
    // u1,u2 in cohort 0 (u2 active again in week 1); u3 in cohort 1
    val ev = frame(
      "user_id" -> Seq(1L, 2L, 2L, 3L),
      "event_type" -> Seq("a", "a", "a", "a"),
      "ts_ns" -> Seq(sec(10), sec(20), sec(wk + 5), sec(wk + 9)),
      "value" -> Seq(10.0, 5.0, 2.5, 4.0))
    val out = graft.ops.EventAnalytics.cohortLtv(ev, wk)
      .orderBy("cohort_start", "offset").collect()
    val m = out.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m((0L, 0L)) === ((15.0, 15.0, 7.5))) // 2 users in cohort 0
    assert(m((0L, 1L)) === ((2.5, 17.5, 8.75)))
    assert(m((wk, 0L)) === ((4.0, 4.0, 4.0)))
    assert(out.map(_.getDouble(2)).sum === 21.5) // all revenue lands once
  }

  test("revenueConcentration: shares sum to 1, cum_share ends at 1, " +
      "revenue conserved, deciles ordered by spend") {
    val ev = frame(
      "user_id" -> (1L to 20L),
      "event_type" -> Seq.fill(20)("purchase"),
      "value" -> (1L to 20L).map(_ * 10.0))
    val out = graft.ops.CustomerAnalytics.revenueConcentration(ev)
      .orderBy("decile").collect()
    assert(out.map(_.getLong(1)).sum === 20L)
    assert(out.map(_.getDouble(2)).sum === (1 to 20).map(_ * 10.0).sum)
    assert(out.last.getDouble(4) === 1.0) // cum_share terminal
    val shares = out.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-5)
    // later deciles hold strictly more revenue on this ramp
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
  }

  test("classifierScore carry: label column rides through unchanged") {
    val docs = frame(
      "doc_id" -> Seq(1L, 2L),
      "text" -> Seq("x y", "z"),
      "lang" -> Seq("en", "fr"))
    val out = TextAnalysis.classifierScore(docs, dims = 4, carry = Seq("lang"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(5)).toSeq === Seq("en", "fr"))
  }

  test("mannWhitney: hand-ranked sample without ties") {
    // A = {1,2,4}, B = {3,5,6,7}: pooled ranks give R_A = 1+2+4 = 7,
    // U_A = 7 - 3*4/2 = 1, U_B = 12 - 1 = 11; sigma^2 = 12*336/504 = 8,
    // z = (1 - 6)/(2*sqrt(2)) = -1.767767
    val df = frame(
      "g" -> Seq("A", "A", "A", "B", "B", "B", "B"),
      "v" -> Seq(1.0, 2.0, 4.0, 3.0, 5.0, 6.0, 7.0))
    val r = graft.ops.Stats.mannWhitney(df, "g", "v", "A", "B").head()
    assert(r.getLong(2) === 3L && r.getLong(3) === 4L)
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 11.0)
    assert(r.getDouble(6) === -1.767767)
  }

  test("mannWhitney: midrank ties and the tie-corrected variance") {
    // A = {1,1}, B = {1,2}: value 1 has t=3, doubled midrank 4 (r=2), so
    // R_A = 4, U_A = 1; T = 24, sigma^2 = 4*(60-24)/144 = 1, z = -1
    val df = frame(
      "g" -> Seq("A", "A", "B", "B"),
      "v" -> Seq(1.0, 1.0, 1.0, 2.0))
    val r = graft.ops.Stats.mannWhitney(df, "g", "v", "A", "B").head()
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 3.0)
    assert(r.getDouble(6) === -1.0)
    // all values tied -> zero variance -> z NULL, U still defined
    val tied = frame("g" -> Seq("A", "B"), "v" -> Seq(5.0, 5.0))
    val rt = graft.ops.Stats.mannWhitney(tied, "g", "v", "A", "B").head()
    assert(rt.getDouble(4) === 0.5 && rt.isNullAt(6))
  }

  test("anovaF: hand moments; zero within-variance -> NULL") {
    // g1 = {1,2,3}, g2 = {4,5,6}: A2 = 12+75 = 87, S^2/n = 73.5,
    // SSB = 13.5, SSW = 4, F = (13.5/1)/(4/4) = 13.5
    val df = frame(
      "g" -> Seq("g1", "g1", "g1", "g2", "g2", "g2"),
      "v" -> Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val r = graft.ops.Stats.anovaF(df, "g", col("v")).head()
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 4L)
    assert(r.getDouble(4) === 13.5)
    // constant within groups: SSW = 0 -> F undefined, not an ANSI error
    val const = frame(
      "g" -> Seq("g1", "g1", "g2", "g2"),
      "v" -> Seq(1L, 1L, 7L, 7L))
    assert(graft.ops.Stats.anovaF(const, "g", col("v")).head().isNullAt(4))
  }

  test("psiBins: identical frames -> zero terms; empty bin -> NULL term") {
    val ref = frame("v" -> (1 to 10).map(_.toLong))
    val same = graft.ops.Profiling.psiBins(ref, ref, col("v"), bins = 2)
      .orderBy("bin").collect()
    assert(same.map(_.getLong(1)).toSeq === Seq(5L, 5L))
    assert(same.forall(_.getDouble(5) === 0.0))
    // cur misses the upper bin entirely: term NULL there, and the lower
    // bin's term is (0.5 - 1.0)*ln(0.5) = 0.346574
    val cur = frame("v" -> Seq(1L, 2L, 3L))
    val drift = graft.ops.Profiling.psiBins(ref, cur, col("v"), bins = 2)
      .orderBy("bin").collect()
    assert(drift(0).getDouble(5) === 0.346574)
    assert(drift(1).getLong(2) === 0L && drift(1).isNullAt(5))
  }

  test("positionAttribution: hand journeys (1/2/3-touch weight shapes)") {
    // u1: a b c -> purchase (0.4/0.2/0.4); u2: a -> purchase (1.0);
    // u3: a b -> purchase (0.5/0.5); u4 touches AFTER its purchase ->
    // no credit
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 3L, 3L, 4L, 4L),
      "event_type" -> Seq("a", "b", "c", "purchase", "a", "purchase",
        "a", "b", "purchase", "purchase", "a"),
      "ts_ns" -> Seq(sec(1), sec(2), sec(3), sec(4), sec(1), sec(2),
        sec(1), sec(2), sec(3), sec(1), sec(2)),
      "event_id" -> (1L to 11L))
    val out = EventAnalytics.positionAttribution(ev).orderBy("channel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", 3L, 1.9, 0.633333), ("b", 2L, 0.7, 0.233333),
      ("c", 1L, 0.4, 0.133333)))
  }

  test("weightedMedian: hand-weighted fixture, heavy-row dominance, " +
      "zero/NULL weights inert, unit weights == exactKth") {
    // v=[10,20,30] w=[1,2,6]: W=9, k=5; cum 10->1, 20->3, 30->9 -> 30
    val df = frame("v" -> Seq(10L, 20L, 30L),
      "w" -> Seq(1L, 2L, 6L))
    val out = graft.ops.Selection.weightedMedian(df, col("v"), col("w"))
      .collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) ===
      ((9L, 5L, 30L)))
    // one heavy row outvotes many light rows (the quantity-weighted
    // unit-price story); forced multi-pass via buckets=2 over a wide range
    val heavy = frame("v" -> (Seq.fill(10)(1000000L) :+ 7L),
      "w" -> (Seq.fill(10)(1L) :+ 100L))
    assert(graft.ops.Selection.weightedMedian(heavy, col("v"), col("w"),
      buckets = 2).collect()(0).getLong(2) === 7L)
    // zero and NULL weights are dropped up front: adding them changes
    // nothing (W stays 9)
    val padded = frame("v" -> Seq(10L, 20L, 30L, 5L, 5L),
      "w" -> Seq(1L, 2L, 6L, 0L, null))
    val p = graft.ops.Selection.weightedMedian(padded, col("v"), col("w"))
      .collect()(0)
    assert((p.getLong(0), p.getLong(2)) === ((9L, 30L)))
    // w=1 everywhere degenerates to the unweighted lower median
    val vals = scala.util.Random.shuffle((1L to 51L).toList)
    val u = frame("v" -> vals, "w" -> Seq.fill(51)(1L))
    val wm = graft.ops.Selection.weightedMedian(u, col("v"), col("w"),
      buckets = 4).collect()(0)
    val ek = graft.ops.Selection.exactKth(frame("v" -> vals), col("v"),
      buckets = 4).collect()(0)
    assert(wm.getLong(2) === ek.getLong(2))
    assert((wm.getLong(0), wm.getLong(1)) ===
      ((ek.getLong(0), ek.getLong(1))))
  }

  test("fuzzy entity clusters (x198 composition): families merge " +
      "transitively through chained edits, distinct families stay apart") {
    // Two entity families of >= 11 distinct 5-grams each; within a
    // family consecutive variants differ by <= 2 edits, across families
    // by far more. Family A has diameter 2 edits (a1-a3 ed=2) so the
    // 3-round min-label propagation must bridge a1..a3 transitively.
    val a1 = "alpha industries incorporated west"
    val a2 = "alpha industries incorporated east" // ed(a1,a2)=2 (w->e, e->a)
    val a3 = "alpha industries incorporated easy" // ed(a2,a3)=1
    val b1 = "bravo holdings limited of nebraska"
    val b2 = "bravo holdings limited of nebrasky" // ed=1
    val df = frame("id" -> Seq(1L, 2L, 3L, 4L, 5L),
      "nm" -> Seq(a1, a2, a3, b1, b2))
    val pairs = graft.ops.Dedup.fuzzyJoin(df, "id", "nm", q = 5,
      maxDist = 2)
      .select(col("id1").as("id_a"), col("id2").as("id_b"))
    val clusters = graft.ops.Dedup.clusterPairs(pairs, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-label: family A (1,2,3) -> 1; family B (4,5) -> 4
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L))
  }

  test("spearman: monotone nonlinear = 1, reversed = -1, hand " +
      "no-tie case = 0.8, constant column NULL") {
    import graft.ops.Stats
    // any strictly monotone transform: rho exactly 1 / -1
    val xs = Seq(1L, 2L, 3L, 4L, 5L)
    val cube = frame("x" -> xs, "y" -> xs.map(v => v * v * v))
    assert(Stats.spearman(cube, col("x"), col("y"))
      .collect()(0).getDouble(1) === 1.0)
    val rev = frame("x" -> xs, "y" -> xs.map(v => -v * v * v))
    assert(Stats.spearman(rev, col("x"), col("y"))
      .collect()(0).getDouble(1) === -1.0)
    // textbook: d = (0,1,1,0), rho = 1 - 6*2/(4*15) = 0.8
    val hand = frame("x" -> Seq(1L, 2L, 3L, 4L),
      "y" -> Seq(1L, 3L, 2L, 4L))
    val r = Stats.spearman(hand, col("x"), col("y")).collect()(0)
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.8)
    // zero rank variance -> NULL, not NaN/crash
    val const = frame("x" -> Seq(1L, 2L, 3L), "y" -> Seq(7L, 7L, 7L))
    assert(Stats.spearman(const, col("x"), col("y"))
      .collect()(0).isNullAt(1))
  }

  test("mannKendall: strict trends = ±1, hand tie case, constant NULL") {
    import graft.ops.Stats
    def mk(ys: Seq[Long]): org.apache.spark.sql.Row = {
      val df = frame("s" -> Seq.fill(ys.size)("a"),
        "d" -> (1L to ys.size).toSeq, "y" -> ys)
      Stats.mannKendall(df, "s", "d", "y").collect()(0)
    }
    val up = mk(Seq(1L, 2L, 5L, 9L))
    assert(up.getLong(2) === 6L) // S = n(n-1)/2
    assert(up.getDouble(3) === 1.0)
    val down = mk(Seq(9L, 5L, 2L, 1L))
    assert(down.getDouble(3) === -1.0)
    // y=[1,2,2,3]: S=5; N=12, tt=2, M=10 -> tau=10/sqrt(120);
    // varS=(156-18)/18; z=(5-1)/sqrt(varS)
    val tie = mk(Seq(1L, 2L, 2L, 3L))
    assert(tie.getLong(2) === 5L)
    assert(tie.getDouble(3) ===
      BigDecimal(2.0 * 5 / math.sqrt(120.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(tie.getDouble(4) ===
      BigDecimal(4.0 / math.sqrt(138.0 / 18.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant: M = 0 and varS = 0 -> both NULL
    val const = mk(Seq(4L, 4L, 4L))
    assert(const.isNullAt(3) && const.isNullAt(4))
  }

  test("cramersV: perfect diagonal = 1, uniform independence = 0, " +
      "single-level column NULL") {
    import graft.ops.Stats
    val diag = frame("a" -> Seq("x", "x", "y", "y"),
      "b" -> Seq("p", "p", "q", "q"))
    assert(Stats.cramersV(diag, "a", "b").collect()(0).getDouble(3) === 1.0)
    val unif = frame("a" -> Seq("x", "x", "y", "y"),
      "b" -> Seq("p", "q", "p", "q"))
    assert(Stats.cramersV(unif, "a", "b").collect()(0).getDouble(3) === 0.0)
    val one = frame("a" -> Seq("x", "x", "x"), "b" -> Seq("p", "q", "p"))
    assert(Stats.cramersV(one, "a", "b").collect()(0).isNullAt(3))
  }

  test("wasserstein1: identical = 0, point masses = distance, hand " +
      "interleave = 5, shift by c = c, empty cohort NULL") {
    import graft.ops.Stats
    def w1(as: Seq[Long], bs: Seq[Long]): org.apache.spark.sql.Row = {
      val df = frame(
        "g" -> (as.map(_ => "A") ++ bs.map(_ => "B")),
        "v" -> (as ++ bs))
      Stats.wasserstein1(df, "g", col("v"), "A", "B").collect()(0)
    }
    assert(w1(Seq(1L, 2L, 9L), Seq(1L, 2L, 9L)).getDouble(4) === 0.0)
    assert(w1(Seq(0L, 0L), Seq(10L, 10L)).getDouble(4) === 10.0)
    // {0,10} vs {5,5}: each unit moves 5
    assert(w1(Seq(0L, 10L), Seq(5L, 5L)).getDouble(4) === 5.0)
    // shift invariance: B = A + 3
    assert(w1(Seq(1L, 3L, 7L), Seq(4L, 6L, 10L)).getDouble(4) === 3.0)
    // asymmetric sizes: {0} vs {0,6}: F_a steps to 1 at 0, F_b to 1/2
    // then 1 at 6 -> integral = 1/2 * 6 = 3
    assert(w1(Seq(0L), Seq(0L, 6L)).getDouble(4) === 3.0)
    val empty = w1(Seq(1L, 2L), Seq.empty)
    assert(empty.getLong(3) === 0L && empty.isNullAt(4))
  }

  test("amsF2: exact moment correct; estimate bitwise-equal to an " +
      "independent JVM replay; never-set bits count full n") {
    import graft.ops.Sketches
    val keys = (1L to 40L).map(i => s"k${i % 7}") // 7 keys, skewed counts
    val df = frame("k" -> keys)
    val out = Sketches.amsF2(df, col("k"), b = 8, groups = 4, salt = "t")
      .collect()(0)
    val byKey = keys.groupBy(identity).view.mapValues(_.size.toLong)
    assert(out.getLong(0) === 40L)
    assert(out.getLong(1) === 7L)
    assert(out.getLong(2) === byKey.values.map(c => c * c).sum)
    // JVM replay: counter_r = n - 2*|{rows with md5 bit r set}|
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val hs = keys.map(k => hex(s"t:$k"))
    val ctrs = (0 until 8).map { r =>
      val c1 = hs.count { h =>
        val v = "0123456789abcdef".indexOf(h(r / 4))
        ((v >> (r % 4)) & 1) == 1 }
      40L - 2L * c1
    }
    val means = ctrs.grouped(2).map(g =>
      g.map(c => c * c).sum.toDouble / 2.0).toSeq.sorted
    val est = (means(1) + means(2)) / 2.0
    assert(out.getDouble(3) === est)
    assert(out.getDouble(4) ===
      BigDecimal((est - out.getLong(2).toDouble) / out.getLong(2).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("holtWintersDaily: hand one-step update; periodic series is a " +
      "fixed point; short series omitted") {
    // build one event per (type, day, i) so daily counts are exact
    def ev(tp: String, counts: Seq[Long]): Seq[(String, Long)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (1L to c).map(_ => (tp, day(d.toLong))) }
    // A: 7 flat days at 7 then a 10 -> l=8.5, b=0.75, s0=0.75;
    //    s_next is slot 1 (= 0.0), forecast 9.25
    val a = ev("A", Seq(7L, 7L, 7L, 7L, 7L, 7L, 7L, 10L))
    // B: two perfect weekly cycles 1..7 -> fixed point: l=4, b=0,
    //    s = [-3..3]; n=14 -> s_next slot 0 = -3, forecast 1
    val b = ev("B", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L,
      1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // C: only 6 days -> below period+1, omitted
    val c = ev("C", Seq(1L, 1L, 1L, 1L, 1L, 1L))
    val all = a ++ b ++ c
    val df = frame("event_type" -> all.map(_._1),
      "ts_ns" -> all.map(_._2))
    val out = EventAnalytics.holtWintersDaily(df, period = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out.keySet === Set("A", "B"))
    assert(out("A") === ((8L, 8.5, 0.75, 0.0, 9.25)))
    assert(out("B") === ((14L, 4.0, 0.0, -3.0, 1.0)))
  }

  test("isotonicCalibration: fitted non-decreasing, preserves weighted " +
      "mass, equals an independent JVM minimax over the same bins") {
    import graft.ops.TextAnalysis
    val docs = frame(
      "doc_id" -> (1L to 60L),
      "text" -> (1L to 60L).map(i =>
        s"tok$i word${i % 9} filler${i % 5} x${i % 13} y${i % 3}"),
      "lang" -> (1L to 60L).map(i => if (i % 3 == 0) "en" else "de"))
    val out = TextAnalysis.isotonicCalibration(docs, dims = 64, bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    // monotone non-decreasing
    assert(out.map(_._4).sliding(2).forall(s =>
      s.length < 2 || s(0) <= s(1)))
    // PAV preserves the weighted total: sum n*fitted == sum n_pos
    // (up to the round-6 on fitted)
    val mass = out.map { case (_, n, _, f) => n * f }.sum
    assert(math.abs(mass - out.map(_._3).sum.toDouble) < 1e-3)
    // independent minimax replay: fitted_i = max_{j<=i} min_{k>=i}
    // mean(j..k) over the same (n, n_pos) bins
    val ns = out.map(_._2)
    val ps = out.map(_._3)
    val b = out.length
    def mean(j: Int, k: Int): Double =
      (j to k).map(ps).sum.toDouble / (j to k).map(ns).sum.toDouble
    val expect = (0 until b).map(i =>
      (0 to i).map(j => (i until b).map(k => mean(j, k)).min).max)
    out.zip(expect).foreach { case ((_, _, _, f), e) =>
      assert(f === BigDecimal(e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("decisionStump: perfect split found, interleaved hand case with " +
      "double-tie broken on smaller threshold, pure labels") {
    import graft.ops.Stats
    val perfect = frame("v" -> Seq(1L, 2L, 3L, 4L),
      "y" -> Seq(true, true, false, false))
    val p = Stats.decisionStump(perfect, col("v"), col("y")).collect()(0)
    // (n, n_pos, threshold, gini_split, gain, ln, lp, rn, rp)
    assert(p.toSeq === Seq(4L, 2L, 2L, 0.0, 2.0, 2L, 2L, 2L, 0L))
    // alternating labels: W(1) = W(3) = 4/3 < W(2) = 2 -> tie at
    // thresholds 1 and 3, argmin takes v = 1
    val alt = frame("v" -> Seq(1L, 2L, 3L, 4L),
      "y" -> Seq(true, false, true, false))
    val a = Stats.decisionStump(alt, col("v"), col("y")).collect()(0)
    assert(a.getLong(2) === 1L)
    assert(a.getDouble(3) === 1.333333)
    assert(a.getDouble(4) === 0.666667)
    // pure labels: every split has W = 0; smallest threshold wins
    val pure = frame("v" -> Seq(5L, 7L, 9L), "y" -> Seq(true, true, true))
    val u = Stats.decisionStump(pure, col("v"), col("y")).collect()(0)
    assert(u.getLong(2) === 5L && u.getDouble(4) === 0.0)
    // a single-valued feature has no candidate split: ZERO rows (the
    // SQL twin's empty-best behavior, not an all-NULL row)
    val flat = frame("v" -> Seq(3L, 3L, 3L), "y" -> Seq(true, false, true))
    assert(Stats.decisionStump(flat, col("v"), col("y")).count() === 0L)
  }

  test("ppmiTopPairs: hand-computed collocations, window-2 reach, " +
      "self-pairs excluded, negative PMI clamps to 0") {
    import graft.ops.TextAnalysis
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // "a b a b": d1 -> {a,b}x3, d2 self-pairs (a,a)/(b,b) EXCLUDED
    // "c d x":   d1 -> {c,d},{d,x}; d2 -> {c,x}  => P = 6
    val docs = frame("doc_id" -> Seq(1L, 2L),
      "text" -> Seq("a b a b", "c d x"))
    val out = TextAnalysis.ppmiTopPairs(docs, window = 2, k = 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.length === 4)
    // top by count then lexicographic
    assert(out(0) === (("a", "b", 3L, 3L, 3L, r6(math.log(8.0)))))
    assert(out(1) === (("c", "d", 1L, 2L, 2L, r6(math.log(6.0)))))
    assert(out(2) === (("c", "x", 1L, 2L, 2L, r6(math.log(6.0)))))
    assert(out(3) === (("d", "x", 1L, 2L, 2L, r6(math.log(6.0)))))
    // anti-associated pair: {a,b} once while a and b each sit in 10
    // pairs -> 4*P*c = 76 < s_a*s_b = 100 -> PMI < 0 -> clamped 0
    val anti = frame("doc_id" -> (1L to 19L),
      "text" -> ((1L to 9L).map(_ => "a c") ++
        (1L to 9L).map(_ => "b d") :+ "a b"))
    val ab = TextAnalysis.ppmiTopPairs(anti, window = 2, k = 30)
      .collect().find(r => r.getString(0) == "a" && r.getString(1) == "b")
      .get
    assert(ab.getLong(2) === 1L && ab.getLong(3) === 10L &&
      ab.getLong(4) === 10L)
    assert(ab.getDouble(5) === 0.0)
  }

  test("kmvJoinEstimate: m<k exact branch, identical sets collapse, " +
      "disjoint sets clamp with NULL rel_err, JVM k-min replay") {
    import graft.ops.Sketches
    // tiny sets under k: every estimate is the exact count
    val a = frame("k" -> (1L to 10L))
    val b = frame("k" -> (6L to 15L))
    val r = Sketches.kmvJoinEstimate(a, col("k"), b, col("k"), k = 256)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((10L, 10L, 5L)))
    assert(r.getDouble(4) === 10.0 && r.getDouble(5) === 10.0)
    assert(r.getDouble(6) === 15.0) // union exact
    assert(r.getDouble(7) === 5.0)  // inclusion-exclusion exact here
    assert(r.getDouble(8) === 0.0)
    // identical sets: union sketch == each sketch -> est_inter = est_a
    val big = frame("k" -> (1L to 500L))
    val same = Sketches.kmvJoinEstimate(big, col("k"), big, col("k"),
      k = 16).collect()(0)
    assert(same.getDouble(7) === same.getDouble(4))
    // JVM replay of the k=16 sketch estimate
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(s: String): Long = {
      val hex = md.digest(s"kmvj:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val mins = (1L to 500L).map(i => hv(i.toString)).distinct
      .sorted.take(16)
    val expect = BigDecimal(15.0 * 4294967296.0 / mins.last.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(same.getDouble(4) === expect)
    // disjoint: exact inter 0 -> rel_err NULL; estimate clamped >= 0
    val c = frame("k" -> (1000L to 1499L))
    val dj = Sketches.kmvJoinEstimate(big, col("k"), c, col("k"), k = 16)
      .collect()(0)
    assert(dj.getLong(3) === 0L && dj.isNullAt(8))
    assert(dj.getDouble(7) >= 0.0)
  }

  test("jlProject: JVM sign-matrix replay bitwise; coordinates " +
      "integer-valued; scaled copies stay cosine-1 after projection") {
    import graft.functions.Similarity
    val vecs = Seq(
      1L -> Seq(0.5, -0.25, 0.125, 0.3),
      2L -> Seq(1.0, -0.5, 0.25, 0.6), // 2x of vec 1 -> cosine 1
      3L -> Seq(-0.4, 0.1, 0.9, -0.2))
    val df = frame("vec_id" -> vecs.map(_._1),
      "embedding" -> vecs.map(_._2))
    val out = Similarity.jlProject(df, inDims = 4, outDims = 2)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1)).toMap
    // JVM replay: q_i = round(x*2^14); y_j = sum q_i * s(i,j)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val hex = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      1.0 - 2.0 * ("0123456789abcdef".indexOf(hex(0)) % 2)
    }
    for ((id, xs) <- vecs) {
      val q = xs.map(x => math.round(x * 16384.0).toDouble)
      val want = (0 until 2).map(j =>
        q.zipWithIndex.map { case (v, i) => v * sign(i, j) }.sum)
      assert(out(id) === want, s"vec $id projection diverges")
      assert(out(id).forall(y => y == math.rint(y)),
        s"vec $id has non-integer coordinates")
    }
    // the scaled copy is each other's projected top-1 at cosine 1
    val top = Similarity.jlTopK(df.filter(col("vec_id") === 1L), df,
      k = 1, inDims = 4, outDims = 2).collect()(0)
    assert(top.getLong(2) === 2L && top.getDouble(3) === 1.0)
  }

  test("hits: hand-iterated bipartite fixed point (3 rounds of exact " +
      "floor arithmetic); max node pins score 1.0") {
    // p1 -> {s1, s2}, p2 -> {s1}; SCALE = 1e6. Hand iteration:
    // a1: s1=1e6, s2=5e5 | h1: p1=1e6, p2=666666
    // a2: s1=1e6, s2=600000 | h2: p1=1e6, p2=625000
    // a3: s1=1e6, s2=615384 | h3: p1=1e6, p2=619047
    val e = frame("src" -> Seq(1L, 1L, 2L), "dst" -> Seq(101L, 102L, 101L))
    val out = graft.ops.Graphs.hits(e, iters = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("hub", 1L)) === ((1L, 1.0)))
    assert(out(("hub", 2L)) === ((2L, 0.619047)))
    assert(out(("authority", 101L)) === ((1L, 1.0)))
    assert(out(("authority", 102L)) === ((2L, 0.615384)))
  }

  test("cupedReadout: perfectly-correlated covariate equalizes " +
      "adjusted means (theta = 1, rho^2 = 1); zero pre-variance NULLs") {
    import graft.ops.Experiments
    // y = x + 100 cents exactly: theta = 1, var_reduction = 1, and
    // every variant's adjusted mean collapses to xbar + 100 = 350
    val users = Seq(1L, 2L, 3L, 4L)
    val pre = users.zip(Seq(1.0, 2.0, 3.0, 4.0))
    val post = users.zip(Seq(2.0, 3.0, 4.0, 5.0))
    val ev = frame(
      "user_id" -> (pre.map(_._1) ++ post.map(_._1)),
      "event_type" -> Seq.fill(8)("purchase"),
      "ts_ns" -> (pre.map(_ => 1L) ++ post.map(_ => 2000L)),
      "value" -> (pre.map(_._2) ++ post.map(_._2)))
    val out = Experiments.cupedReadout(ev, cutNs = 1000L, nVariants = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((_, r) <- out) {
      assert(r.getDouble(3) === 350.0, "adjusted mean must equalize")
      assert(r.getDouble(4) === 1.0)
      assert(r.getDouble(5) === 1.0)
    }
    assert(out.values.map(_.getLong(1)).sum === 4L)
    // constant pre-period -> var(x) = 0 -> theta/adjustment NULL
    val flat = frame(
      "user_id" -> users, "event_type" -> Seq.fill(4)("purchase"),
      "ts_ns" -> Seq.fill(4)(2000L),
      "value" -> Seq(2.0, 3.0, 4.0, 5.0))
    val f = Experiments.cupedReadout(flat, cutNs = 1000L, nVariants = 2)
      .collect()
    assert(f.forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)))
  }

  test("brierDecomposition: equals an independent JVM replay; gap " +
      "(within-bin forecast variance) non-negative; identity holds") {
    import graft.ops.TextAnalysis
    val docs = frame(
      "doc_id" -> (1L to 80L),
      "text" -> (1L to 80L).map(i =>
        s"alpha$i beta${i % 7} gamma${i % 11} delta${i % 3}"),
      "lang" -> (1L to 80L).map(i => if (i % 4 == 0) "en" else "fr"))
    val r = TextAnalysis.brierDecomposition(docs, dims = 64, bins = 10)
      .collect()(0)
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // JVM replay over the scored docs
    val scored = TextAnalysis.classifierScore(docs, 64, "text", "doc_id",
        carry = Seq("lang"))
      .select(col("prob"), (col("lang") === "en").cast("long").as("y"))
      .collect().map(x => (BigDecimal(x.getDouble(0)), x.getLong(1)))
    val n = scored.length
    val brier = scored.map { case (p, y) =>
      (p - BigDecimal(y)).pow(2) }.sum.toDouble / n
    val tp = scored.map(_._2).sum
    val yBar = tp.toDouble / n.toDouble
    val byBin = scored.groupBy { case (p, _) =>
      math.min((p * 10).toDouble.floor.toLong, 9L) }
    val rel = byBin.values.map { g =>
      val nk = g.length.toDouble
      val d = g.map(_._1).sum.toDouble / nk - g.map(_._2).sum / nk
      BigDecimal(nk * d * d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble / n
    val res = byBin.values.map { g =>
      val nk = g.length.toDouble
      val d = g.map(_._2).sum / nk - yBar
      BigDecimal(nk * d * d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble / n
    val unc = yBar * (1.0 - yBar)
    assert(r.getLong(0) === n.toLong)
    assert(r.getDouble(1) === r6(brier))
    assert(r.getDouble(2) === r6(rel))
    assert(r.getDouble(3) === r6(res))
    assert(r.getDouble(4) === r6(unc))
    // gap = within-bin forecast variance: always >= 0 (round-6 slack)
    assert(r.getDouble(5) >= -1e-6)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("stlDecompose: perfect weekly cycle gives exact indices and " +
      "strength 1; constant series gives zero indices and NULL strength") {
    def ev(tp: String, counts: Seq[Long]): Seq[(String, Long)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (1L to c).map(_ => (tp, day(d.toLong))) }
    // A: y(d) = (d % 7) + 1 over 21 days -> any 7-day mean = 4, so
    // seasonal_idx(dow) = dow - 3 exactly and SSW = 0 -> strength 1
    val a = ev("A", (0 until 21).map(d => (d % 7 + 1).toLong))
    // B: constant 2 over 10 days -> detrended all 0
    val b = ev("B", Seq.fill(10)(2L))
    val all = a ++ b
    val df = frame("event_type" -> all.map(_._1),
      "ts_ns" -> all.map(_._2))
    val out = graft.ops.EventAnalytics.stlDecompose(df)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    for (w <- 0L to 6L) {
      val r = out(("A", w))
      assert(r.getDouble(3) === (w - 3).toDouble,
        s"dow $w index diverges")
      assert(r.getDouble(4) === 1.0)
    }
    for (w <- 0L to 6L if out.contains(("B", w))) {
      val r = out(("B", w))
      assert(r.getDouble(3) === 0.0)
      assert(r.isNullAt(4)) // SST = 0
    }
    assert((0L to 6L).count(w => out.contains(("B", w))) >= 1)
  }

  test("mmrTopK: diversity beats redundancy at low lambda; hand-exact " +
      "decimal scores; redundant twin demoted to last") {
    import graft.functions.Similarity
    // q=(1,1); A=(1,1) twin A'=(2,2) (both sim 1); B=(1,0) diverse
    // (sim 0.707107). lambda=0.3: step2 B (-0.282843) beats A' (-0.4)
    val vecs = Seq(1L -> Seq(1.0, 1.0), 2L -> Seq(1.0, 1.0),
      3L -> Seq(2.0, 2.0), 4L -> Seq(1.0, 0.0))
    val df = frame("vec_id" -> vecs.map(_._1),
      "embedding" -> vecs.map(_._2))
    val out = Similarity.mmrTopK(df.filter(col("vec_id") === 1L), df,
      k = 3, poolSize = 3, lambda = 0.3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 2L, 0.3), (2L, 4L, -0.282843),
      (3L, 3L, -0.4)))
    // high lambda keeps the redundant twin second (relevance wins)
    val rel = Similarity.mmrTopK(df.filter(col("vec_id") === 1L), df,
      k = 2, poolSize = 3, lambda = 0.9)
      .collect().map(r => r.getLong(2))
    assert(rel.toSeq === Seq(2L, 3L))
  }

  test("dpNoisyCounts: bitwise JVM replay of the Laplace draw; " +
      "noisy - exact == noise; scale shrinks with epsilon") {
    import graft.ops.Integrity
    val df = frame("g" -> Seq("a", "a", "a", "b", "b", "c"),
      "x" -> Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val out = Integrity.dpNoisyCounts(df, "g", epsilon = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
    def noiseOf(g: String, eps: Double): Double = {
      val hex = md.digest(s"dp:$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val hv = java.lang.Long.parseLong(hex.take(8), 16)
      val u = (hv.toDouble + 0.5) / 4294967296.0
      (-1.0 / eps) * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    val counts = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    for ((g, n) <- counts) {
      val (ne, noise, noisy) = out(g)
      assert(ne === n)
      assert(noise === r6(noiseOf(g, 1.0)))
      assert(noisy === r6(n.toDouble + noiseOf(g, 1.0)))
    }
    // tighter privacy budget -> proportionally larger noise
    val wide = Integrity.dpNoisyCounts(df, "g", epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (g <- counts.keys)
      assert(wide(g) === r6(noiseOf(g, 0.5)))
    assert(math.abs(wide("a")) > math.abs(out("a")._2))
  }

  test("kCore: tail peels off a triangle and converges; a chain " +
      "dissolves to the empty 2-core") {
    import graft.ops.Graphs
    // triangle 1-2-3 with tail 3-4: round 1 removes node 4 (deg 1),
    // the triangle is the stable 2-core
    val tri = frame("part_a" -> Seq(1L, 1L, 2L, 3L),
      "part_b" -> Seq(2L, 3L, 3L, 4L))
    val out = Graphs.kCore(tri, k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq((0L, 4L, 4L, true), (1L, 3L, 3L, true),
      (2L, 3L, 3L, true)))
    // path 1-2-3-4: endpoints peel, then the middle edge, then empty
    val chain = frame("part_a" -> Seq(1L, 2L, 3L),
      "part_b" -> Seq(2L, 3L, 4L))
    val c = Graphs.kCore(chain, k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(c.toSeq === Seq((0L, 4L, 3L, true), (1L, 2L, 1L, true),
      (2L, 0L, 0L, true), (3L, 0L, 0L, true)))
  }

  test("sessionFlows: entry/exit under the (ts, id) order, gap splits " +
      "sessions, bounces counted, per-user isolation") {
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 1L, 2L),
      "event_type" -> Seq("view", "click", "purchase", "view"),
      "ts_ns" -> Seq(sec(0), sec(10), sec(4000), sec(5)),
      "event_id" -> Seq(1L, 2L, 3L, 4L))
    val out = graft.ops.EventWindows.sessionFlows(ev, gapSec = 1800)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(("view", "click")) === ((1L, 0L, 0.0, 2.0)))
    assert(out(("purchase", "purchase")) === ((1L, 1L, 1.0, 1.0)))
    assert(out(("view", "view")) === ((1L, 1L, 1.0, 1.0)))
    assert(out.size === 3)
  }

  test("shapleyAttribution: hand 2-channel game; efficiency axiom") {
    // u1: set {a}, converts; u2: set {b}, does not -> v(a)=1, v(b)=0,
    // v(ab)=v(empty)=0 (absent). phi_a = (1*(v(a)-v(0)) +
    // 1*(v(ab)-v(b)))/2 = 0.5; phi_b = (0 + (0-1))/2 = -0.5
    val ev = frame(
      "user_id" -> Seq(1L, 1L, 2L),
      "event_type" -> Seq("a", "purchase", "b"),
      "ts_ns" -> Seq(sec(1), sec(2), sec(1)),
      "event_id" -> Seq(1L, 2L, 3L))
    val out = EventAnalytics.shapleyAttribution(ev).orderBy("channel")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out.toSeq === Seq("a" -> 0.5, "b" -> -0.5))
    // efficiency: sum phi = v(full) - v(empty) = 0 - 0 = 0
    assert(out.map(_._2).sum === 0.0)
  }

  test("sprtAudit: H1 crossing at the hand-computed user index; " +
      "llr_end is the exact integer-weighted sum") {
    // 10 users, arrival = entry day = user id; first 6 convert.
    // p0=0.2, p1=0.8: la = ln(4) = 1.386294361120 (round-12),
    // lb = ln(0.25) = -1.386294361120; upper bound ln(19) = 2.944438979166.
    // Cumulative LLR: k*la while converting -> crosses at k=3
    // (3*1.386294361120 = 4.158883 >= 2.944439). End: 6*la + 4*lb = 2*la
    // = 2.772588722240 -> round 6 = 2.772589.
    val users = (1L to 10L)
    val ev = frame(
      "user_id" -> users.toSeq,
      "event_type" -> users.map(u => if (u <= 6) "purchase" else "view").toSeq,
      "value" -> users.map(_ => 200.0).toSeq,
      "ts_ns" -> users.map(u => day(u)).toSeq)
    val out = Experiments.sprtAudit(ev, nVariants = 1, salt = "s",
      p0 = 0.2, p1 = 0.8).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 10L) // n_users
    assert(r.getLong(2) === 6L)  // n_conv
    assert(r.getDouble(3) === 2.772589) // llr_end
    assert(r.getLong(4) === 3L)  // first_cross_n
    assert(r.getString(5) === "accept_h1")
  }

  test("sprtAudit: H0 crossing on an all-miss arrival stream; ARRIVAL " +
      "order (not user id) drives the crossing index") {
    // 5 users, none convert, p0=0.2/p1=0.8: each step adds
    // lb = -1.386294361120; lower bound -2.944438979166 -> k=2 is
    // -2.772589 (not crossed), k=3 = -4.158883 -> accept_h0 at 3.
    // Entries are REVERSED (user 5 arrives first) — the op must order
    // by entry time; a user_id order would be identical here, so also
    // plant a converter at the LAST arrival (user 1): the crossing at
    // k=3 happens before that conversion can matter.
    val users = (1L to 5L)
    val ev = frame(
      "user_id" -> users.toSeq,
      "event_type" -> users.map(u => if (u == 1L) "purchase" else "view").toSeq,
      "value" -> users.map(_ => 200.0).toSeq,
      "ts_ns" -> users.map(u => day(10L - u)).toSeq)
    val out = Experiments.sprtAudit(ev, nVariants = 1, salt = "s",
      p0 = 0.2, p1 = 0.8).collect()
    val r = out(0)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 1L)
    assert(r.getLong(4) === 3L)
    assert(r.getString(5) === "accept_h0")
    // llr_end = 1*la + 4*lb = -3*1.386294361120 -> round 6
    assert(r.getDouble(3) === -4.158883)
  }

  test("sprtAudit: continue when neither Wald boundary is reached") {
    val users = (1L to 3L)
    val ev = frame(
      "user_id" -> users.toSeq,
      "event_type" -> users.map(u => if (u == 2L) "purchase" else "view").toSeq,
      "value" -> users.map(_ => 200.0).toSeq,
      "ts_ns" -> users.map(u => day(u)).toSeq)
    // p0=0.4/p1=0.6: |increment| = ln(1.5) = 0.405465108108; 3 steps
    // cannot reach +-2.944439
    val r = Experiments.sprtAudit(ev, nVariants = 1, salt = "s",
      p0 = 0.4, p1 = 0.6).collect()(0)
    assert(r.getLong(4) === -1L)
    assert(r.getString(5) === "continue")
    // 1*la + 2*lb = 0.405465108108 - 2*0.405465108108 = -0.405465108108
    assert(r.getDouble(3) === -0.405465)
  }

  test("diffInDiff: hand-computed panel means, SE from the documented " +
      "two-sample formula; non-purchase events anchor but don't spend") {
    // days 0..10 -> split = (0 + 10 + 1) / 2 = 5. Each user buys a_u
    // pre (day 1) and b_u post (day 9); delta_u = b_u - a_u dollars.
    val users = (1L to 8L)
    val aU = users.map(u => 10.0 + u).toSeq
    val bU = users.map(u => 20.0 + 3.0 * u).toSeq // delta = 10 + 2u
    val ev = frame(
      "user_id" -> (users ++ users ++ Seq(1L, 2L)).toSeq,
      "event_type" -> (users.map(_ => "purchase") ++
        users.map(_ => "purchase") ++ Seq("view", "view")).toSeq,
      "value" -> (aU ++ bU ++ Seq(999.0, 999.0)).toSeq,
      "ts_ns" -> (users.map(_ => day(1)) ++ users.map(_ => day(9)) ++
        Seq(day(0), day(10))).toSeq)
    val out = Experiments.diffInDiff(ev, salt = "s").collect()(0)
    val arm = users.groupBy(u => refVariant(u, 2, "s"))
    val deltas = (v: Int) => arm(v).map(u => 10.0 + 2.0 * u)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def svar(xs: Seq[Double]) = {
      val m = mean(xs)
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val (dt, dc) = (deltas(1), deltas(0))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(0) === arm(1).size.toLong)
    assert(out.getLong(1) === arm(0).size.toLong)
    assert(out.getDouble(2) === r6(mean(dt)))
    assert(out.getDouble(3) === r6(mean(dc)))
    assert(out.getDouble(4) === r6(mean(dt) - mean(dc)))
    val se = math.sqrt(svar(dt) / dt.size + svar(dc) / dc.size)
    assert(math.abs(out.getDouble(5) - se) < 1e-6)
    assert(math.abs(out.getDouble(6) - (mean(dt) - mean(dc)) / se) < 1e-5)
  }

  test("changepointDaily: planted level shift found at the exact scaled-" +
      "CUSUM argmax; flat series takes the earliest k; single-day type " +
      "dropped") {
    // type 'shift': days 0-4 have 2 events, days 5-9 have 8.
    // g_k = |10*S_k - 50k| peaks at k=5 (g=150), cp_day=4,
    // means 2.0 / 8.0.
    val shiftRows = (0L to 4L).flatMap(d => Seq.fill(2)(d)) ++
      (5L to 9L).flatMap(d => Seq.fill(8)(d))
    val flatRows = (0L to 3L).flatMap(d => Seq.fill(3)(d))
    val oneRows = Seq(7L)
    val all = shiftRows.map(("shift", _)) ++ flatRows.map(("flat", _)) ++
      oneRows.map(("one", _))
    val ev = frame(
      "user_id" -> all.indices.map(_.toLong),
      "event_type" -> all.map(_._1),
      "ts_ns" -> all.map(t => day(t._2)))
    val out = graft.ops.Stats.changepointDaily(ev).orderBy("event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("shift") === ((10L, 4L, 150L, 2.0, 8.0)))
    // flat: all g_k = 0, earliest k wins -> cp after day 0
    assert(out("flat") === ((4L, 0L, 0L, 3.0, 3.0)))
    assert(!out.contains("one"))
  }

  test("readability: hand-computed Flesch on punctuated fixtures; " +
      "no-vowel words count one syllable; fragment = one sentence") {
    // doc A: "the cat sat. it ran!" -> W=5, S=2 ('.'+'!' runs),
    // syllables: the(1) cat(1) sat.(1) it(1) ran!(1) = 5
    // num = 206835*2*5 - 1015*25 - 84600*5*2 = 2068350-25375-846000
    //     = 1196975; den = 2*5; f6 = round(1196975*1000/10)
    //     = 119697500 -> flesch 119.6975
    // doc B: "7 b zz" -> W=3, S=1, vowel runs=0, no-vowel words=3 ->
    // syl=3; num = 206835*3 - 1015*9 - 84600*3 = 620505-9135-253800
    //     = 357570; den=3; f6 = round(357570*1000/3) = 119190000
    // source mean_flesch = round((119697500+119190000)/2)/1e6
    //     = 119443750/1e6 = 119.44375
    val docs = frame(
      "source" -> Seq("s1", "s1"),
      "text" -> Seq("the cat sat. it ran!", "7 b zz"))
    val r = TextAnalysis.readability(docs).collect()(0)
    assert(r.getString(0) === "s1")
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 4.0) // (5+3)/2
    assert(r.getDouble(3) === 1.0) // 8 syllables / 8 words
    assert(r.getDouble(4) === 119.44375)
    assert(r.getDouble(5) === 0.0)
  }

  test("readability: negative-score doc rounds away from zero; " +
      "share_hard counts below-threshold docs") {
    // one long unpunctuated "word soup" whose score goes negative:
    // W=250 identical 1-syllable words, S=1, syl=250:
    // num = 206835*250 - 1015*62500 - 84600*250
    //     = 51708750 - 63437500 - 21150000 = -32878750
    // f6 = -round(32878750*1000/250) = -131515000 -> -131.515
    val text = Seq.fill(250)("cat").mkString(" ")
    val r = TextAnalysis.readability(
      frame("source" -> Seq("s"), "text" -> Seq(text))).collect()(0)
    assert(r.getDouble(4) === -131.515)
    assert(r.getDouble(5) === 1.0) // below 30
  }

  test("woeIv: hand-computed two-bin screen; IV from exact decimal " +
      "terms; degenerate single-class feature yields NULL woe/iv") {
    // 8 rows, 2 bins of 4. values 1..8; labels: bin0 has 3 good/1 bad,
    // bin1 has 1 good/3 bad. G=4, B=4.
    // woe0 = ln((3/4)/(1/4)) = ln(3) = 1.098612; term0 = (0.5)*1.098612
    // woe1 = ln((1/4)/(3/4)) = -1.098612; term1 = (-0.5)*(-1.098612)
    // iv = 1.098612 (sum of round-12 terms, exact)
    val df = frame(
      "v" -> (1 to 8).map(_.toDouble),
      "l" -> Seq(1, 1, 1, 0, 0, 1, 0, 0))
    val out = graft.ops.Profiling.woeIv(df, "v", "l", bins = 2)
      .orderBy("bin").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 4L && out(0).getLong(2) === 3L &&
      out(0).getLong(3) === 1L)
    assert(out(0).getDouble(4) === 0.75 && out(0).getDouble(5) === 0.25)
    assert(out(0).getDouble(6) === 1.098612)
    assert(out(1).getDouble(6) === -1.098612)
    assert(out(0).getDouble(7) === 1.098612)
    // all-good labels: B = 0 -> woe/iv NULL, shares of the good side ok
    val deg = graft.ops.Profiling.woeIv(
      frame("v" -> (1 to 4).map(_.toDouble), "l" -> Seq(1, 1, 1, 1)),
      "v", "l", bins = 2).orderBy("bin").collect()
    assert(deg.forall(_.isNullAt(6)) && deg.forall(_.isNullAt(7)))
    assert(deg(0).getDouble(4) === 0.5)
  }

  test("woeIv: tied values share a rank and land in one bin (no " +
      "arbitrary tie split across a bin edge)") {
    // 4 copies of the same value with bins=2: all share rank 1 ->
    // bin 0 holds all 4 rows, bin 1 is absent
    val out = graft.ops.Profiling.woeIv(
      frame("v" -> Seq(5.0, 5.0, 5.0, 5.0), "l" -> Seq(1, 0, 1, 0)),
      "v", "l", bins = 2).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 0L && out(0).getLong(1) === 4L)
  }

  test("fdAudit: g3 violation counting; exact FD certifies at 0") {
    val df = frame(
      "a" -> Seq(1L, 1L, 1L, 2L, 3L, 3L),
      "b" -> Seq("x", "x", "y", "x", "y", "y"))
    val r = Integrity.fdAudit("t.a->b", df, "a", "b").collect()(0)
    assert(r.getString(0) === "t.a->b")
    assert(r.getLong(1) === 6L) // n_rows
    assert(r.getLong(2) === 3L) // n_keys
    assert(r.getLong(3) === 1L) // only key 1 violates
    assert(r.getLong(4) === 1L) // one row to delete
    assert(r.getDouble(5) === 0.166667)
    val uniq = frame("a" -> Seq(1L, 2L, 3L), "b" -> Seq("x", "x", "y"))
    val r2 = Integrity.fdAudit("u.a->b", uniq, "a", "b").collect()(0)
    assert(r2.getLong(4) === 0L && r2.getDouble(5) === 0.0)
  }
}
