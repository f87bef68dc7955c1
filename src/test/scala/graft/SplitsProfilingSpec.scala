package graft

import graft.functions.Similarity
import graft.ops.{Experiments, Profiling, Splits}
import org.apache.spark.sql.functions._

/** Backfill specs for the round-12 snapshot four (x225-x228) plus the
  * round-13 guard contracts: quantileNormalize golden, kFoldAudit
  * spread/determinism properties, negativePairs cross-stratum +
  * volume-guard, srmCheck planted-imbalance + empty-arm contribution,
  * mmrTopK driver-pool cap.
  */
class SplitsProfilingSpec extends SparkSuite {

  /** JVM reference of Experiments' md5 variant assignment. */
  private def refVariant(userId: Long, n: Int, salt: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$salt:$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % n).toInt
  }

  // ---- x225 quantileNormalize ------------------------------------------

  test("quantileNormalize: two known distributions map onto the pooled " +
      "quantiles — normalized means equal across sources, exact golden") {
    // A = {1,2,3,4}, B = {10,20,30,40}; pooled = all eight, one each.
    // Target index for rank r of 4 is ceil(r*8/4) = 2r -> pooled values
    // {2,4,20,40} for BOTH sources (the defining property).
    val d = frame(
      "source" -> Seq("A", "A", "A", "A", "B", "B", "B", "B"),
      "n_chars" -> Seq(1L, 2L, 3L, 4L, 10L, 20L, 30L, 40L))
    val out = Profiling.quantileNormalize(d, "source", "n_chars")
      .orderBy("source").collect()
    assert(out.length === 2)
    val a = out(0); val b = out(1)
    assert(a.getString(0) === "A" && b.getString(0) === "B")
    assert(a.getLong(1) === 4L && a.getLong(2) === 4L) // n_docs, n_vals
    assert(a.getDouble(3) === 2.5) // mean_raw A
    assert(b.getDouble(3) === 25.0) // mean_raw B
    // mean_norm identical: (2+4+20+40)/4 = 16.5 on both sources
    assert(a.getDouble(4) === 16.5 && b.getDouble(4) === 16.5)
    assert(a.getLong(5) === 36L) // |40-4|
    assert(b.getLong(5) === 16L) // |4-20|
  }

  test("quantileNormalize: a source equal to the pool is a fixed point " +
      "(single source -> max_abs_shift 0, mean_norm == mean_raw)") {
    val d = frame(
      "source" -> Seq("only", "only", "only", "only", "only"),
      "n_chars" -> Seq(5L, 5L, 9L, 11L, 30L))
    val r = Profiling.quantileNormalize(d, "source", "n_chars").collect()(0)
    assert(r.getLong(5) === 0L, "single-source shift must be zero")
    assert(r.getDouble(3) === r.getDouble(4))
    assert(r.getLong(1) === 5L && r.getLong(2) === 4L)
  }

  // ---- x226 kFoldAudit --------------------------------------------------

  test("kFoldAudit: every stratum deals round-robin with spread <= 1, " +
      "fold sizes sum back to stratum size, all k folds present") {
    // sizes 7 and 10 against k=3 force uneven cells (3/2/2 and 4/3/3)
    val d = frame(
      "lang" -> ((1 to 7).map(_ => "en") ++ (1 to 10).map(_ => "de")),
      "doc_id" -> (1L to 17L).toSeq)
    val out = Splits.kFoldAudit(d, "lang", "doc_id", k = 3, salt = "cv")
      .orderBy("stratum", "fold").collect()
    assert(out.length === 6) // 2 strata x 3 folds
    val byStratum = out.groupBy(_.getString(0))
    for ((st, rs) <- byStratum) {
      val sizes = rs.map(_.getLong(2))
      assert(rs.map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L, 2L),
        s"missing fold in $st")
      assert(sizes.max - sizes.min <= 1L, s"spread > 1 in $st")
      assert(rs.forall(_.getLong(3) === sizes.max - sizes.min),
        s"spread column wrong in $st")
    }
    assert(byStratum("en").map(_.getLong(2)).sum === 7L)
    assert(byStratum("de").map(_.getLong(2)).sum === 10L)
  }

  test("kFoldAudit: deterministic under a fixed salt; k guard fires") {
    val d = frame(
      "lang" -> (1 to 20).map(i => if (i % 2 == 0) "a" else "b"),
      "doc_id" -> (1L to 20L).toSeq)
    val r1 = rows(Splits.kFoldAudit(d, "lang", "doc_id", 4, "s1")
      .orderBy("stratum", "fold"))
    val r2 = rows(Splits.kFoldAudit(d, "lang", "doc_id", 4, "s1")
      .orderBy("stratum", "fold"))
    assert(r1 === r2)
    intercept[IllegalArgumentException] {
      Splits.kFoldAudit(d, "lang", "doc_id", 1)
    }
  }

  // ---- x227 negativePairs ------------------------------------------------

  test("negativePairs: pairs are strictly cross-stratum, capped at k per " +
      "anchor, anchors respect anchorMod, and the draw is reproducible") {
    val n = 60
    val d = frame(
      "lang" -> (1 to n).map(i => Seq("en", "de", "fr")(i % 3)),
      "doc_id" -> (1L to n.toLong).toSeq)
    val strat = (1 to n).map(i =>
      i.toLong -> Seq("en", "de", "fr")(i % 3)).toMap
    val out = Splits.negativePairs(d, "lang", "doc_id",
      k = 2, buckets = 4, salt = "t", anchorMod = 5)
      .orderBy("anchor_id", "neg_rank").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (aid, ast, cid, cst, rk) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getString(3), r.getLong(4))
      assert(aid % 5 === 0L, "non-anchor id emitted")
      assert(ast !== cst, "same-stratum negative")
      assert(ast === strat(aid) && cst === strat(cid), "stratum corrupted")
      assert(rk >= 1L && rk <= 2L)
    }
    assert(out.groupBy(_.getLong(0)).values.forall(_.length <= 2))
    val again = Splits.negativePairs(d, "lang", "doc_id",
      k = 2, buckets = 4, salt = "t", anchorMod = 5)
      .orderBy("anchor_id", "neg_rank").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // a different salt redraws: at least one anchor's negatives differ
    val redrawn = Splits.negativePairs(d, "lang", "doc_id",
      k = 2, buckets = 4, salt = "u", anchorMod = 5)
      .orderBy("anchor_id", "neg_rank").collect()
    assert(out.map(_.toSeq).toSeq !== redrawn.map(_.toSeq).toSeq)
  }

  test("negativePairs: the O(n^2/buckets) blast radius is refused — " +
      "anchorMod=1 requires an explicit buckets >= 64 opt-in") {
    val d = frame("lang" -> Seq("a", "b"), "doc_id" -> Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Splits.negativePairs(d, "lang", "doc_id", k = 1, buckets = 8,
        anchorMod = 1)
    }
    // explicit opt-in path still works
    val ok = Splits.negativePairs(d, "lang", "doc_id", k = 1,
      buckets = 64, anchorMod = 1)
    assert(ok.columns.contains("neg_rank"))
  }

  // ---- x228 srmCheck ------------------------------------------------------

  test("srmCheck: exact chi-square against JVM-reference arm counts; a " +
      "balanced design does not flag") {
    val users = (1L to 90L)
    val ev = frame("user_id" -> users.toSeq)
    val out = Experiments.srmCheck(ev, nVariants = 3, salt = "s")
      .orderBy("variant").collect()
    val ref = users.groupBy(u => refVariant(u, 3, "s"))
      .view.mapValues(_.size.toLong).toMap
    assert(out.length === 3)
    val n = users.size.toLong
    var chi2 = BigDecimal(0)
    for (v <- 0 to 2) {
      val nv = ref.getOrElse(v, 0L)
      val num = (3L * nv - n).toDouble
      chi2 += BigDecimal(num * num / (3.0 * n))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val expChi = chi2.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (r <- out) {
      assert(r.getLong(1) === ref.getOrElse(r.getLong(0).toInt, 0L))
      assert(r.getDouble(3) === expChi)
    }
  }

  test("srmCheck: an arm with ZERO assigned users still appears and " +
      "contributes its full deviation term (planted imbalance flags)") {
    // keep only users hashing to variants 0 or 1 -> arm 2 is empty
    val kept = (1L to 400L).filter(u => refVariant(u, 3, "s") != 2)
    assert(kept.nonEmpty)
    val out = Experiments.srmCheck(frame("user_id" -> kept),
      nVariants = 3, salt = "s").orderBy("variant").collect()
    assert(out.length === 3, "empty arm must still be reported")
    val arm2 = out(2)
    assert(arm2.getLong(0) === 2L && arm2.getLong(1) === 0L)
    val n = kept.size.toLong
    // arm 2's dev = 0 - n/3, exact 6dp half-up
    val dev6 = -((2L * n * 1000000L + 3L) / 6L)
    assert(arm2.getDouble(2) === dev6.toDouble / 1000000.0)
    // an arm at zero with n >= ~21 pushes chi2 over 13.816: n/3 alone
    assert(arm2.getBoolean(4), "planted total-starvation must flag SRM")
  }

  // ---- mmrTopK driver-pool cap --------------------------------------------

  test("mmrTopK: a corpus-sized query frame fails loudly instead of " +
      "collecting |queries|*poolSize^2 pairs to the driver") {
    val qs = spark.range(41000L)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val cands = spark.range(5L)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrTopK(qs, cands, k = 2, poolSize = 10)
    }
    assert(e.getMessage.contains("driver-pair cap"))
  }
}
