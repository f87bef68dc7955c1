package graft

import org.apache.spark.sql.functions._

/** Pins the literal-inlining ceiling of the driver-side centroid /
  * hyperplane families (round-17 verdict Next #3 / What's wrong #2) —
  * REDEFINED in round 18 by the measured JIT cliff, which bites far
  * below Janino's 64 KB compile limit: HotSpot refuses to JIT methods
  * over ~8,000 bytecode bytes, so a literal argmax at k = 32..128
  * COMPILES fine and then runs interpreted (measured 35–75 s vs
  * 0.4–0.8 s broadcast on a 200k-row corpus — PLANS.md round-18 A/B).
  * nearestCell / withNearestCellSim therefore route to the
  * broadcast-matrix twins past MaxLiteralCentroids = 16, and this spec
  * pins three contracts:
  *   1. the literal form at the bound is JIT-SAFE (method < 8,000 B),
  *      and the cliff the bound protects against is real (k = 32
  *      generates an un-JIT-able method);
  *   2. literal and broadcast forms are BITWISE identical (cell AND
  *      sim), so routing can never change a result;
  *   3. past the bound everything still works map-only — assignment,
  *      and the Lloyd loop training at k > bound.
  */
class CodegenCeilingSpec extends SparkSuite {
  import graft.functions.Similarity

  private def vecs(n: Int, d: Int) = {
    import spark.implicits._
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(d)),
        i => (i * (col("id") + 1) % 97).cast("double") / 97.0)
        .as("embedding"))
  }

  private def cents(k: Int, d: Int): Seq[(Long, Seq[Double])] =
    (0L until k).map(c =>
      c -> (0 until d).map(i => ((c * 31 + i * 7) % 101).toDouble / 101.0))

  private def maxMethodSize(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "projection left whole-stage codegen:\n" +
      plan.toString.take(2000))
    val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
    assert(stats.nonEmpty, "no codegen subtrees found")
    stats.map(_._3.maxMethodCodeSize).max
  }

  test("literal argmax at the routing bound is JIT-safe (< 8000 bytecode " +
      "bytes — the HotSpot limit, not Janino's 64KB)") {
    // the cliff the bound protects against is committed evidence, not
    // re-measured here (bestCentroid itself refuses k > bound, so the
    // un-JIT-able shape is unreachable): at k=32/d=64 the generated
    // method measured 8,641 B and ran 35 s interpreted on 200k rows vs
    // 0.5 s broadcast (PLANS.md round-18 A/B). This test pins the SAFE
    // side: if Spark's codegen ever grows the bound shape past 8000 B,
    // MaxLiteralCentroids must come down.
    val e = col("embedding").cast("array<double>")
    val atBound = maxMethodSize(vecs(40, 64).select(col("vec_id"),
      Similarity.literalNearestCell(e,
        cents(Similarity.MaxLiteralCentroids, 64)).as("cell")))
    assert(atBound > 0 && atBound < 8000,
      s"literal argmax at k=${Similarity.MaxLiteralCentroids} generates " +
        s"a $atBound-byte method — HotSpot stops JIT-compiling at " +
        "~8000 and the routing bound must keep the literal form under " +
        "it (lower MaxLiteralCentroids if codegen grew)")
  }

  test("broadcast-matrix argmax is BITWISE the literal argmax, cell AND " +
      "sim, INCLUDING null embeddings (routing must never change a " +
      "result)") {
    val cs = cents(Similarity.MaxLiteralCentroids, 64)
    val e = col("embedding").cast("array<double>")
    // a null-embedding row rides along: both forms must agree there too
    // (round-18 ADVICE — the bare literal greatest used to resolve the
    // all-null-sim tie to the smallest cent_id while the UDF said null)
    def corpus = vecs(300, 64).union(spark.range(1).select(
      lit(9999L).as("vec_id"), lit(null).cast("array<double>").as("embedding")))
    val both = corpus.select(col("vec_id"),
      Similarity.literalNearestCell(e, cs).as("lit_cell"),
      Similarity.broadcastNearestCell(e, cs).as("bc_cell"))
    assert(both.filter(!(col("lit_cell") <=> col("bc_cell"))).count() == 0,
      "cell assignments diverged between literal and broadcast forms")
    assert(both.filter(col("vec_id") === 9999L)
      .filter(col("lit_cell").isNull && col("bc_cell").isNull).count() == 1,
      "null embedding must map to a NULL cell in BOTH forms")
    // cell+sim twin: literal withNearestCellSim vs the broadcast UDF
    val litSim = Similarity.withNearestCellSim(corpus, e, cs)
      .select(col("vec_id"), col("cell"), col("sim"))
    val bcSim = corpus.select(col("vec_id"),
        Similarity.broadcastNearestCellSim(e, cs).as("_b"))
      .select(col("vec_id"), col("_b._1").as("cell"), col("_b._2").as("sim"))
    val joined = litSim.as("l").join(bcSim.as("b"), "vec_id")
      .filter(!(col("l.cell") <=> col("b.cell")) ||
        !(col("l.sim") <=> col("b.sim")))
    assert(joined.count() == 0,
      "cell+sim diverged between literal and broadcast forms")
  }

  test("past MaxLiteralCentroids, nearestCell routes to the broadcast " +
      "matrix: still map-only, still the right argmax — straight " +
      "through the old k=32..128 interpreted-cliff zone") {
    val k = Similarity.MaxLiteralCentroids + 64 // k=80: inside the cliff
    val cs = cents(k, 64)
    val df = vecs(40, 64).select(col("vec_id"), Similarity.nearestCell(
      col("embedding").cast("array<double>"), cs).as("cell"))
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("Join", "Window", "Exchange"))
      assert(!plan.contains(bad),
        s"broadcast assignment must stay map-only, found $bad:\n" +
          plan.take(2000))
    val got = df.orderBy("vec_id").limit(3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vs = vecs(40, 64).orderBy("vec_id").limit(3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    for ((id, e) <- vs) {
      val best = cs.map { case (cid, ce) =>
        val dot = e.lazyZip(ce).map(_ * _).sum
        val sim = BigDecimal(dot / math.sqrt(
          e.map(x => x * x).sum * ce.map(x => x * x).sum))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (sim, -cid)
      }.max
      assert(got(id) == -best._2, s"vec $id: got ${got(id)}, want ${-best._2}")
    }
    // the Lloyd loop inherits the routing: training past the literal
    // ceiling must work end-to-end (one iteration, tiny corpus)
    val trained = Similarity.kmeansCentroids(vecs(40, 64),
      nCells = Similarity.MaxLiteralCentroids + 8, iters = 1)
    assert(trained.count() == 24L) // init = first-nCells vectors
  }

  test("literal-family census: every OTHER bounded literal family stays " +
      "under the 8000-byte JIT budget at its own cap (lshBucket's 31 " +
      "planes; minhash's 16 hash functions)") {
    // lshBucket inlines up to 31 plane arrays into ONE Int-bucket
    // expression — right at the measured plane cliff (32 planes =
    // 5.7KB, 48 = 9.1KB), so the cap is safe ONLY while codegen stays
    // ~170 B/plane; this reads the real size so growth can't silently
    // re-open the cliff for the IVF/outlier bucket family
    val atCap = maxMethodSize(vecs(40, 64).select(col("vec_id"),
      graft.functions.Similarity.lshBucket(
        col("embedding").cast("array<double>"), 31, 64).as("bucket")))
    assert(atCap > 0 && atCap < 8000,
      s"lshBucket at its 31-plane cap generates a $atCap-byte method " +
        "— lower the cap or route to a broadcast matrix")
    // minhash signatures: k is capped at MinhashA.size = 16 small
    // (hm*A+B)%P min-aggregates — two orders of magnitude below the
    // budget, pinned so a cap raise revisits this
    assert(graft.ops.Dedup.MinhashA.size <= 16,
      "raising the minhash hash-function cap re-opens the bytecode " +
        "budget question — re-run the ladder for the aggregate family")
  }

  test("broadcast band keys are BITWISE the literal band keys, " +
      "INCLUDING null embeddings (plane routing must never change a " +
      "bucket)") {
    def corpus = vecs(300, 64).select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .union(spark.range(1).select(lit(9999L).as("vec_id"),
        lit(null).cast("array<double>").as("e")))
    val lit0 = Similarity.literalStackedBandKeys(corpus, 16, 8, 64)
    val bc = corpus.select(col("vec_id"),
        posexplode(Similarity.broadcastBandKeys(col("e"), 16, 8, 64)))
      .select(col("vec_id"), col("pos").as("bid"), col("col").as("bk"))
    assert(lit0.schema.map(f => (f.name, f.dataType)) ==
      bc.schema.map(f => (f.name, f.dataType)),
      s"schemas diverged: ${lit0.schema} vs ${bc.schema}")
    val joined = lit0.as("l").join(bc.as("b"), Seq("vec_id", "bid"))
      .filter(!(col("l.bk") <=> col("b.bk")))
    assert(joined.count() == 0,
      "band keys diverged between literal and broadcast forms")
    // the literal null contract rides through: null embedding → one
    // row per band with bucket 0 (when(null > 0, ...).otherwise(0)) —
    // the broadcast UDF must reproduce it, not emit null/no rows
    assert(bc.filter(col("vec_id") === 9999L && col("bk") === 0L)
      .count() == 16)
  }

  test("past MaxLiteralPlanes, stackedEmbeddingBandKeys routes to the " +
      "broadcast plane matrix: no refusal, still a map-only " +
      "generate+project plan, right bucket bits") {
    // smallest past-the-bound shape with the production r=16
    val nb = Similarity.MaxLiteralPlanes / 16 + 1
    val df = Similarity.stackedEmbeddingBandKeys(vecs(20, 64),
      nBands = nb, planesPerBand = 16, dim = 64)
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("Join", "Window", "Exchange"))
      assert(!plan.contains(bad),
        s"broadcast band keys must stay map-only, found $bad:\n" +
          plan.take(2000))
    assert(df.count() == 20L * nb)
    // spot-check band 0 of vector 0 against a driver replay of the
    // exact literal arithmetic (sequential dot, sign bit per plane)
    val signs = Similarity.planeSigns(nb * 16, 64)
    val emb = vecs(1, 64).collect().head.getSeq[Double](1)
    val want = (0 until 16).map { i =>
      val s = emb.lazyZip(signs(i).map(_.toDouble)).map(_ * _).sum
      if (s > 0) 1L << i else 0L
    }.sum
    val got = df.filter(col("vec_id") === 0L && col("bid") === 0)
      .select(col("bk")).collect().head.getLong(0)
    assert(got == want, s"band 0 bucket: got $got, want $want")
  }

  test("banded plane inlining at MaxLiteralPlanes stays JIT-safe: the " +
      "bound shape's generated methods are under 8000 bytecode bytes " +
      "(the measured plane ladder, PLANS.md round 19 — not asserted)") {
    val r = 16
    val nb = Similarity.MaxLiteralPlanes / r
    val atBound = maxMethodSize(Similarity.literalStackedBandKeys(
      vecs(40, 64).select(col("vec_id"),
        col("embedding").cast("array<double>").as("e")), nb, r, 64))
    assert(atBound > 0 && atBound < 8000,
      s"literal band keys at ${nb}x$r generate a $atBound-byte method " +
        "— HotSpot stops JIT-compiling at ~8000 and MaxLiteralPlanes " +
        "must keep the literal form under it (lower the bound if " +
        "codegen grew)")
    // the committed production shapes (x256 16x8, x257 8x16 = 128
    // planes) sit PAST the measured bound — they were generating 26 KB
    // un-JIT-able methods all along (round-19 ladder) — so they must
    // now route to the broadcast form, not the literal one
    assert(16 * 8 > Similarity.MaxLiteralPlanes,
      "production 128-plane shapes must be past the measured bound")
    val df = Similarity.stackedEmbeddingBandKeys(vecs(40, 64),
      nBands = 16, planesPerBand = 8, dim = 64)
    assert(df.count() == 40L * 16)
  }
}
