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
      "sim (routing must never change a result)") {
    val cs = cents(Similarity.MaxLiteralCentroids, 64)
    val e = col("embedding").cast("array<double>")
    val both = vecs(300, 64).select(col("vec_id"),
      Similarity.literalNearestCell(e, cs).as("lit_cell"),
      Similarity.broadcastNearestCell(e, cs).as("bc_cell"))
    assert(both.filter(col("lit_cell") =!= col("bc_cell")).count() == 0,
      "cell assignments diverged between literal and broadcast forms")
    // cell+sim twin: literal withNearestCellSim vs the broadcast UDF
    val litSim = Similarity.withNearestCellSim(vecs(300, 64), e, cs)
      .select(col("vec_id"), col("cell"), col("sim"))
    val bcSim = vecs(300, 64).select(col("vec_id"),
        Similarity.broadcastNearestCellSim(e, cs).as("_b"))
      .select(col("vec_id"), col("_b._1").as("cell"), col("_b._2").as("sim"))
    val joined = litSim.as("l").join(bcSim.as("b"), "vec_id")
      .filter(col("l.cell") =!= col("b.cell") ||
        col("l.sim") =!= col("b.sim"))
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

  test("band shapes past the audited plane bound are refused loudly, " +
      "naming the broadcast path") {
    val e2 = intercept[IllegalArgumentException] {
      Similarity.stackedEmbeddingBandKeys(vecs(4, 64),
        nBands = 64, planesPerBand = 33, dim = 64).collect()
    }
    assert(e2.getMessage.contains("broadcast"),
      s"refusal must name the broadcast path: ${e2.getMessage}")
  }

  test("banded plane inlining at the 128-plane committed shape stays " +
      "codegen'd (the x256/x257 production shapes) — its HOT method is " +
      "small (the >8KB member is cold glue, measured 0.34s/200k rows)") {
    val df = Similarity.stackedEmbeddingBandKeys(vecs(40, 64),
      nBands = 16, planesPerBand = 8, dim = 64)
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "band-key projection left whole-stage codegen:\n" +
      plan.toString.take(2000))
    assert(df.count() == 40L * 16)
  }
}
