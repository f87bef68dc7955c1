package graft

import org.apache.spark.sql.functions._

/** Pins the literal-inlining ceiling of the driver-side centroid /
  * hyperplane families (round-17 verdict Next #3 / What's wrong #2).
  *
  * `Similarity.bestCentroid` inlines k `typedLit` arrays of d doubles
  * into ONE argmax expression and `stackedEmbeddingBandKeys` inlines
  * nBands·planesPerBand plane arrays — ideal at the repo's shapes
  * (k ≤ 16, ≤ 128 planes), but the generated code and analysis cost
  * grow with the literal count, and past Janino's 64 KB method limit
  * whole-stage codegen silently falls back to interpreted evaluation.
  * This spec proves codegen still ENGAGES and COMPILES at production
  * IVF scale (k = 512 centroids, d = 64 — 32k inlined doubles), and
  * that the operators REFUSE shapes past the audited bound with an
  * error naming the broadcast-matrix alternative, instead of silently
  * degrading.
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

  test("centroid literal argmax at k=512, d=64: whole-stage codegen " +
      "engages and every generated method compiles under the huge-method " +
      "limit (no silent interpreted fallback)") {
    val k = 512
    val df = vecs(40, 64)
      .select(col("vec_id"), Similarity.nearestCell(
        col("embedding").cast("array<double>"), cents(k, 64)).as("cell"))
    val plan = df.queryExecution.executedPlan
    // simpleString renders WholeStageCodegen as the `*(n)` prefix — walk
    // the tree for the node itself
    assert(plan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "assignment projection left whole-stage codegen:\n" +
      plan.toString.take(2000))
    // compile every codegen subtree the way the executor would and read
    // the real bytecode stats: maxMethodCodeSize must be a positive
    // number (it compiled) under the fallback threshold
    // spark.sql.codegen.hugeMethodLimit (65535), or Spark would switch
    // this subtree to interpreted execution at runtime
    val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
    assert(stats.nonEmpty, "no codegen subtrees found")
    for ((subtree, _, byteCodeStats) <- stats) {
      assert(byteCodeStats.maxMethodCodeSize > 0,
        s"codegen did not compile for subtree:\n${subtree.take(500)}")
      assert(byteCodeStats.maxMethodCodeSize < 65535,
        s"generated method ${byteCodeStats.maxMethodCodeSize} bytes — " +
          s"over the huge-method fallback limit:\n${subtree.take(500)}")
    }
    // and the argmax is actually right at this k: cross-check a few rows
    // against a driver-side recomputation of the same arithmetic
    // (round-6 cosine, smallest cent_id on ties)
    val got = df.orderBy("vec_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = cents(k, 64)
    val vs = vecs(40, 64).orderBy("vec_id").limit(5).collect()
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
  }

  test("broadcast-matrix argmax is BITWISE the literal argmax (the " +
      "past-the-ceiling routing must not change a single assignment)") {
    val cs = cents(64, 64)
    val e = col("embedding").cast("array<double>")
    val both = vecs(300, 64).select(col("vec_id"),
      Similarity.nearestCell(e, cs).as("lit_cell"),
      Similarity.broadcastNearestCell(e, cs).as("bc_cell"))
    val diff = both.filter(col("lit_cell") =!= col("bc_cell")).count()
    assert(diff == 0, s"$diff/300 assignments diverged between the " +
      "literal and broadcast argmax forms")
  }

  test("past MaxLiteralCentroids, nearestCell routes to the broadcast " +
      "matrix: still map-only, still the right argmax") {
    val k = Similarity.MaxLiteralCentroids + 64
    val cs = cents(k, 64)
    val df = vecs(40, 64).select(col("vec_id"), Similarity.nearestCell(
      col("embedding").cast("array<double>"), cs).as("cell"))
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("Join", "Window", "Exchange"))
      assert(!plan.contains(bad),
        s"broadcast assignment must stay map-only, found $bad:\n" +
          plan.take(2000))
    // cross-check a few rows against a driver-side recomputation
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
    // the Lloyd loop inherits the routing: training at k past the
    // literal ceiling must work end-to-end (one iteration, tiny corpus)
    val trained = Similarity.kmeansCentroids(vecs(40, 64),
      nCells = Similarity.MaxLiteralCentroids + 8, iters = 1)
    assert(trained.count() == 40L) // init = first-n vectors (n < k)
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
      "codegen'd (the x256/x257 production shapes)") {
    val df = Similarity.stackedEmbeddingBandKeys(vecs(40, 64),
      nBands = 16, planesPerBand = 8, dim = 64)
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "band-key projection left whole-stage codegen:\n" +
      plan.toString.take(2000))
    val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
    for ((subtree, _, byteCodeStats) <- stats) {
      assert(byteCodeStats.maxMethodCodeSize > 0 &&
        byteCodeStats.maxMethodCodeSize < 65535,
        s"band-key codegen out of bounds " +
          s"(${byteCodeStats.maxMethodCodeSize}):\n${subtree.take(500)}")
    }
    assert(df.count() == 40L * 16)
  }
}
