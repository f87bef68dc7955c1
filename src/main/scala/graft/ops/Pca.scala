package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics: exact covariance + top principal component
  * (power iteration), for auditing embedding spaces before clustering /
  * ANN bucketing (north-star extension; complements Similarity's
  * centroid/outlier surface).
  *
  * Everything is computed in FIXED-POINT integer arithmetic (components
  * quantized to floor(x·10^6), sums exact in BIGINT/DECIMAL(38,0)) so the
  * result is order-independent and bitwise identical to the DuckDB oracle
  * — the same convention as Similarity.kmeansCentroids.
  *
  * Scale shape (100 TB of embeddings, dimension d):
  *  - [[covariance]] is ONE map-only expansion of each row into its d²
  *    outer-product cells followed by a map-side-combined sum over d²
  *    groups — no self-join of the embedding table, no shuffle of row
  *    data; the only exchange carries ≤ d²·partitions partial sums.
  *  - [[topComponent]] collects the d² rounded covariance cells to the
  *    driver (d ≤ ~2000 → ≤ a few MB — the matrix is small BY
  *    CONSTRUCTION once the distributed pass has reduced n rows to d²
  *    cells) and runs the d×d power iteration there, exactly like
  *    Bpe.learnMerges runs its inherently-sequential argmax driver-side.
  */
object Pca {

  /** Scale of the fixed-point quantization (6 decimal digits). */
  val Scale = 1000000L

  /** Per-cell quantized moments: (i, j, sij DECIMAL, mi, mj DECIMAL, n).
    * sij = Σ qᵢ·qⱼ, mi = Σ qᵢ with q = floor(x·10^6) — the exact integer
    * sufficient statistics of the covariance matrix.
    *
    * Mergeable by construction: every field is a plain sum/count, so the
    * moments of corpus A ∪ B are the cell-wise sums of A's and B's
    * moments ([[mergeMoments]]) — the incremental path when a daily batch
    * lands: compute moments of the delta only, merge with the stored
    * frame, re-derive the covariance ([[covarianceFromMoments]]). The
    * x121 oracle pins merged == monolithic bitwise.
    */
  def moments(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val q = emb.select(
      expr(s"transform($vecCol, x -> CAST(floor(x * 1000000.0) AS BIGINT))").as("q"))
    // map-only outer product, UPPER TRIANGLE only (i ≤ j): one row →
    // d(d+1)/2 cells instead of d² — the matrix is symmetric with
    // EXACTLY equal sums (x·y = y·x in integers; the (j,i) cell's mi
    // is the (i,j) cell's mj), so the lower triangle is mirrored from
    // the aggregated triangle below at O(d²) rows, not O(n·d²) cells
    // (round-18 verdict Next #5: this pass dominates the x119/x122
    // wall and the explode+exchange volume halves). |q|≤~10^7 keeps
    // the per-cell product ≤ 10^14 (exact in BIGINT); the sums go
    // through DECIMAL(38,0) so no row count can overflow them.
    val cells = q.select(explode(expr(
      "flatten(transform(q, (x, i) -> transform(slice(q, i + 1, size(q) - i), " +
        "(y, k) -> struct(i AS i, i + k AS j, x * y AS p, x AS qi, y AS qj))))"))
      .as("c"))
      .select(col("c.i"), col("c.j"), col("c.p"), col("c.qi"), col("c.qj"))
    val tri = cells.groupBy(col("i"), col("j"))
      .agg(sum(col("p").cast("decimal(38,0)")).as("sij"),
        sum(col("qi").cast("decimal(38,0)")).as("mi"),
        sum(col("qj").cast("decimal(38,0)")).as("mj"),
        count(lit(1)).as("n"))
    // mirror AFTER the aggregation, as a map-side explode of each
    // off-diagonal cell into its transpose — the plan keeps exactly ONE
    // exchange and ONE embeddings scan (PlanSpec x118 pin); a
    // union-of-two-branches formulation would need exchange reuse to
    // avoid re-aggregating
    val cell = struct(col("i"), col("j"), col("sij"), col("mi"),
      col("mj"), col("n"))
    val mirrored = struct(col("j").as("i"), col("i").as("j"), col("sij"),
      col("mj").as("mi"), col("mi").as("mj"), col("n"))
    tri.select(explode(when(col("i") === col("j"), array(cell))
        .otherwise(array(cell, mirrored))).as("c"))
      .select(col("c.i"), col("c.j"), col("c.sij"), col("c.mi"),
        col("c.mj"), col("c.n"))
  }

  /** Sample covariance matrix of the embedding column, as (i, j, cov)
    * rows with cov = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / (n·(n−1)·10^12), round 6.
    * The numerator is exact integer; only the final division is floating.
    */
  def covariance(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    covarianceFromMoments(moments(emb, vecCol))

  /** Cell-wise sum of two (or more) moment frames — the union's exact
    * moments, because every field is a sum. Scale: the frames are d²
    * rows; this is a tiny co-grouped aggregation, never an embedding
    * pass. */
  def mergeMoments(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "mergeMoments needs at least one frame")
    frames.reduce(_.unionByName(_)).groupBy(col("i"), col("j"))
      .agg(sum(col("sij")).cast("decimal(38,0)").as("sij"),
        sum(col("mi")).cast("decimal(38,0)").as("mi"),
        sum(col("mj")).cast("decimal(38,0)").as("mj"),
        sum(col("n")).as("n"))
  }

  /** The covariance projection over a moments frame (exact integer
    * numerator, one rounded division). */
  def covarianceFromMoments(m: DataFrame): DataFrame =
    m.select(col("i").cast("long").as("i"),
      col("j").cast("long").as("j"),
      // + 0.0 normalizes a rounded −0.0 to +0.0 (both engines), so the
      // near-zero off-diagonal cells compare bitwise
      (round((col("n") * col("sij") - col("mi") * col("mj")).cast("double")
        / (col("n").cast("double") * (col("n") - 1).cast("double") * 1e12), 6)
        + 0.0).as("cov"))

  /** Top principal component by `iters` fixed-point power iterations over
    * the quantized covariance (cInt = round(cov·10^6) BIGINT; v₀ = all
    * ones; each step y = cInt·w exactly in integers, then re-quantized to
    * w' = floor(y/max|y|·10^6)). Returns one row per dimension:
    * (pos, loading, eigenvalue, var_ratio) where loading is the
    * L2-normalized eigenvector component, eigenvalue the Rayleigh
    * quotient wᵀCw/wᵀw and var_ratio = eigenvalue/trace(C) — all round 6.
    *
    * Every floating-point step (the one division per iteration, the final
    * sqrt/divisions) runs on exactly-representable integer inputs in an
    * identical operation order in the SQL oracle, so the output is
    * engine-bitwise-stable.
    */
  def topComponent(emb: DataFrame, iters: Int = 6,
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (w, c, d) = topVector(emb, iters, vecCol)
    val nsq = w.map(v => v * v).sum // ≤ d·10^12
    val norm = Math.sqrt(nsq.toDouble)
    // Rayleigh numerator Σ w_i·c_ij·w_j can pass 2^63 — BigInt, like the
    // DECIMAL(38,0)/HUGEINT sums on the engine sides
    val num = (for (i <- 0 until d; j <- 0 until d)
      yield BigInt(w(i) * c(i)(j)) * w(j)).sum
    val tr = (0 until d).map(i => c(i)(i)).sum
    val eig = sround(num.toDouble / nsq.toDouble / 1e6)
    val ratio = sround(num.toDouble / nsq.toDouble / tr.toDouble)
    spark.createDataFrame(
      (0 until d).map(i => (i.toLong, sround(w(i).toDouble / norm), eig, ratio)))
      .toDF("pos", "loading", "eigenvalue", "var_ratio")
  }

  /** The fixed-point power-iteration loop itself: returns (w, cInt, d)
    * where w is the max-abs-normalized integer eigenvector (scale 10^6)
    * and cInt the quantized covariance — the reusable core shared by
    * [[topComponent]] and [[projectionByGroup]]. */
  private def topVector(emb: DataFrame, iters: Int,
      vecCol: String): (Array[Long], Array[Array[Long]], Int) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val covRows = covariance(emb, vecCol).collect()
    require(covRows.nonEmpty,
      "power iteration needs a non-empty embedding table")
    val d = covRows.map(_.getLong(0)).max.toInt + 1
    val c = Array.ofDim[Long](d, d) // round(cov·10^6): |cov| small, fits easily
    covRows.foreach { r =>
      // a single-row table makes the sample covariance 0/0 = NaN —
      // Math.round would silently quantize that to 0, so fail loudly
      require(!r.getDouble(2).isNaN,
        "covariance undefined: need at least 2 embedding rows")
      c(r.getLong(0).toInt)(r.getLong(1).toInt) = Math.round(r.getDouble(2) * 1e6)
    }
    var w = Array.fill[Long](d)(Scale)
    for (_ <- 1 to iters) {
      // y_i = Σ_j c_ij·w_j: |c|≤~10^8, |w|≤10^6, d terms → exact in Long
      val y = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * w(j)).sum)
      val m = y.map(Math.abs).max
      w = y.map(v => Math.floor(v.toDouble / m.toDouble * 1e6).toLong)
    }
    (w, c, d)
  }

  /** Per-group distribution of the projection onto the top principal
    * component: (group, n, mean_proj, min_proj, max_proj), round 6 — the
    * "does the leading variance direction separate my labels / sources?"
    * audit, run before trusting cluster-balanced splits.
    *
    * The per-row score is the exact integer dot product Σ qᵢ·wᵢ
    * (zip_with + aggregate — codegen'd, no UDF), normalized once by
    * 10^6·‖w‖; group stats aggregate the integer scores exactly
    * (DECIMAL sums, min/max) before the single rounded division.
    *
    * Scale: the power iteration collects only the d² covariance cells;
    * the scoring pass is map-only over the embeddings (w ships as a
    * literal array in the plan) into a map-side-combined per-group
    * aggregate — two embedding passes total, no join, no shuffle of
    * vector data.
    */
  def projectionByGroup(emb: DataFrame, iters: Int = 6,
      groupCol: String = "label", vecCol: String = "embedding"): DataFrame = {
    val (w, _, _) = topVector(emb, iters, vecCol)
    val norm = Math.sqrt(w.map(v => v * v).sum.toDouble)
    val wCol = array(w.map(lit(_)): _*)
    val scored = emb.select(col(groupCol),
      aggregate(
        zip_with(
          expr(s"transform($vecCol, x -> CAST(floor(x * 1000000.0) AS BIGINT))"),
          wCol, (q, wv) => q * wv),
        lit(0L), (acc, x) => acc + x).as("s"))
    scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("s").cast("decimal(38,0)")).as("_sum"),
        min(col("s")).as("_min"), max(col("s")).as("_max"))
      .select(col(groupCol), col("n"),
        (round(col("_sum").cast("double") / col("n").cast("double")
          / 1e6 / norm, 6) + 0.0).as("mean_proj"),
        (round(col("_min").cast("double") / 1e6 / norm, 6) + 0.0).as("min_proj"),
        (round(col("_max").cast("double") / 1e6 / norm, 6) + 0.0).as("max_proj"))
  }

  /** HALF_UP round to 6 decimals — the same rule as SQL round(x, 6). */
  private def sround(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
