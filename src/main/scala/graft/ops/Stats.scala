package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form exact statistics from integer moments: ordinary least
  * squares and Pearson correlation over QUANTIZED columns. The caller
  * quantizes (e.g. cents via `round(x*100)` — exact for 2-dp doubles);
  * every moment is then an exact DECIMAL(38,0) integer sum, so the
  * statistic is bitwise reproducible in any reduction order on any
  * engine (the Pca fixed-point convention applied to regression) — no
  * Welford/naive-float drift, no shuffle-order dependence.
  *
  * Scale shape: each fit is ONE map-side-combined aggregate over the
  * input (a handful of sum cells), then scalar arithmetic on a one-row
  * frame. Nothing iterative, nothing driver-side except the final row.
  */
object Stats {

  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** OLS fit y = intercept + slope·x over integer-valued columns.
    * Returns ONE row (n, slope, intercept, r2), round 6; slope/r2 NULL
    * when x (or y, for r2) is constant — zero variance, and ANSI-mode
    * double division by zero is an error, not an Infinity.
    *
    *   slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    *   intercept = (Sy − slope_raw·Sx) / n      (slope_raw unrounded)
    *   r²    = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²)·(n·Syy − Sy²))
    */
  def linearFit(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val m = df.agg(
      count(lit(1)).as("n"),
      sum(d38(xCol)).as("sx"), sum(d38(yCol)).as("sy"),
      sum(d38(xCol) * d38(xCol)).as("sxx"),
      sum(d38(yCol) * d38(yCol)).as("syy"),
      sum(d38(xCol) * d38(yCol)).as("sxy"))
    val n = d38(col("n"))
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (n * col("syy") - col("sy") * col("sy")).cast("double")
    val slopeRaw = num / denX
    val nD = col("n").cast("double")
    m.select(
      col("n"),
      when(denX =!= 0.0, round(slopeRaw, 6)).as("slope"),
      when(denX =!= 0.0,
        round((col("sy").cast("double") - slopeRaw *
          col("sx").cast("double")) / nD, 6)).as("intercept"),
      when(denX =!= 0.0 && denY =!= 0.0,
        round(num * num / (denX * denY), 6)).as("r2"))
  }

  /** Pairwise Pearson correlation over quantized columns, ONE moments
    * pass for all pairs. Returns (col_a, col_b, n, corr) for a < b in
    * the given order; corr NULL when either side is constant.
    */
  def pairwiseCorr(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val named = cols.map { case (nm, c) => nm -> d38(c) }
    val sums = named.map { case (nm, c) => sum(c).as(s"s_$nm") } ++
      named.map { case (nm, c) => sum(c * c).as(s"ss_$nm") } ++
      named.combinations(2).map { case Seq((a, ca), (b, cb)) =>
        sum(ca * cb).as(s"sp_${a}_$b")
      }.toSeq
    // MATERIALIZED: the pair rows below are a union of selects over this
    // one-row frame — unmaterialized, each union branch would re-execute
    // the corpus-scale moments aggregate (6 passes for 4 columns)
    val m = Checkpoints.materialize(df.agg(count(lit(1)).as("n"), sums: _*))
    val n = d38(col("n"))
    val pairRows = named.combinations(2).map { case Seq((a, _), (b, _)) =>
      val num = (n * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
        .cast("double")
      val da = (n * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")).cast("double")
      val db = (n * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")).cast("double")
      m.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        when(da =!= 0.0 && db =!= 0.0,
          round(num / sqrt(da * db), 6)).as("corr"))
    }.toSeq
    pairRows.reduce(_ union _)
  }
}
