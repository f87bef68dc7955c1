package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling and distribution audits — the data-quality checks a
  * pipeline runs before trusting a new drop: per-column null/distinct
  * profiles and a Benford first-digit audit for monetary columns
  * (fabricated or truncated amounts drift from Benford's law; the audit
  * is the standard forensic screen).
  */
object Profiling {

  /** Benford first-digit shares of 6-decimal log10(1 + 1/d), inlined
    * identically into the Spark plan and the SQL oracle so neither
    * engine evaluates log10 at query time (libm is not bit-stable). */
  val BenfordExpected: Seq[(Int, Double)] = (1 to 9).map { dd =>
    dd -> BigDecimal(math.log10(1.0 + 1.0 / dd))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** First-significant-digit distribution of a positive monetary column
    * vs Benford's law. Per digit 1-9: `digit, n, share, expected, dev`
    * (share round 6, dev = share − expected round 6; digits absent from
    * the data produce no row — the consumer left-joins the 1-9 grid).
    *
    * The digit is extracted via exact INTEGER formatting: cents =
    * round(value·100) as BIGINT (exact for 2-dp money doubles), then the
    * first character of the integer's decimal string — both engines
    * format integers identically, unlike doubles (shortest-roundtrip vs
    * Java's legacy Double.toString) and unlike floor(log10) (libm).
    * Non-positive values are excluded (Benford applies to positive
    * magnitudes), as are positives below half a cent — they'd round to 0
    * cents, outside the 1-9 first-digit domain.
    *
    * Scale: map-only digit extraction + a 9-group aggregate with
    * map-side combine; the total joins back as a one-row broadcast.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    // positives below half a cent round to 0 cents — no leading digit in
    // the 1-9 domain, so they are excluded from the denominator too (a
    // digit-0 row would silently drop from a 1-9 grid left-join while
    // still deflating every share)
    val cents = round(col(valueCol).cast("double") * 100).cast("bigint")
    val digits = df.filter(col(valueCol) > 0)
      .select(cents.as("_c")).filter(col("_c") >= 1)
      .select(substring(col("_c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = broadcast(digits.agg(sum(col("n")).as("_tot")))
    val expected = BenfordExpected.foldLeft(lit(null).cast("double")) {
      case (acc, (dd, e)) => when(col("digit") === dd, e).otherwise(acc)
    }
    digits.crossJoin(total)
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("_tot").cast("double"), 6)
          .as("share"),
        expected.as("expected"),
        round(col("n").cast("double") / col("_tot").cast("double")
          - expected, 6).as("dev"))
  }

  /** One-pass column profile: per column, `col_name, n_rows, n_nulls,
    * n_distinct, min_num, max_num` (min/max only for numeric columns,
    * cast to double AFTER the typed min/max — never string-ordered; NULL
    * for non-numerics). Distinct counts are EXACT multi-column distincts
    * (Catalyst's Expand: one scan, k× map-side row blowup) — the
    * documented exact-vs-sketch tradeoff; at 100 TB swap in
    * approx_count_distinct (x27's HLL path) when ±2% is acceptable.
    *
    * The per-column rows are selects over the MATERIALIZED one-row
    * aggregate (the x150 convention: lazy, each union branch would
    * re-run the corpus-scale pass).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val numeric = cols.filter(c =>
      df.schema(c).dataType.isInstanceOf[NumericType]).toSet
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        count_distinct(col(c)).as(s"_nd_$c")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"_min_$c"),
            max(col(c)).cast("double").as(s"_max_$c"))
        else Nil)
    }
    val m = Checkpoints.materialize(
      df.agg(count(lit(1)).as("_n"), aggs: _*))
    cols.map { c =>
      m.select(lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"), col(s"_nd_$c").as("n_distinct"),
        (if (numeric(c)) col(s"_min_$c") else lit(null).cast("double"))
          .as("min_num"),
        (if (numeric(c)) col(s"_max_$c") else lit(null).cast("double"))
          .as("max_num"))
    }.reduce(_ union _)
  }

  /** Population-stability-index drift report between a REFERENCE frame
    * and a CURRENT frame over one numeric column — the standard "did
    * the incoming data's distribution move" monitor a training pipeline
    * runs per ingest batch. Bin edges are the reference's `bins`-tiles
    * (exact interpolated percentiles, the x23/x152 convention,
    * broadcast); returns one row per bin: `bin, n_ref, n_cur,
    * share_ref, share_cur, psi_term` (shares round 6; psi_term =
    * (p_ref − p_cur)·ln(p_ref/p_cur), round 6 — NULL when either side
    * of the bin is empty, so the consumer chooses its own
    * empty-bin/epsilon policy; Σ psi_term is the headline PSI).
    *
    * Determinism: bin membership is an exact cut-point comparison
    * chain; shares divide exact counts; the ln ride follows the x103
    * round-before-use convention. Scale: one percentile aggregate on
    * the reference + one broadcast-join counting pass per frame —
    * map-side combined, `bins` output rows.
    */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val fracs = (1 until bins).map(i =>
      i.toDouble / bins).mkString(", ")
    val cuts = broadcast(ref.select(valueCol.cast("double").as("_v"))
      .agg(expr(s"percentile(_v, array($fracs))").as("_t")))
    def binned(df: DataFrame, n: String) = {
      val bin = ((0 until bins - 1)
        .map(i => when(col("_v") > col("_t").getItem(i), 1).otherwise(0))
        .reduce(_ + _) + lit(1)).cast("long")
      df.select(valueCol.cast("double").as("_v"))
        .filter(col("_v").isNotNull)
        .crossJoin(cuts)
        .select(bin.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(n))
    }
    // the full 1..bins grid: a bin can be empty on either side
    val spark = ref.sparkSession
    import spark.implicits._
    val grid = broadcast((1 to bins).map(_.toLong).toDF("bin"))
    val joined = grid
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = broadcast(joined.agg(sum(col("n_ref")).as("_tr"),
      sum(col("n_cur")).as("_tc")))
    val pr = col("n_ref").cast("double") / col("_tr").cast("double")
    val pc = col("n_cur").cast("double") / col("_tc").cast("double")
    joined.crossJoin(tot)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        when(col("_tr") =!= 0, round(pr, 6)).as("share_ref"),
        when(col("_tc") =!= 0, round(pc, 6)).as("share_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0 &&
            col("_tr") =!= 0 && col("_tc") =!= 0,
          round((pr - pc) * log(pr / pc), 6)).as("psi_term"))
  }
}
