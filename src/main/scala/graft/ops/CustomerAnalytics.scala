package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-value analytics over the orders table: RFM (recency /
  * frequency / monetary) segmentation, the standard marketing rollup a
  * reference-frame consumer computes downstream of its DataFrame ops.
  *
  * Scale shape (100 TB orders): ONE custkey shuffle with map-side
  * combine reduces orders to a per-customer row; the corpus max-day and
  * the three quintile-threshold arrays are one-row broadcast frames
  * (scalar-subquery shape); scoring is then map-only comparisons. The
  * exact percentile holds per-dimension state proportional to the
  * customer count — the documented exact-vs-sketch tradeoff (x27's GK
  * approx is the 100 TB default when thresholds may be approximate).
  */
object CustomerAnalytics {

  /** Quintile score: 1 + how many of the four thresholds the value
    * strictly exceeds — ties land in the LOWER bucket, deterministically.
    */
  private def score(v: Column, thr: Column): Column =
    ((0 until 4).map(i => when(v > thr.getItem(i), 1).otherwise(0))
      .reduce(_ + _) + lit(1)).cast("long")

  /** Per-customer RFM segmentation: `recency_days` (days from the
    * customer's last order to the corpus' last order), `frequency`
    * (order count), `monetary` (DECIMAL(18,2)-summed total price, the
    * dsum convention, so the value is order-independent), plus quintile
    * scores 1-5 per dimension (5 = highest value of the raw dimension;
    * note recency_days is "days since", so r_score 5 means LEAST recent)
    * and the composite `rfm_code` = r*100 + f*10 + m.
    */
  def rfm(orders: DataFrame): DataFrame = {
    // pure DATE arithmetic: signed day count since epoch, timezone-free
    // and floor-exact for pre-1970 dates (matches the oracle's
    // epoch(date)//86400 — a bare unix_timestamp would be session-tz
    // dependent and `div` would truncate toward zero)
    val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
    val per = orders.groupBy(col("o_custkey"))
      .agg(max(day).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("_m"))
    val maxDay = per.agg(max(col("last_day")).as("_max_day"))
    val withRec = per.crossJoin(broadcast(maxDay))
      .select(col("o_custkey"),
        (col("_max_day") - col("last_day")).as("recency_days"),
        col("frequency"), col("_m").cast("double").as("monetary"))
    val thr = broadcast(withRec.agg(
      expr("percentile(cast(recency_days as double), array(0.2,0.4,0.6,0.8))").as("_tr"),
      expr("percentile(cast(frequency as double), array(0.2,0.4,0.6,0.8))").as("_tf"),
      expr("percentile(monetary, array(0.2,0.4,0.6,0.8))").as("_tm")))
    val rs = score(col("recency_days").cast("double"), col("_tr"))
    val fs = score(col("frequency").cast("double"), col("_tf"))
    val ms = score(col("monetary"), col("_tm"))
    withRec.crossJoin(thr)
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        rs.as("r_score"), fs.as("f_score"), ms.as("m_score"),
        (rs * 100 + fs * 10 + ms).as("rfm_code"))
  }

  /** Revenue concentration (Pareto) by spend decile: bucket users by
    * nine exact revenue-percentile cut points (decile d = 1 + #{t_i
    * strictly below the user's revenue} — boundary ties land LOW, so
    * deciles are deterministic though not exactly 10% each), then per
    * decile: users, DECIMAL-exact revenue, share of total, cumulative
    * share. The "top decile drives X% of revenue" readout.
    *
    * Scale: ONE user_id shuffle reduces events to per-user revenue;
    * cut points and the total are one-row broadcasts (scalar-subquery
    * shape); bucketing is map-only; the rollup has ≤ 10 groups and the
    * cumulative window runs over those 10 rows.
    */
  def revenueConcentration(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val perUser = events.filter(col("event_type") === convType)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("_rev"))
      .select(col("user_id"), col("_rev").cast("double").as("rev"))
    val cuts = (1 to 9).map(_ / 10.0)
    val thr = broadcast(perUser.agg(
      expr(s"percentile(rev, array(${cuts.mkString(", ")}))").as("_t")))
    val decile = ((0 until 9)
      .map(i => when(col("rev") > col("_t").getItem(i), 1).otherwise(0))
      .reduce(_ + _) + lit(1)).cast("long")
    val byDecile = perUser.crossJoin(thr)
      .select(decile.as("decile"), col("rev"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("rev").cast("decimal(18,2)")).as("_drev"))
    val total = broadcast(byDecile.agg(sum(col("_drev")).as("_tot")))
    val w = Window.orderBy(col("decile"))
    // zero-revenue corpus (all conversion values 0.0): shares are
    // undefined, not an ANSI division-by-zero throw
    val tot = col("_tot").cast("double")
    byDecile.crossJoin(total)
      .select(col("decile"), col("n_users"),
        col("_drev").cast("double").as("revenue"),
        when(tot =!= 0.0,
          round(col("_drev").cast("double") / tot, 6)).as("share"),
        col("_drev"), col("_tot"))
      .withColumn("cum_share",
        when(tot =!= 0.0,
          round(sum(col("_drev")).over(w).cast("double") / tot, 6)))
      .drop("_drev", "_tot")
  }
}
