package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val day = expr("unix_timestamp(o_orderdate) div 86400")
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
}
