package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row of
  * the same key with rightTime <= leftTime (ties match).
  *
  * Spark has no ASOF JOIN; the scalable composition is the union-marker
  * trick: interleave both sides on (key, time), carry the latest right
  * payload forward with a running `last(ignoreNulls)` window, keep the
  * left rows. ONE shuffle on the key (the window partition); no range
  * self-join, no per-row subquery — at 100 TB this is a single sort-based
  * window pass, skew-bounded by key cardinality.
  *
  * Right rows sort before left rows at equal timestamps so ties match,
  * mirroring ASOF JOIN's `>=` semantics.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (each emitted as
    *                  `asof_<name>`; null when no right row precedes). */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col)): _*)
    // the whole right payload travels as ONE struct so the matched row is
    // atomic — per-column carry would stitch together values from
    // different right rows whenever a payload column holds null
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(col(key).as("_k"), col("_t"), col("_side"),
        struct(valueCols.map(col): _*).as("_payload"))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_match",
      last(col("_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select((Seq(col("_k").as(key)) ++
        leftCols.filterNot(_ == key).map(col) ++
        valueCols.map(c => col(s"_match.$c").as(s"asof_$c"))): _*)
  }
}
