package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join at scale.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join with no equi-key as a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, a
  * non-starter at 100 TB. The standard fix: quantize the range dimension
  * into buckets of `bucketWidth`, explode each interval onto every bucket
  * it overlaps, equi-join points to intervals on the bucket id, and apply
  * the exact containment predicate afterwards. Work becomes
  * O(|points| + Σ interval_span/width) shuffled rows on a uniform key.
  * Pick bucketWidth ≈ the median interval length: ~1-2 candidate buckets
  * per interval, a handful of candidate intervals per point.
  */
object RangeJoin {

  /** `points(pCol)` joined to `intervals[loCol, hiCol]` with
    * loCol <= p <= hiCol. All three columns must be integral (epoch
    * seconds/days — the engine's window convention). Non-negative domain
    * assumed (epoch time); `div` is then floor division.
    */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_b", expr(s"$pCol div $bucketWidth"))
    val ib = intervals.withColumn("_b",
      explode(sequence(expr(s"$loCol div $bucketWidth"), expr(s"$hiCol div $bucketWidth"))))
    pb.join(ib, "_b")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("_b")
  }
}
