package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (100 TB design rule: a handful of hot keys must
  * not serialize onto one reducer).
  *
  * AQE's skew-join splitting handles most cases automatically
  * (`spark.sql.adaptive.skewJoin.enabled`); these are the explicit forms
  * for aggregations and for joins whose skew AQE can't see (e.g. building
  * on top of custom keys).
  */
object Skew {

  /** Deterministic per-row salt, derived from row CONTENT (xxhash64 over
    * all columns) — never from partition/attempt state. A recomputed task
    * (fault recovery, speculative retry) assigns identical salts, so no
    * row can be double-counted or lost across the salted shuffle
    * (spark_partition_id/monotonically_increasing_id would both change on
    * recomputation). Exact duplicate rows share a salt and spread only
    * across distinct payloads — acceptable: salting targets hot KEYS, and
    * real wide rows carry distinguishing columns.
    */
  private def contentSalt(df: DataFrame, saltBuckets: Int) =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(saltBuckets.toLong))

  /** Two-phase salted aggregation: partial aggregate on (keys, salt) —
    * spreading a hot key over `saltBuckets` reducers — then final
    * aggregate on keys. Works for any algebraic aggregate expressed as
    * (partial, merge) column pairs; count/sum helpers below.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      out: String = "n"): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, saltBuckets))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(out))
  }

  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
      saltBuckets: Int, out: String = "s"): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, saltBuckets))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(out))
  }

  /** Salted equi-join for a skewed large side: the small side is
    * replicated `saltBuckets` times (explode), the large side gets a
    * deterministic salt, and the join key becomes (key, salt) — a hot key
    * now lands on `saltBuckets` reducers. Result rows are identical to the
    * unsalted join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt", contentSalt(large, saltBuckets))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
