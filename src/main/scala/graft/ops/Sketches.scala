package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketches — the mergeable
  * cardinality estimator a corpus-monitoring pipeline keeps per shard /
  * per source (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream"). Unlike HLL the whole construction is exact integer +
  * one IEEE division: the sketch IS the k smallest 32-bit token-hash
  * values, so the estimate is bit-reproducible in any engine — which is
  * what lets the DuckDB oracle check it bitwise.
  *
  * Merge property (the reason sketches exist at 100 TB): the k smallest
  * of a UNION equal the k smallest of the union of per-part k-min sets —
  * so per-source sketches combine into the corpus sketch without
  * re-scanning text. kmvReport's `__all__` row is computed FROM the
  * per-source sketches; the oracle computes it directly from the corpus
  * — a hash match proves mergeability end-to-end (x91's contract, for
  * cardinality instead of similarity).
  *
  * Estimator: with m = |sketch|, if m < k the sketch is exhaustive and
  * the estimate is m (exact); else est = (k-1) · 2^32 / h_(k) where
  * h_(k) is the k-th smallest hash — one division of exact longs,
  * rounded to 6 (the x39 convention).
  */
object Sketches {

  private val HashSpace = 4294967296.0 // 2^32; tokenHash yields [0, 2^32)

  /** Per-group KMV sketch over the DISTINCT token set of `textCol`:
    * (group, hv, rnk) — the k smallest distinct hash values per group.
    * Token occurrences reduce to DISTINCT (group, tok) BEFORE hashing,
    * so md5 runs once per distinct token (not once per occurrence, and
    * never inlined 8× through hexToIntSql's digest re-reference — the
    * digest is a materialized column). Two-phase salted top-k
    * (Ranking.topKPerGroup) so no group funnels through one task; the
    * hash itself salts phase 1 (uniform by construction). */
  def kmvSketch(docs: DataFrame, k: Int, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val hashes = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
      .distinct()
      .select(col(groupCol), md5(col("tok")).as("_d"))
      .select(col(groupCol), expr(TextAnalysis.hexToIntSql("_d", 8)).as("hv"))
      // two tokens can share an 8-hex md5 prefix: the sketch is a SET of
      // hash values, so re-distinct on the (small, integer) hv rows
      .distinct()
    Ranking.topKPerGroup(hashes, groupCol, k, Seq(col("hv").asc),
      saltCol = col("hv"), salts = 16)
  }

  /** Estimate from a sketch: (group, n_sketch, kth_hash, kmv_estimate). */
  private def estimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sketch"), max(col("hv")).as("kth_hash"))
      .select(col(groupCol), col("n_sketch"), col("kth_hash"),
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble * HashSpace) / col("kth_hash").cast("double"), 6))
          .as("kmv_estimate"))

  /** Per-source cardinality report + the merged `__all__` row, with the
    * exact distinct-token count alongside for error inspection. The
    * merged sketch is built FROM the per-source sketches (re-ranked over
    * k·sources rows — no second corpus pass); its exact count is the
    * only whole-corpus aggregation. */
  def kmvReport(docs: DataFrame, k: Int, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
    val sketch = kmvSketch(docs, k, groupCol, textCol).persist()

    val perSource = estimate(sketch, groupCol, k)
      .join(toks.groupBy(col(groupCol))
        .agg(countDistinct(col("tok")).as("n_exact")), Seq(groupCol))

    // merged: k smallest distinct hvs across every per-source sketch —
    // O(k · sources) rows, driver-free re-rank
    val mergedSketch = sketch.select(col("hv")).distinct()
      .withColumn("_g", lit("__all__"))
    val w = Window.partitionBy(col("_g")).orderBy(col("hv").asc)
    val mergedTop = mergedSketch
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
    val merged = estimate(mergedTop.withColumnRenamed("_g", groupCol), groupCol, k)
      .crossJoin(toks.agg(countDistinct(col("tok")).as("n_exact")))

    perSource.unionByName(merged)
      .select(col(groupCol), col("n_sketch"), col("kth_hash"),
        col("kmv_estimate"), col("n_exact"))
  }
}
