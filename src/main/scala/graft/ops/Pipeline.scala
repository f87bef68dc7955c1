package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The whole curation pipeline as one call — the artifact a training-data
  * team actually ships: quality gate → exact dedup (min-id keeper) →
  * LSH near-dup dedup (cluster keepers) → benchmark decontamination →
  * deterministic corpus shuffle → size-bounded ordered shard write.
  * Every stage is one of this repo's audited operators; the composition
  * adds no new shuffle beyond what the stages themselves plan, and every
  * stage is deterministic (md5-based), so the same inputs produce
  * byte-identical shards on any run, engine, or partitioning.
  */
object Pipeline {

  /** Curate `docs` against `evalSet` and write shards under `outDir`.
    * Returns (shardCount, per-stage survivor counts for the run report).
    * Thresholds: quality > minQuality; docs sharing > maxSharedShingles
    * distinct 5-gram shingles with the eval set are dropped as
    * contaminated.
    *
    * `withStats=true` runs one count() per stage — each re-executes its
    * upstream chain, which is what you want for a small-corpus run
    * report and NOT at 100 TB: pass `withStats=false` there and the
    * whole pipeline executes exactly once, in the shard write (the
    * returned map is then empty).
    */
  def curateAndShard(docs: DataFrame, evalSet: DataFrame, outDir: String,
      docsPerShard: Long = 256L, minQuality: Double = 0.3,
      maxSharedShingles: Long = 4L,
      withStats: Boolean = true): (Long, Map[String, Long]) = {
    def ct(df: DataFrame): Long = if (withStats) df.count() else -1L
    val n0 = ct(docs)

    val good = docs.join(
      TextAnalysis.quality(docs).select(col("doc_id"), col("quality"))
        .filter(col("quality") > minQuality).select("doc_id"),
      "doc_id")
    val n1 = ct(good)

    val exactKeep = good.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"))
    val exact = good.withColumn("h", md5(col("text")))
      .join(exactKeep, "h")
      .filter(col("doc_id") === col("keeper"))
      .drop("h", "keeper")
    val n2 = ct(exact)

    val nearDrop = Dedup.clusterPairs(
        Dedup.lshCandidatePairs(exact, bands = 2, rowsPerBand = 4), rounds = 3)
      .filter(col("cluster") =!= col("doc_id"))
      .select(col("doc_id"))
    val deduped = exact.join(nearDrop, Seq("doc_id"), "left_anti")
    val n3 = ct(deduped)

    val contaminated = Dedup.contamination(deduped, evalSet, shingleN = 5)
      .filter(col("n_shared") > maxSharedShingles)
      .select(col("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val n4 = ct(clean)

    // deterministic shuffle: shard by salted-md5 order, not id order
    val shuffled = clean.withColumn("_shufkey",
      md5(concat(lit("shuf:"), col("doc_id"))))
    val nShards = Packing.writeShards(shuffled, outDir, docsPerShard,
      idCol = "_shufkey")
    (nShards, if (!withStats) Map.empty else Map(
      "input" -> n0, "quality_kept" -> n1, "exact_kept" -> n2,
      "neardup_kept" -> n3, "decontaminated_kept" -> n4))
  }
}
