package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: lay documents end-to-end
  * in a deterministic order and cut the token stream into fixed-capacity
  * context windows (the GPT-style "concat then chunk" batching scheme).
  * Each document's placement is fully described by the exclusive prefix
  * sum of token counts over the ordering column — from it fall out the
  * first/last bin the document touches and whether it straddles a bin
  * boundary (the fraction of straddlers is the packing-efficiency metric
  * data engineers watch).
  *
  * The prefix sum is the scale trap: `sum().over(Window.orderBy(id))`
  * with no partitioning funnels 100 TB through ONE task. This uses the
  * same decomposition as [[Ranking.withGlobalRanks]]:
  * range-partition on the order key, cumsum locally per partition in
  * parallel, then add per-partition offsets computed on a
  * one-row-per-partition summary (O(partitions), broadcast back).
  * Identical to the global window at any partition count.
  *
  * Load-bearing invariant (shared with [[Ranking.withGlobalRanks]]):
  * Catalyst prunes the local window out of the offsets subtree, so both
  * `_bucket` consumers reduce to the same scan + range-exchange prefix
  * and Spark's exchange reuse materializes it ONCE — which is what makes
  * the two `spark_partition_id()` taggings agree. PlanSpec asserts the
  * executed plan contains a ReusedExchange.
  */
object Packing {

  /** Per-document packing assignment: (id, n_tokens, start_tok,
    * first_bin, last_bin). Token count = whitespace token count of
    * textCol; order = ascending idCol (caller pre-shuffles the corpus —
    * e.g. by a deterministic sample key — if it wants mixing). idCol
    * must be UNIQUE: with ties the per-row placement among tied rows is
    * engine-order-dependent (true of any SUM OVER ORDER BY on a
    * non-unique key, oracle included).
    */
  def packSequences(docs: DataFrame, capacity: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, "bin capacity must be positive")
    val counted = docs.select(
      col(idCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))

    val ranged = counted.repartitionByRange(col(idCol).asc)
      .withColumn("_bucket", spark_partition_id())
    val wLocal = Window.partitionBy(col("_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn(
      "_loff", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))

    // one row per partition; the exclusive running sum over this summary
    // is O(partitions), not O(rows)
    val wCum = Window.orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_bucket"))
      .agg(sum(col("n_tokens")).as("_n"))
      .withColumn("_boff", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .select(col("_bucket"), col("_boff"))

    local.join(broadcast(offsets), "_bucket")
      .withColumn("start_tok", col("_loff") + col("_boff"))
      .withColumn("first_bin", expr(s"start_tok DIV ${capacity}L"))
      .withColumn("last_bin",
        expr(s"(start_tok + n_tokens - 1) DIV ${capacity}L"))
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        col("first_bin"), col("last_bin"))
  }

  /** Write the corpus as size-bounded, order-preserving TRAINING SHARDS —
    * the sink end of the pipeline: data loaders stream shard k as one
    * parquet file holding documents [k·docsPerShard, (k+1)·docsPerShard)
    * of the idCol order, ids ascending within the file.
    *
    * The global position uses the same decomposed prefix count as
    * [[packSequences]] (range partition + local row_number + broadcast
    * O(partitions) offsets; 64-bit throughout, so corpora past 2³¹ docs
    * are fine), then ONE shuffle on the shard id co-locates each shard
    * in a single task. The dynamic-partition writer requires its rows
    * sorted by the partition column — they already are
    * (sortWithinPartitions(shard, id)), so no extra writer-side sort,
    * and the within-shard id order survives into the file.
    *
    * Returns the shard count. Layout: outDir/shard=k/part-*.parquet,
    * exactly one data file per shard. idCol should be unique — ties
    * still place every row exactly once, but which side of a shard
    * boundary a tied row lands on is not reproducible across runs.
    */
  def writeShards(docs: DataFrame, outDir: String, docsPerShard: Long,
      idCol: String = "doc_id"): Long = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    val ranged = docs.repartitionByRange(col(idCol).asc)
      .withColumn("_bucket", spark_partition_id())
    val wLocal = Window.partitionBy(col("_bucket")).orderBy(col(idCol))
    val local = ranged.withColumn("_lpos",
      row_number().over(wLocal).cast("long") - 1)
    val wCum = Window.orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_bucket"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_boff", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .select(col("_bucket"), col("_boff"))
    val sharded = local.join(broadcast(offsets), "_bucket")
      .withColumn("shard",
        expr(s"(_lpos + _boff) DIV ${docsPerShard}L"))
      .drop("_bucket", "_lpos", "_boff")
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // Count from the WRITTEN layout (one directory listing), not from a
    // docs.count() — which would re-execute the entire upstream lineage a
    // second time (at 100 TB the whole pipeline would run twice) and could
    // disagree with the files actually written if that lineage were ever
    // nondeterministic. Every shard id in range has >= 1 doc, so the
    // directory count IS the shard count.
    countShardDirs(docs.sparkSession, outDir)
  }

  /** Number of `shard=` partition directories under `outDir` — the
    * authoritative post-write shard count (O(shards) metadata listing, no
    * data read, no lineage re-execution). */
  def countShardDirs(spark: org.apache.spark.sql.SparkSession,
      outDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p)
      .count(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .toLong
  }

  /** Write a frame that already carries its shard assignment (`shardCol`)
    * as the standard shard layout: one shuffle on the shard id co-locates
    * each shard in one task, rows sorted by (`shardCol`, `orderCol`) so
    * the dynamic-partition writer adds no extra sort and the within-shard
    * order survives into the file. `dropCols` are projected away AFTER the
    * sort (a Project preserves row order), so internal ordering columns
    * never leak into the shipped shards. Returns the shard count from the
    * written layout. */
  def writePreSharded(docs: DataFrame, outDir: String,
      shardCol: String = "shard", orderCol: String = "doc_id",
      dropCols: Seq[String] = Nil): Long = {
    docs
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(orderCol))
      .drop(dropCols: _*)
      .write.mode("overwrite").partitionBy(shardCol).parquet(outDir)
    countShardDirs(docs.sparkSession, outDir)
  }

  /** TOKEN-bounded training shards — the capacity contract trainers
    * actually specify (a shard feeds a data-loader budgeted in tokens,
    * not documents). Shard k holds the documents whose FIRST token falls
    * in [k·tokensPerShard, (k+1)·tokensPerShard) of the concatenated
    * token stream in `idCol` order — i.e. [[packSequences]]' `first_bin`
    * at capacity = tokensPerShard — so each shard's token mass is
    * tokensPerShard plus at most one straddling document, and the
    * document order within and across shards is exactly the packing
    * order.
    *
    * Dataflow: the bin assignment is packSequences' decomposed prefix sum
    * (range partition + local cumsum + O(partitions) broadcast offsets);
    * joining it back to the full rows is one hash join on the unique id;
    * the write is [[writePreSharded]]'s single shuffle on the shard id.
    * Returns (shardCount, assignment) where assignment = (idCol,
    * n_tokens, start_tok, shard) — the map a loader needs to seek.
    */
  def writeTokenShards(docs: DataFrame, outDir: String, tokensPerShard: Long,
      textCol: String = "text", idCol: String = "doc_id"): (Long, DataFrame) = {
    val assign = packSequences(docs, tokensPerShard, textCol, idCol)
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        col("first_bin").as("shard"))
    val n = writePreSharded(docs.join(assign, idCol), outDir,
      shardCol = "shard", orderCol = idCol,
      dropCols = Seq("n_tokens", "start_tok"))
    (n, assign)
  }

  /** Sliding token-window chunking — the per-document alternative to
    * concat-then-chunk: each document is cut into windows of
    * `chunkTokens` whitespace tokens starting every `stride` tokens
    * (overlap = chunkTokens − stride), the standard way long documents
    * are fed to a bounded context window without losing boundary
    * context. Chunk starts are 0, stride, 2·stride, … while < len, so
    * the tail chunk may be short; empty documents yield no chunks (the
    * guard also keeps Spark's `sequence` from descending on a negative
    * upper bound where DuckDB's `range` would be empty).
    *
    * Entirely map-side: codegen'd array HOFs + one Generate, no shuffle
    * at any corpus size — output rows ≈ input tokens / stride.
    */
  def chunkText(docs: DataFrame, chunkTokens: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val toks = Dedup.tokens(col(textCol))
    val chunks = transform(
      sequence(lit(0L), floor((size(toks) - 1) / lit(stride)).cast("long")),
      i => struct(
        i.as("chunk_id"),
        (i * stride).as("chunk_start"),
        concat_ws(" ", slice(toks, (i * stride + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text")))
    docs
      .filter(size(toks) > 0)
      .select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol),
        col("c.chunk_id").as("chunk_id"),
        col("c.chunk_start").as("chunk_start"),
        size(split(col("c.chunk_text"), " ")).cast("long").as("n_tokens"),
        col("c.chunk_text").as("chunk_text"))
  }
}
