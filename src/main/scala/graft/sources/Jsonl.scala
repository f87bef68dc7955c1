package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** JSONL shard layout — the interchange format most training loaders
  * actually consume (one JSON object per line, `shard=N/` directories).
  * The parquet shard writers ([[graft.ops.Packing.writePreSharded]],
  * `writeTokenShards`) are the engine-native layout; this is the
  * loader-facing export of the same contract:
  *
  *   - lines carry ONLY the corpus columns — the shard id is the
  *     directory key, never a JSON field (mirrors writePreSharded's
  *     dropCols discipline: no pipeline internals in training data);
  *   - within-shard line order is the deterministic md5 shuffle
  *     permutation ([[graft.ops.Pipeline.shardAssignment]]), so the
  *     same corpus produces byte-identical shard files on any run or
  *     cluster layout;
  *   - reads take an EXPLICIT schema: on 100 TB, schema inference is a
  *     full extra pass over the layout and can widen types on skewed
  *     fields — a loader knows its schema.
  *
  * Scale shape: one shuffle keyed by shard id (the assignment's
  * decomposed global rank supplies it without a single-task window),
  * rows sorted (shard, permutation key) so the dynamic-partition writer
  * adds no extra sort; Spark's JSON writer streams lines per task.
  */
object Jsonl {

  /** Shuffle-shard `docs` and write the JSONL layout under `outDir`
    * (`shard=N/part-*.json`, overwrite). Returns the shard count.
    */
  def writeJsonlShards(docs: DataFrame, outDir: String,
      docsPerShard: Long = 256L, idCol: String = "doc_id"): Long = {
    val sharded = graft.ops.Pipeline.shardAssignment(docs, docsPerShard, idCol)
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("_shufkey"))
      .drop("_shufkey")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("shard").json(outDir)
    graft.ops.Packing.countShardDirs(docs.sparkSession, outDir)
  }

  /** Read a [[writeJsonlShards]] layout. `schema` lists the corpus
    * columns (line fields); the `shard` partition column is appended by
    * directory discovery. */
  def readJsonlShards(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema.add("shard", LongType)).json(dir)
}
