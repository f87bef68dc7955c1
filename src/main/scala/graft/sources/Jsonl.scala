package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *     same corpus produces line-identical shard contents on any run
  *     or cluster layout (part-file NAMES carry run-specific task ids;
  *     the lines and their order do not vary);
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
    * (`shard=N/part-*.json`, overwrite). `compression = Some("gzip")`
    * writes `.json.gz` parts (the `.jsonl.gz` convention most corpus
    * distributions ship; the reader decompresses transparently).
    * Returns the shard count.
    */
  def writeJsonlShards(docs: DataFrame, outDir: String,
      docsPerShard: Long = 256L, idCol: String = "doc_id",
      compression: Option[String] = None): Long =
    graft.ops.Packing.writePreSharded(
      graft.ops.Pipeline.shardAssignment(docs, docsPerShard, idCol),
      outDir, orderCol = "_shufkey", dropCols = Seq("_shufkey"),
      format = "json",
      writerOptions = compression.map("compression" -> _).toMap)

  /** Read a [[writeJsonlShards]] layout. `schema` lists the corpus
    * columns (line fields); the `shard` partition column is appended by
    * directory discovery.
    *
    * `mode` defaults to FAILFAST — Spark's JSON default (PERMISSIVE)
    * turns a corrupt line into an all-null row SILENTLY, which for
    * training data means a truncated upload quietly feeds null
    * documents to the tokenizer. A curation engine fails loudly;
    * callers that really want salvage-what-parses pass "PERMISSIVE"
    * explicitly. */
  def readJsonlShards(spark: SparkSession, dir: String,
      schema: StructType, mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema.add("shard", LongType))
      .option("mode", mode).json(dir)

  /** STREAMING JSONL ingestion — crawlers drop `.jsonl(.gz)` files into
    * a landing directory; Structured Streaming's file source discovers
    * each new file exactly once (checkpointed file index), so the drop
    * directory becomes an ingest stream the streaming curation gates
    * ([[graft.streaming.StreamingWindows]] dedup / near-dup / Bloom /
    * quality filters) compose over unchanged — they are plan-neutral
    * stream-static forms. Explicit schema is REQUIRED by streaming file
    * sources (no inference), which is also the 100 TB-correct posture.
    * `maxFilesPerTrigger` bounds a micro-batch (backpressure when a
    * backfill dumps thousands of files at once).
    */
  def readJsonlStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(dir)
  }
}
