package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Source-layer behaviors that carry the 100 TB story: hive-partitioned
  * directory layout with partition pruning at the scan, and schema
  * evolution across parquet parts (mergeSchema).
  */
class SourcesSpec extends SparkSuite {

  test("partitioned parquet: a partition filter prunes directories at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part_layout").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value", "event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    // correctness: only the one partition's rows
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click").count()
    assert(q.count() == want && want > 0)
    // plan: the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan data filter
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.partitionFilters}")
    assert(scan.relation.location.inputFiles.forall(_.contains("event_type=click")) ||
      scan.metadata.get("PartitionFilters").exists(_.contains("event_type")))
  }

  test("schema evolution: mergeSchema unions columns across parquet parts") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    frame("id" -> Seq(1, 2), "a" -> Seq(10L, 20L))
      .write.mode("overwrite").parquet(s"$dir/v=1")
    frame("id" -> Seq(3), "a" -> Seq(30L), "b" -> Seq("new"))
      .write.mode("overwrite").parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "v"))
    assert(merged.count() == 3)
    // old rows surface the new column as null
    assert(merged.filter(col("v") === 1 && col("b").isNull).count() == 2)
    assert(collectCol[String](merged.filter(col("v") === 2), "b") == Seq("new"))
  }

  test("writeShards: one file per shard, contiguous id ranges in order, " +
      "last shard partial, shard count returned") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val per = 64L
    val nShards = graft.ops.Packing.writeShards(docs, dir, per)
    assert(nShards == (ids.length + per - 1) / per)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(
        _.getName.stripPrefix("shard=").toLong)
    assert(shardDirs.length == nShards)
    shardDirs.foreach { d =>
      val k = d.getName.stripPrefix("shard=").toLong
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k has ${files.length} data files")
      // read the single file directly: in-file order must be id-ascending
      // and its content exactly the k-th contiguous slice of the id order
      val got = spark.read.parquet(files.head.getPath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(got.toSeq == got.sorted.toSeq, s"shard $k not id-ordered in file")
      val want = ids.slice((k * per).toInt,
        math.min(ids.length.toLong, (k + 1) * per).toInt)
      assert(got.sorted.toSeq == want.toSeq, s"shard $k wrong id slice")
      val expected = if (k == nShards - 1) ids.length - (nShards - 1) * per
        else per
      assert(got.length == expected, s"shard $k size ${got.length}")
    }
  }
}
