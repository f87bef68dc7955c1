package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (100 TB join strategy): persisting both join
  * sides bucketed by the join key lets Spark plan a SortMergeJoin with NO
  * shuffle exchange — each bucket pair joins locally. At 100 TB this is
  * the difference between re-shuffling the fact table per query and
  * reading co-located buckets.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwrites). Drops any
    * previous table AND its on-disk location first — a stale warehouse
    * directory from an earlier session isn't in the fresh in-memory
    * catalog, and saveAsTable refuses to reuse the location.
    */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    // catalog directories are lowercased simple names
    val loc = new java.io.File(warehouse, table.split('.').last.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two pre-bucketed tables on their bucket key. With equal bucket
    * counts the plan contains no ShuffleExchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True when the executed plan needs no shuffle for the join. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
