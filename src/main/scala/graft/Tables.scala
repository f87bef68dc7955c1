package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * Each table is a single parquet file under `\$dir/\$name.parquet`. Reads go
  * through `spark.read.parquet`, so Catalyst column pruning and filter
  * pushdown reach the scan for free. At cluster scale these would be
  * partitioned directories; the API is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default. Read it as a nanos-since-epoch long (exposed as
    * `ts_ns`) plus a microsecond-truncated TimestampType `ts`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // 64-bit integer division: `/` would go through double and lose
    // sub-256ns precision at 2024-era epochs (±1µs on real rows)
    apply(s, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view named after itself (mirrors what the
    * DuckDB oracle does), so `spark.sql` text can be shared with the oracle.
    * events goes through its typed loader (nanos handling). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
