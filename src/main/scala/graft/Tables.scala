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
  /** The events table's `ts` arrives in either of two parquet physical
    * types depending on the generator vintage: TIMESTAMP(NANOS) (which
    * Spark only reads as a long, via `nanosAsLong`) or TIMESTAMP(MICROS)
    * (read natively, as NTZ under `inferTimestampNTZ`). Both are exposed
    * under one loader contract: `ts_ns` = nanos-since-epoch long, `ts` =
    * microsecond TimestampType — so every downstream query and oracle is
    * schema-vintage-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // 64-bit integer division: `/` would go through double and lose
        // sub-256ns precision at 2024-era epochs (±1µs on real rows)
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // TIMESTAMP(MICROS): NTZ→LTZ cast is value-preserving because the
        // session timezone is pinned to UTC (GraftConf); nanos = micros·1000
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
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
