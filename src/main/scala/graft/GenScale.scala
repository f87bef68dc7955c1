package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale a driver-generated SF directory by an integer factor for
  * scale-up benchmarking (VERDICT r02 item 5). NOT test fixtures — the
  * oracle gates stay on the driver's read-only /root/testdata dirs.
  *
  *   sbt "runMain graft.GenScale /root/testdata/sf0.1 /root/repo/tmp/sf1 10"
  *
  * Each replica i shifts every key column by i·(max+1) of its base table,
  * so PK uniqueness and FK join fan-outs are preserved exactly (a customer
  * still owns the same number of orders, a part the same lineitems).
  * Fixed dimensions (region, nation) are copied once. Document text gets
  * every 4th token tagged with the replica id: with 5-token shingles every
  * shingle crosses a tagged token, so exact/near-dup structure WITHIN a
  * replica is byte-preserved while no spurious cross-replica near-dups
  * appear — dup rates scale linearly, like a real corpus, instead of
  * quadratically inflating LSH buckets. Embedding vectors keep their
  * distribution (ANN cost is row-count-driven); vec ids shift.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val Array(in, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = GraftConf.localProfile(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events stores TIMESTAMP(NANOS); read as long (Tables.events reads the
    // rewritten plain-INT64 `ts` identically through the same conf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[genscale] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    // one replicated frame per table: union of `factor` key-shifted copies
    def replicate(df: DataFrame, shifts: Map[String, Long])(
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        perReplica(shifts.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, col(c) + lit(i * span))
        }, i)
      }.reduce(_ unionByName _)
    def span(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val (cust, supp, part, ords, line, evts, docs, embs) = (
      read("customer"), read("supplier"), read("part"), read("orders"),
      read("lineitem"), read("events"), read("documents"), read("embeddings"))
    val (cSpan, sSpan, pSpan, oSpan) =
      (span(cust, "c_custkey"), span(supp, "s_suppkey"),
       span(part, "p_partkey"), span(ords, "o_orderkey"))

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", replicate(cust, Map("c_custkey" -> cSpan))())
    write("supplier", replicate(supp, Map("s_suppkey" -> sSpan))())
    write("part", replicate(part, Map("p_partkey" -> pSpan))())
    write("orders", replicate(ords,
      Map("o_orderkey" -> oSpan, "o_custkey" -> cSpan))())
    write("lineitem", replicate(line, Map(
      "l_orderkey" -> oSpan, "l_partkey" -> pSpan, "l_suppkey" -> sSpan))())
    write("events", replicate(evts, Map(
      "event_id" -> span(evts, "event_id"), "user_id" -> span(evts, "user_id")))())
    write("documents", replicate(docs, Map("doc_id" -> span(docs, "doc_id"))) {
      (d, i) =>
        if (i == 0) d
        else d.withColumn("text", array_join(zip_with(
          split(col("text"), " "),
          sequence(lit(0), size(split(col("text"), " ")) - 1),
          (t, j) => when(j % 4 === 3, concat(t, lit(s"_r$i"))).otherwise(t)), " "))
    })
    // cyclic-shift each replica's components: verbatim copies would make
    // every vector a cosine-1.0 cross-replica near-dup (quadratic pair
    // inflation in same-bucket joins); a shifted random vector is
    // decorrelated from the original while replica-internal geometry (all
    // pairwise dots) is preserved exactly
    write("embeddings", replicate(embs, Map("vec_id" -> span(embs, "vec_id"))) {
      (d, i) =>
        // shift modulo the dimension: factors past the dim would slice a
        // negative length (factor 100 x dim 64 broke here); i % dim keeps
        // every replica a valid rotation (replicas i and i+dim coincide
        // in geometry, which is fine — ids still differ)
        if (i == 0) d
        else {
          val sz = size(col("embedding"))
          val sh = pmod(lit(i), sz)
          d.withColumn("embedding", when(sh === 0, col("embedding"))
            .otherwise(concat(
              slice(col("embedding"), sh + 1, sz - sh),
              slice(col("embedding"), lit(1), sh))))
        }
    })
    spark.stop()
  }
}
