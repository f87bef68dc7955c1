package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** A/B the two stacked-band-key routes feeding lshCandidatePairs
  * (round 20): the committed explode/groupBy signature (codegen'd
  * per-shingle md5, ONE corpus-scale exchange at the groupBy) vs the
  * map-only HOF route (bandKeysArray post-bindOnce — interpreted md5
  * inside the fold, ZERO exchange). PLANS.md recorded the HOF form as
  * a negative result in an early round — but that measurement predates
  * the bindOnce fix, which removed the k× duplicated hash pass that
  * made it lose. Interleaved noop-sink timing, same JVM.
  * Usage: runMain graft.SigBench [sfDir] [reps]
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    def stackedViaAgg() = {
      val sig = Dedup.bandKeys(Dedup.minhashSignature(docs, 16), 8, 2)
      sig.select(col("doc_id"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("bid"), col(s"band$b").as("bk"))): _*)).as("band"))
        .select(col("doc_id"), col("band.bid").as("bid"), col("band.bk").as("bk"))
    }
    def stackedViaHof() =
      docs.select(col("doc_id"),
          posexplode(Dedup.bandKeysArray(col("text"), 8, 2)))
        .select(col("doc_id"), col("pos").cast("int").as("bid"), col("col").as("bk"))

    // parity first (bid is the array position in both constructions)
    val a = stackedViaAgg().collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val b = stackedViaHof().collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    require(a == b, s"routes diverge: ${(a -- b).take(3)} / ${(b -- a).take(3)}")
    println(s"[sig] parity OK (${a.size} stacked rows)")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[sig] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    for (r <- 1 to reps) {
      time(s"explode/groupBy r$r")(stackedViaAgg())
      time(s"map-only HOF r$r")(stackedViaHof())
    }
    spark.stop()
  }
}
