package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Stage-level profile of the curation BACKBONE (the shared chain under
  * x35/x54/x60/x76/x105-x107/x112/x243/x247/x253) — same purpose as
  * X61Prof: put the round-20 effort on the measured bottleneck.
  * Usage: runMain graft.BackboneProf [sfDir]
  */
object BackboneProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 97 === 0)

    def t[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[bb] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    for (rep <- 1 to 2) {
      StageCache.clearTransient()
      println(s"[bb] --- rep $rep ---")
      val good = t("quality filter (materialize)") {
        Checkpoints.materialize(corpus.filter(
          TextAnalysis.qualityExpr(col("text")) > 0.3))
      }
      val exactKeep = good.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keeper"))
      val exact = t("exact keeper join") {
        Checkpoints.materialize(
          good.withColumn("h", md5(col("text")))
            .join(exactKeep, "h")
            .filter(col("doc_id") === col("keeper"))
            .drop("h", "keeper"))
      }
      val pairs = t("LSH candidate pairs") {
        Dedup.lshCandidatePairs(exact, bands = 8, rowsPerBand = 2)
      }
      val verified = t("jaccard verification") {
        Checkpoints.materialize(
          Dedup.jaccard(exact, pairs).filter(col("jaccard") >= 0.5)
            .select(col("id_a"), col("id_b")))
      }
      val clusters = t("cluster 3 rounds") {
        Checkpoints.materialize(Dedup.clusterPairs(verified, rounds = 3))
      }
      val deduped = t("near-dup anti-join") {
        Checkpoints.materialize(
          exact.join(clusters.filter(col("cluster") =!= col("doc_id"))
            .select(col("doc_id")), Seq("doc_id"), "left_anti"))
      }
      t("contamination + count") {
        val contaminated = Dedup.contamination(deduped, evalSet, shingleN = 5)
          .filter(col("n_shared") > 4L).select(col("doc_id"))
        deduped.join(contaminated, Seq("doc_id"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
