package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time (and optionally explain) individual SparkEntry queries.
  *
  *   sbt "runMain graft.TimeQuery x40_corpus_merge [x03_minhash_lsh ...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_EXPLAIN=1 to print the formatted physical plan first.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm codegen/shuffle
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted}"))
      // NOTE: with SPARK_GRAFT_EXPLAIN set the builder runs TWICE —
      // eagerly-materializing builders (checkpointed LSH pairs, k-means
      // training) pay their full build once for the explain and again for
      // the timed count below; the timing still reflects a cold build.
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      // time the BUILD too: eagerly-materializing operators (checkpointed
      // LSH pairs, k-means training) do real work inside the query builder
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
