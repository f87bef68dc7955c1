package graft

import org.apache.spark.sql.SparkSession

/** Dev scale-probe runner: time a comma-separated list of SparkEntry
  * queries quiescently (sequential, cold StageCache) against any SF dir.
  * The per-round ×10 probe rows in PLANS.md come from running this at
  * sf0.1 and at a GenScale'd tmp sf1.
  *
  * Usage: runMain graft.Probe <sfDir> <q1,q2,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: touch the big tables so JVM/codegen/page-cache
    // warmup doesn't land on the first probe
    Tables.lineitem(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    for (name <- names.split(',').map(_.trim).filter(_.nonEmpty)) {
      // same reset as the Bench quiescent pass (the numbers must be
      // comparable): operators cold, shared fixture scaffolding warm
      graft.ops.StageCache.clearTransient()
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $s%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
