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
      val fn = SparkEntry.queries(name)
      // UNTIMED first pass: builds any planted-fixture scaffolding the
      // query shares with the suite (memoFixture entries), so the timed
      // window below measures the same cold set as an in-suite
      // quiescent reading — fixture warm, operators cold. Without it,
      // the first recall-family probe in a fresh JVM pays fixture
      // construction inside its timed window and reprobe_check would
      // compare (or worse, commit) a number Bench can never reproduce
      // (round-18 ADVICE).
      fn(spark, sfDir).count()
      // same reset as the Bench quiescent pass (the numbers must be
      // comparable): operators cold, shared fixture scaffolding warm
      graft.ops.StageCache.clearTransient()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $s%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
