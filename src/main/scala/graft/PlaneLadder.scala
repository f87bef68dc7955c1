package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness: the plane-literal JIT ladder (round-18
  * verdict Next #1). For each band shape it measures the LITERAL
  * stacked-band-key projection (inlined plane arrays) against the
  * BROADCAST plane-matrix UDF on a deterministic d=64 corpus, and
  * reads the literal plan's max generated-method bytecode size — the
  * number that predicts the HotSpot ~8,000-byte JIT cliff the
  * centroid family measured in round 18 (PLANS.md A/B table).
  *
  * BUDGET-AWARE: cliff shapes run >1000x slow (a first full-size run
  * sat 18 minutes in ONE literal rep), so the literal pass is timed on
  * 200k rows only while its max generated method stays under the 8 KB
  * JIT limit; past it the literal is timed on `nRows/20` rows and
  * reported with the scale factor. The broadcast pass always runs the
  * full 200k.
  *
  *   sbt "runMain graft.PlaneLadder [nRows]"
  *
  * Output: one markdown table row per shape for PLANS.md.
  */
object PlaneLadder {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity

    // MATERIALIZED fixture (the spark-plan-blowup lesson: an inline
    // transform() fixture gets CollapseProject-inlined into EVERY plane
    // dot — 128 copies of the generator — which is what a parquet
    // embedding read never pays; localCheckpoint makes `e` a plain
    // bound column, the production shape)
    val base = spark.range(nRows).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => (i * (col("id") + 1) % 97).cast("double") / 97.0).as("e"))
      .localCheckpoint()
    def vecs(n: Int) = if (n >= nRows) base else base.filter(col("vec_id") < n)

    // warm codegen/shuffle once
    vecs(nRows).select(sum(col("e")(0))).collect()

    def timeBest(reps: Int)(f: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    def maxMethodSize(df: org.apache.spark.sql.DataFrame): Int = {
      val stats = org.apache.spark.sql.execution.debug
        .codegenStringSeq(df.queryExecution.executedPlan)
      if (stats.isEmpty) -1 else stats.map(_._3.maxMethodCodeSize).max
    }

    // shapes: total planes 128 (committed x256 shape) up the ladder to
    // the asserted-not-measured 2048 bound, r fixed at 16 past 256 (the
    // rule shape) so the per-band method body is constant and only the
    // band count / total literal mass grows
    val shapes = Seq((2, 8), (4, 8), (6, 8), (8, 8), (12, 8), (16, 8),
      (8, 16), (4, 16), (16, 12))
    println("| shape (b x r) | planes | literal max method B | literal | " +
      "broadcast (200k) |")
    println("| --- | --- | --- | --- | --- |")
    for ((nb, r) <- shapes) {
      val msize = maxMethodSize(
        Similarity.literalStackedBandKeys(vecs(nRows), nb, r, dim))
      val jitSafe = msize >= 0 && msize < 8000
      val (litRows, reps) = if (jitSafe) (nRows, 2) else (nRows / 20, 1)
      val tLit = timeBest(reps) {
        Similarity.literalStackedBandKeys(vecs(litRows), nb, r, dim)
          .select(sum(col("bk")), count(lit(1))).collect()
      }
      val tBc = timeBest(2) {
        vecs(nRows).select(col("vec_id"),
            posexplode(Similarity.broadcastBandKeys(col("e"), nb, r, dim)))
          .select(sum(col("col")), count(lit(1))).collect()
      }
      val litNote = if (litRows == nRows) f"$tLit%.2f s"
        else f"$tLit%.2f s @ ${litRows / 1000}k rows (x20 fewer)"
      println(f"| ${nb}x$r | ${nb * r} | $msize | $litNote | $tBc%.2f s |")
      Console.flush()
    }
    spark.stop()
  }
}
