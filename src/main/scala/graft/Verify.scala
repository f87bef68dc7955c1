package graft

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Queries run
  * concurrently (they are independent; results land in separate dirs).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // RELIABLE (file-backed) checkpoints for the correctness run:
    // Checkpoints.materialize prefers them when a dir is set. The
    // fallback localCheckpoint stores lineage-truncated blocks in
    // executor storage, and under the 297-query contended sweep one
    // sf1 run produced an impossible jaccard denominator (PLANS.md
    // round-13 incident note) — file-backed checkpoints take block
    // storage out of the correctness path entirely, exactly what a
    // production cluster run does (HDFS/object-store checkpoint dir).
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    // regression gate: if a future edit drops the setCheckpointDir above
    // (or a refactor loses it), every materialize in this sweep fails
    // LOUDLY instead of silently falling back to block-storage
    // localCheckpoints — the round-13 incident class stays closed by
    // code, not by memory
    spark.conf.set(graft.ops.Checkpoints.RequireReliableKey, "true")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(cpus.toInt * 2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // dev bisection aid (driver never sets it): run only these queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty[String])
    val futures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // remove any STALE output from a previous run: a leftover
          // parquet dir would make the checker compare yesterday's
          // result and report a false OK for a failing query
          // depth-first: a failed Spark write can leave nested
          // _temporary/ trees a flat listFiles().delete() silently
          // skips, surviving as exactly the false-OK this guards
          def deleteTree(f: java.io.File): Unit = {
            if (f.isDirectory)
              Option(f.listFiles()).foreach(_.foreach(deleteTree))
            if (!f.delete() && f.exists())
              System.err.println(
                s"[verify] WARN: could not delete stale ${f.getPath}")
          }
          val dir = new java.io.File(s"$outDir/$name")
          if (dir.exists()) deleteTree(dir)
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()

    // dump ALL oracles even under a dev ONLY filter: tools/oracle_types.py
    // DESCRIBEs the full map without needing Spark outputs, and check.py
    // skips entries with no parquet dir
    OracleJson.write(outDir)
    spark.stop()
    // the reliable-checkpoint files served their purpose (materialized
    // intermediates for THIS sweep) — delete the temp dir so repeated
    // Verify runs don't accumulate 297 queries' worth of checkpoint
    // blocks in /tmp (round-13 ADVICE)
    def deleteTree(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
      f.delete(): Unit
    }
    deleteTree(ckptDir.toFile)
  }
}
