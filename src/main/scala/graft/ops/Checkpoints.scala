package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization boundary for load-bearing intermediate pipeline state
  * (LSH candidate-pair edge lists, cluster labels): executes the plan
  * eagerly and truncates lineage, choosing the storage tier by what the
  * session has configured.
  *
  *   - With a RELIABLE checkpoint dir configured
  *     (`spark.sparkContext.setCheckpointDir(...)` — HDFS/object store in
  *     production), uses `Dataset.checkpoint()`: the materialized blocks
  *     survive executor loss, the right default for a 100 TB run where a
  *     single lost executor between stages must not become an
  *     unrecoverable job failure (lineage is truncated, so nothing can be
  *     recomputed from upstream).
  *   - Otherwise falls back to `localCheckpoint()`: executor-local,
  *     unreplicated blocks — the low-latency local-mode/dev path, where
  *     "executor loss" means the whole JVM died anyway.
  *
  * Both forms are eager, so callers can unpersist their inputs immediately
  * after this returns (the cache-lifecycle discipline the dedup stages
  * rely on).
  *
  * Lifecycle: reliable checkpoint FILES are not deleted by Spark unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * ([[graft.GraftConf.scaleProfile]] sets it) — without it a long-lived
  * session accumulates checkpoint dirs per invocation.
  */
object Checkpoints {

  /** Session-conf flag a CORRECTNESS run sets (graft.Verify does): when
    * `true`, [[materialize]] REFUSES the localCheckpoint fallback and
    * throws if no reliable checkpoint dir is configured. This is the
    * regression gate for the round-13 incident class (PLANS.md): a
    * contended full sweep once produced an inconsistent read from
    * executor block storage via the localCheckpoint path — the fix was
    * file-backed checkpoints, and this flag makes any future code path
    * that loses the checkpoint dir fail FAST instead of silently
    * reopening that window.
    */
  val RequireReliableKey = "graft.checkpoints.requireReliable"

  def materialize(df: DataFrame): DataFrame = {
    val out = materialize0(df)
    // ownership tagging (StageCache eviction hygiene): when this
    // materialize runs inside a memoized stage, the checkpointed RDD
    // becomes disposable with that cache entry
    StageCache.registerOwned(out)
    out
  }

  private def materialize0(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // RDD checkpointing runs TWO jobs: the eager action computes the
      // plan, then the checkpoint-write job re-runs the (otherwise
      // unpersisted) RDD from lineage to write the files. Persisting
      // first makes the write job read cached blocks instead of
      // re-executing the upstream lineage — without this, every
      // materialize in production mode pays its plan twice, exactly the
      // double pass the callers exist to avoid. Unpersist after: the
      // checkpoint files are the durable copy.
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint() finally df.unpersist()
    } else if (df.sparkSession.conf
        .getOption(RequireReliableKey).contains("true")) {
      throw new IllegalStateException(
        "Checkpoints.materialize: this session requires RELIABLE " +
          "checkpoints (" + RequireReliableKey + "=true) but no " +
          "checkpoint dir is set — call sparkContext.setCheckpointDir " +
          "before running the correctness sweep (round-13 incident gate)")
    } else df.localCheckpoint()
}
