package org.apache.spark

/** Test-only access to `SparkContext.checkpointDir` (private[spark]): lets
  * a spec exercise the reliable-checkpoint path of
  * `graft.ops.Checkpoints.materialize` and then restore the shared
  * session's local-mode default for the rest of the suite.
  */
object GraftTestBridge {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
