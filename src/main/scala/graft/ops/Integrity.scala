package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity auditing: for each declared FK relationship,
  * how many child rows point at a missing parent — the data-quality
  * gate a warehouse runs before trusting joins (an orphaned FK silently
  * drops rows from every inner join downstream).
  *
  * Scale shape (100 TB children): each leg first reduces the child to
  * DISTINCT fk values with counts (ONE map-side-combined shuffle on the
  * fk — the anti-join then runs on the reduced key set, not the raw
  * child), anti-joins the parent's key projection (hash join, both
  * sides key-pruned scans), and folds to a ONE-ROW stats frame. Legs
  * are independent and union trivially.
  */
object Integrity {

  /** One audit row for `child.fkCol -> parent.pkCol`:
    * (relationship, n_child, n_null_fk, n_orphan, orphan_rate) with
    * orphan counted over child ROWS (null fks are reported separately,
    * not as orphans) and rate = round(n_orphan / n_child, 6).
    */
  def fkLeg(name: String, child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val fks = child.groupBy(col(fkCol).as("_fk"))
      .agg(count(lit(1)).as("_cnt"))
    val totals = fks.agg(
      coalesce(sum(col("_cnt")), lit(0L)).as("n_child"),
      coalesce(sum(when(col("_fk").isNull, col("_cnt"))), lit(0L))
        .as("n_null_fk"))
    val orphans = fks.filter(col("_fk").isNotNull)
      .join(parent.select(col(pkCol).as("_fk")).distinct(),
        Seq("_fk"), "left_anti")
      .agg(coalesce(sum(col("_cnt")), lit(0L)).as("n_orphan"))
    totals.crossJoin(orphans)
      .select(lit(name).as("relationship"), col("n_child"),
        col("n_null_fk"), col("n_orphan"),
        when(col("n_child") =!= 0,
          round(col("n_orphan").cast("double") /
            col("n_child").cast("double"), 6)).as("orphan_rate"))
  }

  /** The audit over every declared relationship, one row per leg. */
  def fkAudit(legs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    legs.map { case (n, c, fk, p, pk) => fkLeg(n, c, fk, p, pk) }
      .reduce(_ union _)
}
