package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without the single-partition window funnel.
  *
  * RANK/DENSE_RANK/ROW_NUMBER over a global ORDER BY make Spark move the
  * entire dataset through ONE task (WindowExec warns "No Partition
  * Defined"). The scale-safe equivalent used here:
  *
  *   1. range-partition on the sort key — partition order = global order,
  *      and the RangePartitioner maps EQUAL keys to the SAME partition, so
  *      rank ties never straddle a partition boundary;
  *   2. rank within each partition in parallel (window partitioned by the
  *      physical partition id);
  *   3. add per-partition offsets — row counts for RANK, distinct-key
  *      counts for DENSE_RANK — computed on a one-row-per-partition
  *      summary (the only "global" step, over O(partitions) rows) and
  *      broadcast back.
  *
  * Identical results to the global window at any partition count.
  *
  * Load-bearing invariant: the offsets subtree is pruned by Catalyst down
  * to the same scan + range-exchange prefix as the ranking subtree, and
  * exchange reuse materializes that prefix ONCE — so both
  * `spark_partition_id()` taggings see identical bucket boundaries (two
  * independent RangePartitioners could sample different ones). PlanSpec
  * asserts the executed plan contains a ReusedExchange.
  */
object Ranking {

  /** The reuse invariant's PRECONDITION, enforced: the decomposition's
    * two `_bucket` consumers (offsets summary, local ranking) must
    * canonicalize to the SAME range exchange for Spark's reuse to
    * collapse them. A rider column the summary branch doesn't consume
    * lets Catalyst prune the two branches differently; the exchanges
    * stop canonicalizing equal, each samples its OWN partition
    * boundaries, and offsets from one bucketing meet labels from
    * another — ranks corrupt by up to a partition of rows (observed as
    * ±30k rank errors at ×10 scale before this guard existed). Callers
    * must rank a projection holding ONLY the consumed columns and join
    * riders back on a unique key.
    */
  private def requireNoRiders(df: DataFrame, consumed: Seq[String],
      helper: String): Unit = {
    val extra = df.columns.toSet -- consumed.toSet
    require(extra.isEmpty,
      s"$helper input may carry only the consumed columns " +
        s"(${consumed.mkString(", ")}); rider columns " +
        s"(${extra.toSeq.sorted.mkString(", ")}) break the range-exchange " +
        "reuse the rank decomposition depends on — rank a projection and " +
        "join riders back on a unique key (see the scaladoc)")
  }

  /** keys: (column, ascending) pairs defining the global ranking order. */
  def withGlobalRanks(df: DataFrame, keys: Seq[(String, Boolean)],
      rankCol: String = "rnk", denseCol: String = "drnk"): DataFrame = {
    require(keys.nonEmpty, "ranking needs at least one sort key")
    requireNoRiders(df, keys.map(_._1), "withGlobalRanks")
    val ord = keys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val keyStruct = struct(keys.map(k => col(k._1)): _*)

    val ranged = df.repartitionByRange(ord: _*)
      .withColumn("_bucket", spark_partition_id())
    val w = Window.partitionBy(col("_bucket")).orderBy(ord: _*)
    val local = ranged
      .withColumn("_lrank", rank().over(w))
      .withColumn("_ldense", dense_rank().over(w))

    // one row per partition; the exclusive running sums over this summary
    // are O(partitions), not O(rows)
    val sums = local.groupBy(col("_bucket"))
      .agg(count(lit(1)).as("_n"), count_distinct(keyStruct).as("_nd"))
    val wCum = Window.orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("_roff", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .withColumn("_doff", coalesce(sum(col("_nd")).over(wCum), lit(0L)))
      .select(col("_bucket"), col("_roff"), col("_doff"))

    // 64-BIT ranks: the offsets are already Long, and a 100 TB corpus
    // passes 2^31 rows — an int rank would silently wrap exactly at the
    // scale this decomposition exists for
    local.join(broadcast(offsets), "_bucket")
      .withColumn(rankCol, (col("_lrank") + col("_roff")).cast("long"))
      .withColumn(denseCol, (col("_ldense") + col("_doff")).cast("long"))
      .drop("_bucket", "_lrank", "_ldense", "_roff", "_doff")
  }

  /** Skew-safe exact top-k per group (the per-domain document cap): the
    * single-window form funnels each group through one task — fatal when
    * one domain holds 10% of a 100 TB crawl. Two phases instead:
    *
    *   1. rank within (group, salt) — `saltCol mod salts`, any
    *      deterministic row-level column — and keep k per salt cell, so
    *      no task ever sees more than one cell of a hot group and at
    *      most `salts * k` rows per group survive;
    *   2. rank the survivors within the group and keep k.
    *
    * Exact: any row in a group's global top k ranks <= k within its salt
    * cell (its cell contains only a subset of the rows above it), so
    * phase 1 never drops a winner; and every row globally above a winner
    * is itself a winner, hence a survivor — so phase 2's ranks equal the
    * single-window ranks, values included. `ord` must be a TOTAL order
    * (append a unique id as the last key) or ranks are nondeterministic
    * — same contract as the plain window.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int, ord: Seq[Column],
      saltCol: Column, salts: Int, rankName: String = "rnk"): DataFrame = {
    require(k >= 1 && salts >= 1, s"need k >= 1 and salts >= 1, got $k, $salts")
    val w1 = Window.partitionBy(col(groupCol), col("_salt")).orderBy(ord: _*)
    val survivors = df.withColumn("_salt", pmod(saltCol, lit(salts)))
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= k)
      .drop("_salt", "_r1")
    val w2 = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    survivors.withColumn(rankName, row_number().over(w2).cast("long"))
      .filter(col(rankName) <= k)
  }

  /** Exact PER-GROUP row numbers without the per-group window funnel —
    * the group-keyed sibling of [[withGlobalRanks]]. A window partitioned
    * by group routes each group through ONE task, which is fatal exactly
    * when it matters (ranking all of one language's documents inside a
    * 100 TB corpus). Decomposition:
    *
    *   1. range-partition on (group, keys...) — each group occupies a
    *      CONTIGUOUS run of partitions, ordered within;
    *   2. row_number within (physical partition, group) in parallel;
    *   3. add per-(partition, group) offsets. Because groups are
    *      contiguous under the range partitioning, the offsets summary
    *      has at most partitions + groups − 1 rows — O(small) — and its
    *      per-group running sum is a window over that summary only.
    *
    * Same ReusedExchange invariant as [[withGlobalRanks]]: the summary
    * subtree shares the ranking subtree's range exchange, so both see
    * identical bucket boundaries and the input executes once. `keys`
    * must totally order rows WITHIN a group (append a unique id) for a
    * deterministic result — the plain window's contract.
    */
  def withGroupRanks(df: DataFrame, groupCol: String,
      keys: Seq[(String, Boolean)], rankCol: String = "rnk"): DataFrame = {
    require(keys.nonEmpty, "ranking needs at least one sort key")
    requireNoRiders(df, groupCol +: keys.map(_._1), "withGroupRanks")
    val ord = keys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val fullOrd = col(groupCol).asc +: ord

    val ranged = df.repartitionByRange(fullOrd: _*)
      .withColumn("_bucket", spark_partition_id())
    val w = Window.partitionBy(col("_bucket"), col(groupCol)).orderBy(ord: _*)
    val local = ranged.withColumn("_lrank", row_number().over(w))

    val sums = local.groupBy(col("_bucket"), col(groupCol))
      .agg(count(lit(1)).as("_n"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("_roff", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .select(col("_bucket"), col(groupCol), col("_roff"))

    local.join(broadcast(offsets), Seq("_bucket", groupCol))
      .withColumn(rankCol, (col("_lrank") + col("_roff")).cast("long"))
      .drop("_bucket", "_lrank", "_roff")
  }

  /** [[withGroupRanks]] extended to also carry an INCLUSIVE per-group
    * running sum of `valCol` (token prefix mass, byte offsets, …): same
    * decomposition — range partition on (group, keys), local windows per
    * (partition, group), and an O(partitions · groups) summary carrying
    * row counts AND value mass, broadcast back — so neither a dominant
    * group nor a global window funnels one task. Both outputs are Long. */
  def withGroupPrefixSums(df: DataFrame, groupCol: String,
      keys: Seq[(String, Boolean)], valCol: String,
      rankCol: String = "rnk", prefixCol: String = "ctot"): DataFrame = {
    require(keys.nonEmpty, "prefix sums need at least one sort key")
    requireNoRiders(df, groupCol +: valCol +: keys.map(_._1),
      "withGroupPrefixSums")
    val ord = keys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val fullOrd = col(groupCol).asc +: ord

    val ranged = df.repartitionByRange(fullOrd: _*)
      .withColumn("_bucket", spark_partition_id())
    val w = Window.partitionBy(col("_bucket"), col(groupCol)).orderBy(ord: _*)
    val local = ranged.withColumn("_lrank", row_number().over(w))
      .withColumn("_lsum", sum(col(valCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val sums = local.groupBy(col("_bucket"), col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(col(valCol)).as("_v"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("_roff", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .withColumn("_voff", coalesce(sum(col("_v")).over(wCum), lit(0L)))
      .select(col("_bucket"), col(groupCol), col("_roff"), col("_voff"))

    local.join(broadcast(offsets), Seq("_bucket", groupCol))
      .withColumn(rankCol, (col("_lrank") + col("_roff")).cast("long"))
      .withColumn(prefixCol, (col("_lsum") + col("_voff")).cast("long"))
      .drop("_bucket", "_lrank", "_lsum", "_roff", "_voff")
  }
}
