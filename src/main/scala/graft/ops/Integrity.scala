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

  /** Right-to-be-forgotten propagation audit: for each (table, key)
    * pair, how many rows a deletion list removes. Returns one row per
    * table: (table, n_before, n_deleted, n_after, deleted_rate) —
    * the accounting a GDPR/CCPA erasure job must emit; the cleaned
    * frame itself is `df.join(ids, key, "left_anti")` with the id list
    * broadcast (deletion lists are small by nature).
    *
    * Scale: ONE scan per table — the deleted count comes from a
    * broadcast semi-join flag aggregated map-side, not a separate
    * anti-join pass; no shuffle of the fact table at all.
    */
  def forgetAudit(tables: Seq[(String, DataFrame, String)],
      ids: DataFrame, idCol: String = "user_id"): DataFrame = {
    val idSet = broadcast(ids.select(col(idCol).as("_id")).distinct())
    tables.map { case (name, df, key) =>
      df.select(col(key).as("_k"))
        .join(idSet, col("_k") === col("_id"), "left")
        .agg(count(lit(1)).as("n_before"),
          coalesce(sum(when(col("_id").isNotNull, 1L)), lit(0L))
            .as("n_deleted"))
        .select(lit(name).as("table_name"), col("n_before"),
          col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"),
          when(col("n_before") =!= 0,
            round(col("n_deleted").cast("double") /
              col("n_before").cast("double"), 6)).as("deleted_rate"))
    }.reduce(_ union _)
  }

  /** k-anonymity audit over a quasi-identifier column set: how
    * re-identifiable is this table if `qi` leaks? Reports the group-size
    * floor and how much of the table sits in groups smaller than `k`
    * (those rows are the privacy risk — small QI groups pin individuals).
    * Output (one row): `k, n_rows, n_groups, min_group, n_small_groups,
    * n_rows_small, small_rate` with rate round 6.
    *
    * Scale: ONE map-side-combined groupBy on the QI tuple, then a
    * one-row rollup over group sizes. Null QI values group as their own
    * key (null-safe grouping, the SQL GROUP BY default) — nulls are a
    * quasi-identifier value like any other for linkage purposes.
    */
  def kAnonymity(df: DataFrame, qi: Seq[String], k: Long = 5): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    val sizes = df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("_n"))
    sizes.agg(
        sum(col("_n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("_n")).as("min_group"),
        coalesce(sum(when(col("_n") < k, 1L)), lit(0L)).as("n_small_groups"),
        coalesce(sum(when(col("_n") < k, col("_n"))), lit(0L))
          .as("n_rows_small"))
      .select(lit(k).as("k"), col("n_rows"), col("n_groups"),
        col("min_group"), col("n_small_groups"), col("n_rows_small"),
        round(col("n_rows_small").cast("double") /
          col("n_rows").cast("double"), 6).as("small_rate"))
  }

  /** l-diversity audit — [[kAnonymity]]'s companion: within each
    * quasi-identifier group, how many DISTINCT values does the sensitive
    * column take? A group where everyone shares one sensitive value
    * leaks it to anyone who can link the QI tuple, even if the group is
    * k-large. Output (one row): `l, n_rows, n_groups, min_diversity,
    * n_failing, n_rows_failing, failing_rate` — groups with fewer than
    * `l` distinct sensitive values fail.
    *
    * Scale: ONE map-side-combined groupBy on (QI tuple, sensitive) —
    * the exact distinct reduction — then a QI-tuple rollup and a one-row
    * summary. Null handling mirrors kAnonymity: null QI values group as
    * keys; a null sensitive value counts as a distinct value (it is one
    * more thing the linker learns the group may hold).
    */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String,
      l: Long = 2): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    val perPair = df.groupBy((qi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val perGroup = perPair.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("_div"), sum(col("_n")).as("_rows"))
    perGroup.agg(
        sum(col("_rows")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("_div")).as("min_diversity"),
        coalesce(sum(when(col("_div") < l, 1L)), lit(0L)).as("n_failing"),
        coalesce(sum(when(col("_div") < l, col("_rows"))), lit(0L))
          .as("n_rows_failing"))
      .select(lit(l).as("l"), col("n_rows"), col("n_groups"),
        col("min_diversity"), col("n_failing"), col("n_rows_failing"),
        round(col("n_rows_failing").cast("double") /
          col("n_rows").cast("double"), 6).as("failing_rate"))
  }

  /** ε-differentially-private release of group counts via the Laplace
    * mechanism (Dwork et al. 2006; sensitivity 1 for counting
    * queries): `noisy = n + Lap(1/ε)` per group, with the noise drawn
    * by inverse-CDF from an md5-derived uniform — a DETERMINISTIC
    * stand-in for the secure RNG (the Multimodal stub convention: the
    * plumbing — scale, inverse CDF, per-group draw — is real and
    * oracle-replayable; production swaps the uniform for
    * SecureRandom, since reproducible noise is not private). Returns
    * `(group, n_exact, noise, noisy_n, epsilon)` round 6 — n_exact
    * rides along as the calibration audit (kmv convention; a real
    * release drops it).
    *
    * Scale: one map-side-combined group reduce; one md5 + one ln per
    * GROUP (not per row).
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      salt: String = "dp"): DataFrame = {
    require(epsilon > 0, s"need epsilon > 0, got $epsilon")
    val counts = df.groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).as("n_exact"))
    // u in (0,1): (hv + 0.5) / 2^32 — never exactly 0, 1/2, or 1
    val u = (expr(graft.ops.TextAnalysis.hexToIntSql("_d", 8))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val centered = col("_u") - lit(0.5)
    val noise = (lit(-1.0) / lit(epsilon)) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts
      .withColumn("_d", md5(concat(lit(s"$salt:"), col("group"))))
      .withColumn("_u", u)
      .withColumn("_noise", noise)
      .select(col("group"), col("n_exact"),
        round(col("_noise"), 6).as("noise"),
        round(col("n_exact").cast("double") + col("_noise"), 6)
          .as("noisy_n"),
        lit(epsilon).as("epsilon"))
  }

  /** Approximate functional-dependency audit for `det -> dep`: the g3
    * error (Kivinen–Mannila) — the minimum fraction of rows to delete
    * so the dependency holds exactly, i.e. per determinant key keep the
    * modal dependent value and count everything else as a violation.
    * One row per audited pair: (rel, n_rows, n_keys, n_violating_keys,
    * n_violations, g3_rate). A 0 rate certifies the FD (safe to
    * normalize on it / use it as a partition invariant); small positive
    * rates locate dirty keys.
    *
    * Determinism: counting only — every output is an exact integer
    * except the final round-6 rate of two exact integers. The modal
    * count per key is max(cnt) (value identity irrelevant, so no
    * tie-break needed).
    *
    * Scale: ONE (det, dep) groupBy with map-side combine — the pair
    * space, not the corpus, flows into the per-key max/sum reduce —
    * then a ONE-ROW fold per audited pair. Pairs scan independently
    * and union trivially (the fkLeg posture).
    */
  def fdAudit(rel: String, df: DataFrame, detCol: String,
      depCol: String): DataFrame = {
    val cells = df.groupBy(col(detCol).as("_a"), col(depCol).as("_b"))
      .agg(count(lit(1)).as("_c"))
    val perKey = cells.groupBy(col("_a"))
      .agg(sum(col("_c")).as("_tot"), max(col("_c")).as("_keep"))
    perKey.agg(
        coalesce(sum(col("_tot")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("_tot") > col("_keep"), 1L).otherwise(0L)),
          lit(0L)).as("n_violating_keys"),
        coalesce(sum(col("_tot") - col("_keep")), lit(0L))
          .as("n_violations"))
      .select(lit(rel).as("rel"), col("n_rows"), col("n_keys"),
        col("n_violating_keys"), col("n_violations"),
        when(col("n_rows") > 0,
          round(col("n_violations").cast("double") /
            col("n_rows").cast("double"), 6)).as("g3_rate"))
  }
}
