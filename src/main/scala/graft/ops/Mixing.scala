package graft.ops

import graft.MDFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus mixture assembly: combine several sources with
  * per-source sampling weights, where a weight is interpreted as EPOCHS
  * over that source — the convention LLM data recipes use (e.g. "2.5×
  * Wikipedia, 0.3× CommonCrawl"). A weight w contributes floor(w) full
  * copies of every document plus one extra copy kept with probability
  * frac(w), so the expected token share of each source is exactly w ×
  * |source|.
  *
  * The fractional keep is the repo's deterministic md5-Bernoulli
  * ([[MDFrame.sampleDeterministic]] semantics, salted per source): the
  * same mixture falls out in any engine, any run, any partitioning —
  * reproducible training data, oracle-checkable.
  *
  * Scale shape: pure map work — a per-row explode of a ≤⌈w⌉-element
  * sequence and a codegen'd hash filter, then unions. No shuffle, no
  * driver state, linear at any corpus size.
  */
object Mixing {

  /** sources: (frame, weight ≥ 0) pairs sharing a schema; every output
    * row carries `source_id` (position in `sources`) and `epoch`
    * (0-based copy number; the fractional copy is epoch floor(w)).
    */
  def mixCorpora(sources: Seq[(DataFrame, Double)],
      idCol: String = "doc_id"): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.foreach { case (df, _) =>
      require(!df.columns.contains("source_id") && !df.columns.contains("epoch"),
        "source frames must not already have source_id/epoch columns " +
          "(they would be silently overwritten)")
    }
    sources.zipWithIndex.flatMap { case ((df, w), i) =>
      require(w >= 0.0, s"source $i has negative weight $w")
      val whole = math.floor(w).toLong
      val frac = w - whole
      val base = df.withColumn("source_id", lit(i))
      val copies =
        if (whole > 0)
          Some(base.withColumn("epoch",
            explode(sequence(lit(0L), lit(whole - 1)))))
        else None
      val extra =
        if (frac > 0.0)
          Some(base.filter(
              expr(TextAnalysis.hexToIntSql(s"md5(concat('mix:$i:', $idCol))", 12))
                < lit(MDFrame.bernoulliThreshold(frac)))
            .withColumn("epoch", lit(whole)))
        else None
      copies.toSeq ++ extra.toSeq
    } match {
      // all weights zero: an empty mixture with the output schema, not a
      // reduce-on-empty crash
      case Seq() => sources.head._1
        .withColumn("source_id", lit(0)).withColumn("epoch", lit(0L)).limit(0)
      case parts => parts.reduce(_ unionByName _)
    }
  }

  /** Temperature-based sampling weights over a grouping column — the
    * multilingual-training rebalance (sample share q_i ∝ p_i^α where
    * p_i is the natural share): α=1 keeps natural proportions, α→0
    * approaches uniform, α≈0.3-0.7 is the usual compromise. Returns one
    * row per group: (group, n_docs, p, q, boost) with `boost` = q/p —
    * the EPOCHS multiplier to feed [[mixCorpora]].
    *
    * Cross-engine determinism: q_i ∝ p_i^α ∝ n_i^α (the N^α normalizer
    * cancels), so the per-group terms are computed on the raw COUNTS and
    * snapped to integer micro-units (floor ×1e6) BEFORE the normalizing
    * sum — exact integer arithmetic, no float-summation order
    * dependence. α = 0.5 computes via sqrt (correctly-rounded IEEE on
    * every engine); other α go through libm pow (the x39/x62-class ulp
    * tolerance).
    *
    * Scale: one map-side-combinable count per group, two ONE-ROW
    * broadcasts (total docs, total micro-units) — the x57 scalar
    * pattern; O(groups) rows everywhere after the first aggregate.
    */
  def temperatureWeights(docs: DataFrame, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val n = col("n_docs").cast("double")
    val powed = if (alpha == 0.5) sqrt(n) else pow(n, alpha)
    def snap = floor(powed * 1e6).cast("long")
    val snapped = counts.withColumn("_s", snap)
    // the one-row totals are SIBLING derivations of `counts` (not of the
    // join's left side) — the self-join shape the analyzer resolves
    val total = counts.agg(sum(col("n_docs")).as("_N"))
    val ssum = counts.select(snap.as("_sx")).agg(sum(col("_sx")).as("_st"))
    snapped.crossJoin(broadcast(total)).crossJoin(broadcast(ssum))
      .select(col(groupCol), col("n_docs"),
        round(n / col("_N"), 6).as("p"),
        round(col("_s").cast("double") / col("_st"), 6).as("q"),
        round((col("_s").cast("double") / col("_st")) / (n / col("_N")), 6)
          .as("boost"))
  }

  /** Deterministic low-discrepancy interleave of a multi-source corpus —
    * the training-time CONSUMPTION ORDER for a mixture: source g's j-th
    * document is keyed by j/c_g (its fractional progress through the
    * source) and the global schedule is the ascending sort of those keys
    * — stride scheduling (Waldspurger & Weihl 1995), the deterministic
    * counterpart of sampling-with-probabilities interleaving: every
    * source's documents spread evenly across the whole schedule (a
    * source with 1% of the data appears ~once per 100 steps, never
    * bunched), the property that makes per-step mixture ratios stable
    * for resumable training.
    *
    * Determinism: within-source order is (idCol) ascending; the progress
    * key is ONE correctly-rounded double division j/c_g; ties (e.g. every
    * source's final j/c_g = 1.0) break by (group, j). Engine-exact.
    *
    * Scale shape: the within-source index runs through
    * [[graft.ops.Ranking.withGroupRanks]] and the global step through
    * [[graft.ops.Ranking.withGlobalRanks]] — both decomposed (range
    * partition + offset summaries), so neither a dominant source nor the
    * global sort funnels one task; counts join back as an O(sources)
    * broadcast.
    */
  def interleaveSchedule(docs: DataFrame, groupCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol), col(groupCol))
    val counts = broadcast(
      base.groupBy(col(groupCol)).agg(count(lit(1)).as("_n")))
    val idx = graft.ops.Ranking.withGroupRanks(base, groupCol,
      Seq((idCol, true)), "_i")
    val keyed = idx.join(counts, groupCol)
      .withColumn("_p", col("_i").cast("double") / col("_n"))
    // the global step ranks a (p, group, i) PROJECTION — id/_n riding
    // the rank input would break the range-exchange reuse (the Ranking
    // no-rider contract); ids join back on the unique (group, _i) pair
    graft.ops.Ranking.withGlobalRanks(
        keyed.select(col("_p"), col(groupCol), col("_i")),
        Seq(("_p", true), (groupCol, true), ("_i", true)), "step", "_d")
      .join(idx.select(col(groupCol), col("_i"), col(idCol)),
        Seq(groupCol, "_i"))
      .select(col("step"), col(groupCol), col(idCol))
  }

  /** UniMax token-budget allocation (Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total training-token budget across sources
    * as UNIFORMLY as possible subject to a per-source epoch cap —
    * capacity c_g = epochCap · n_g tokens; waterfilling gives every
    * source min(c_g, W) where the waterline W exhausts the budget.
    * Published alternative to temperature sampling ([[temperatureWeights]])
    * that caps repetition of small sources explicitly.
    *
    * INTEGER-EXACT closed form (engine-portable, no float in the
    * allocation): sources sorted by (capacity, name); a source is capped
    * iff c_k · (G−k+1) ≤ B − prefix_{k−1} — capacity at or below the
    * would-be equal share at its sort position (waterfilling's monotone
    * cap test, division-free). Uncapped sources get the integer base
    * share of the residual budget, with the remainder distributed one
    * token each to the first `rem` uncapped sources in sort order —
    * exact conservation: allocations sum to min(B, Σc). If B ≥ Σc every
    * source is capped and the surplus is intentionally unallocated.
    *
    * Scale shape: ONE map-side-combinable token-count aggregate touches
    * the corpus; every window below it runs on the O(groups) result
    * (the x57/x80 bounded-result convention — the partition-less window
    * holds G rows, never data). `epochs` is one correctly-rounded
    * division of two integers, round(6) → engine-exact.
    */
  def unimaxBudget(docs: DataFrame, groupCol: String, budget: Long,
      epochCap: Int, textCol: String = "text"): DataFrame = {
    require(budget >= 0L && epochCap >= 1,
      s"budget >= 0 and epochCap >= 1, got $budget / $epochCap")
    val counts = docs.groupBy(col(groupCol).as("source"))
      .agg(sum(size(TextAnalysis.tokens(col(textCol)))).cast("long")
        .as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * epochCap)
    val ord = Window.orderBy(col("capacity").asc, col("source").asc)
    val full = ord.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = counts
      .withColumn("_rn", row_number().over(ord).cast("long"))
      .withColumn("_pfx", coalesce(sum(col("capacity"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_g", count(lit(1)).over(full))
      .withColumn("_capped",
        col("capacity") * (col("_g") - col("_rn") + 1L) <=
          lit(budget) - col("_pfx"))
    val t = flagged
      .withColumn("_k", sum(when(col("_capped"), 1L).otherwise(0L)).over(full))
      .withColumn("_pc", coalesce(
        sum(when(col("_capped"), col("capacity"))).over(full), lit(0L)))
      .withColumn("_ur",
        sum(when(col("_capped"), 0L).otherwise(1L)).over(run))
    val m = t("_g") - t("_k")
    val residual = lit(budget) - t("_pc")
    t.withColumn("alloc_tokens", when(col("_capped"), col("capacity"))
        .otherwise(expr(s"($budget - _pc) div (_g - _k)") +
          when(col("_ur") <= pmod(residual, m), 1L).otherwise(0L)))
      .select(col("source"), col("n_tokens"), col("capacity"),
        col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("epochs"))
  }

  /** The end-to-end rebalance: [[temperatureWeights]] composed with the
    * epochs-mixture semantics of [[mixCorpora]], FULLY DISTRIBUTED — the
    * O(groups) weight table joins back as a broadcast instead of a
    * driver collect, so data-derived weights never round-trip through
    * the driver (mixCorpora's Scala-literal weights stay the right tool
    * for hand-written recipes). Every document gets floor(boost) full
    * copies plus a fractional copy kept by the deterministic
    * md5-Bernoulli (salted by group AND id), exactly mixCorpora's
    * convention; `epoch` numbers the copies. Majority groups thin
    * (boost < 1 → a p=boost Bernoulli on epoch 0), minority groups
    * oversample (epoch 0 guaranteed, more by the fraction).
    *
    * Scale: one broadcast hash join on the group key + a ≤⌈boost⌉-row
    * explode + a codegen'd hash filter — map work, no shuffle beyond
    * the weight aggregate's own.
    */
  def temperatureMix(docs: DataFrame, groupCol: String, alpha: Double,
      idCol: String = "doc_id"): DataFrame = {
    val w = temperatureWeights(docs, groupCol, alpha)
      .select(col(groupCol), col("boost"))
    val whole = floor(col("boost")).cast("long")
    val frac = col("boost") - floor(col("boost"))
    val thr = floor(frac * lit(281474976710656.0)).cast("long") // 2^48
    val h = expr(TextAnalysis.hexToIntSql(
      s"md5(concat('tmix:', $groupCol, ':', $idCol))", 12))
    docs.join(broadcast(w), groupCol)
      .withColumn("epoch", explode(sequence(lit(0L), whole)))
      .filter(col("epoch") < whole || h < thr)
      .drop("boost")
  }

  /** The token-BUDGETED training schedule: [[unimaxBudget]]'s waterfilled
    * per-source allocations realized as an actual consumption order —
    * each source contributes `alloc div n_tokens` full epochs plus the
    * doc-granular PREFIX of one more epoch (docs in id order while their
    * cumulative token mass fits `alloc mod n_tokens` — allocation is
    * token-exact, realization is document-granular, so a source never
    * exceeds its budget), and the resulting multiset is stride-interleaved
    * ([[interleaveSchedule]]'s low-discrepancy key, here over the repeated
    * stream): source g's j-th scheduled doc is keyed j/n_sched_g, so
    * epochs of a small source spread across the whole run instead of
    * repeating back-to-back.
    *
    * Scale shape: unimaxBudget's ONE corpus token aggregate; ONE
    * decomposed per-source prefix-sum pass
    * ([[graft.ops.Ranking.withGroupPrefixSums]] — no per-source window
    * funnel); an O(sources) broadcast of allocations and schedule sizes;
    * an ≤(epochCap+1)-row explode; and the decomposed global rank for
    * `step`. Both multiply-consumed intermediates (allocations, the
    * prefix table) are materialized once ([[graft.ops.Checkpoints]]) —
    * no corpus-scale re-execution.
    */
  def budgetedSchedule(docs: DataFrame, groupCol: String, budget: Long,
      epochCap: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val alloc = graft.ops.Checkpoints.materialize(
      unimaxBudget(docs, groupCol, budget, epochCap, textCol)
        .select(col("source").as(groupCol), col("n_tokens"),
          col("alloc_tokens")))
    val perDoc = docs.select(col(groupCol), col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("_tok"))
    val pre = graft.ops.Checkpoints.materialize(
      graft.ops.Ranking.withGroupPrefixSums(perDoc, groupCol,
        Seq((idCol, true)), "_tok", "_i", "_ctok"))
    val joined = pre.join(broadcast(alloc), groupCol)
      .withColumn("_full", expr("alloc_tokens div n_tokens"))
      .withColumn("_part", col("alloc_tokens") % col("n_tokens"))
    // per-source schedule sizes: full epochs × docs + partial-prefix docs
    val counts = broadcast(joined.groupBy(col(groupCol))
      .agg(max(col("_i")).as("_nd"),
        sum(when(col("_ctok") <= col("_part"), 1L).otherwise(0L)).as("_np"),
        max(col("_full")).as("_f"))
      .withColumn("_ns", col("_f") * col("_nd") + col("_np"))
      .select(col(groupCol), col("_nd"), col("_ns")))
    val sched = joined
      .withColumn("epoch", explode(sequence(lit(0L), col("_full"))))
      .filter(col("epoch") < col("_full") || col("_ctok") <= col("_part"))
      .join(counts, groupCol)
      .withColumn("_j", col("epoch") * col("_nd") + col("_i"))
      .withColumn("_p", col("_j").cast("double") / col("_ns"))
    // rank a (p, group, j) PROJECTION (the Ranking no-rider contract);
    // id/epoch join back on the unique (group, _j) schedule slot
    graft.ops.Ranking.withGlobalRanks(
        sched.select(col("_p"), col(groupCol), col("_j")),
        Seq(("_p", true), (groupCol, true), ("_j", true)), "step", "_d")
      .join(sched.select(col(groupCol), col("_j"), col(idCol), col("epoch")),
        Seq(groupCol, "_j"))
      .select(col("step"), col(groupCol), col(idCol), col("epoch"))
  }

  /** The DSIR follow-through (Xie et al. 2023): [[TextAnalysis.dsirTopK]]
    * picks a FIXED k, but the published recipe selects to a TOKEN BUDGET
    * — take background documents in descending importance-weight order
    * while their cumulative token mass fits `budget` (doc-granular, so
    * the selection never exceeds the budget), then report the MIXTURE
    * the selection induces: per source, the selected doc/token counts,
    * the token share of the selected set, and the mean importance
    * log-weight. The report is what a mixture designer reads to see
    * WHICH sources the target domain's importance weights actually
    * favor — the bridge from per-doc DSIR weights to a per-source
    * training mixture.
    *
    * Determinism: weights are [[TextAnalysis.dsirWeights]]' pinned
    * round-6 values; the selection order (log_weight DESC, id ASC) is
    * total; `mean_log_weight` divides an exact DECIMAL(18,6) sum once
    * in DOUBLE (round 6); `token_share` divides exact BIGINT sums once
    * in DOUBLE (round 6).
    *
    * Scale: dsirWeights' two linear passes + O(buckets) broadcast; the
    * global weight-ordered cumulative token sum is the DECOMPOSED
    * prefix sum ([[Ranking.withGroupPrefixSums]] under a constant
    * group: range-partition on the weight order, per-partition local
    * sums, O(partitions) offsets — never a single-task global window on
    * data); the source join is a hash equi-join on the id; the final
    * share window runs over the ≤|sources|-row aggregate only.
    */
  def dsirBudgetedMixture(docs: DataFrame, targetPred: Column, budget: Long,
      buckets: Int = 256, groupCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1L, s"need budget >= 1, got $budget")
    val w = TextAnalysis.dsirWeights(docs, targetPred, buckets, textCol,
      idCol)
    // constant group = GLOBAL decomposed prefix sum over the weight
    // order; the projection carries only consumed columns (the Ranking
    // no-rider contract) — source joins back on the unique id
    val picked = graft.ops.Ranking.withGroupPrefixSums(
        w.select(lit(1).as("_g"), col("n_tokens"), col("log_weight"),
          col(idCol)),
        "_g", Seq(("log_weight", false), (idCol, true)), "n_tokens",
        "_i", "_ctok")
      .filter(col("_ctok") <= budget)
    val perSource = picked
      .join(docs.select(col(idCol), col(groupCol)), idCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(col("log_weight").cast("decimal(18,6)")).as("_slw"))
    // share denominator over the BOUNDED per-source summary (≤|sources|
    // rows) — the accepted global-window-on-a-summary shape
    perSource
      .withColumn("_tt", sum(col("n_tokens")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("_tt").cast("double"), 6)
          .as("token_share"),
        round(col("_slw").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_log_weight"))
  }
}
