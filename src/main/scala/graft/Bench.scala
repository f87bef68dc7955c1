package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Queries run in sorted name order after an untimed warmup action, so the
  * numbers reflect steady-state plan execution rather than JVM/codegen
  * warmup landing on whichever query happens to run first.
  */
object Bench {

  /** Queries that are CHAINS of eager materialization barriers (LSH
    * checkpoint + jaccard prune + cluster rounds / pipeline stages).
    * Their serial critical path IS the suite wall, so they run in a
    * high-weight FAIR pool: each barrier's jobs get task slots almost
    * immediately instead of a 1/129 fair share, and the cheap mass
    * fills whatever the chains leave idle. Measured at sf0.1/local[32]:
    * x60 contended 25.7 s → near its 10 s quiescent chain; suite wall
    * 31 → ~20 s.
    */
  private val chainQueries = Set(
    "x03_minhash_lsh", "x30_neardup_clusters", "x35_clean_corpus",
    "x40_corpus_merge", "x54_curation_shard_map", "x60_curation_semantic",
    "x61_corpus_append", "x63_keeper_longest", "x64_banding_precision",
    "x69_split_leakage", "x70_split_by_cluster", "x76_curation_capped",
    "x81_semantic_decontam", "x84_cluster_balanced",
    "x85_minhash_calibration",
    // BPE argmax loops (nMerges sequential collect iterations) and the
    // budgeted schedule's two materialization barriers
    "x92_bpe_merges", "x98_bpe_tokenize", "x102_budget_schedule",
    // pipeline-variant chains (curateStages materialization barriers)
    "x105_curation_lines", "x106_curation_funnel", "x107_curation_ledger",
    "x109_crossmodal_clusters", // materialized LSH pairs + propagation rounds
    "x112_curation_transitions", // TWO pipeline backbones (old + new snapshot)
    // funnel stage chains (k materialized per-stage states each)
    "x114_event_funnel", "x123_funnel_within", "x127_cohort_funnel",
    // x182's materialized fuzzy pair list + 3 propagation rounds
    "x182_fuzzy_match", "x198_fuzzy_clusters",
    // fixed-point k-means / power-iteration chains (Lloyd or matvec
    // rounds with bounded collects between jobs)
    "x119_pca_power", "x122_pca_projection", "x172_pq_codes",
    "x173_pq_recall", "x174_ivfpq_topk", "x195_silhouette",
    // iterative histogram-refinement selections (3-4 collect barriers)
    "x192_exact_median", "x197_weighted_median",
    // HITS: 3 materialized normalization rounds (pageRank shape)
    "x210_hits",
    // PageRank: 5 materialized iteration barriers over the edge list
    "x141_pagerank",
    // round-20 (verdict Next #6): the planted-recall audits and the
    // model-gated funnels are the longest barrier chains on the board
    // (pipeline backbone + semantic stage + per-tier rollups; trainer +
    // calibration + full funnel) — the r19 driver bench clocked the
    // recall family finishing at 84% of the suite wall. Same treatment
    // as the other chains: their next barrier never queues behind the
    // wide cheap mass.
    "x243_planted_neardup_recall", "x251_semantic_recall_curve",
    "x256_semantic_lsh_recall_tuned", "x257_semantic_recall_banded_scale",
    "x258_semantic_recall_auto", "x247_model_gated_funnel",
    "x253_calibrated_gate_funnel", "x120_edit_neardup")

  /** FAIR allocation file: `chains` outweighs `default` 8:1 with a
    * 16-slot minShare, so a chain's next job never waits behind the
    * wide cheap mass; written to a temp file because the allocation
    * API is file-path-only. */
  private def writeFairPools(): String = {
    val xml =
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="chains">
        |    <schedulingMode>FAIR</schedulingMode>
        |    <weight>8</weight>
        |    <minShare>16</minShare>
        |  </pool>
        |  <pool name="default">
        |    <schedulingMode>FAIR</schedulingMode>
        |    <weight>1</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |</allocations>""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft_fair", ".xml")
    java.nio.file.Files.writeString(p, xml)
    p.toString
  }

  /** Queries RETIRED from the bench suite (still in SparkEntry.queries /
    * Verify / the DuckDB oracle — correctness coverage is unchanged;
    * they just don't run in the timed suite). The names are emitted in
    * the artifact's `excluded` list so tools/bench_regress.py treats
    * their absence as RETIRED, not MISSING (round-17 verdict Next #8).
    *  - x254 is the documented MIS-TUNED banding negative control (4×8
    *    at ~200k vectors ≈ 804 s at sf10 vs the rule shape's 232 s,
    *    BENCH_sf10.json). Its evidentiary value lives in the sf10 probe
    *    artifact and the sf0.01 oracle curve; re-pricing the mis-tuned
    *    shape every sf0.1 bench run cost ~16 s/run for no new signal.
    */
  private val benchExcluded = Set("x254_semantic_lsh_recall")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // FAIR job scheduling: the suite submits ~129 independent queries at
      // once, several of which (x54/x60/x61 pipelines) are chains of eager
      // materialization jobs. Under FIFO a long chain's next job queues
      // behind whole other queries and the chain's wall stretches; FAIR
      // round-robins task slots across concurrent jobs, which is also the
      // realistic multi-tenant cluster setting this bench imitates.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", writeFairPools())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: exercises codegen, shuffle, parquet reader paths —
    // incl. the md5/explode and vector-arithmetic kernels the dedup and
    // similarity queries lean on. (Deliberately NO table caching:
    // measured, it's a wash at sf0.1 and it hides scan pruning — and
    // nothing caches at 100 TB.)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    Tables.documents(spark, sfDir)
      .selectExpr("md5(text) AS h", "split(text, ' ') AS t")
      .selectExpr("count(distinct h)", "sum(size(t))").collect()
    Tables.embeddings(spark, sfDir)
      .selectExpr("sum(aggregate(cast(embedding as array<double>), 0.0d, (a, x) -> a + x * x))")
      .collect()

    // Queries are independent; submit them concurrently (like a real
    // multi-tenant cluster) so local[4] stays busy instead of idling
    // through 58 tiny sequential job barriers. `value` = wall-clock of
    // the whole suite; per-query numbers are individual (overlapping)
    // durations.
    // SPARK_GRAFT_CONC bounds how many queries run concurrently (default
    // cpus*2, the historical behavior). NOTE measured at sf0.1/local[32]:
    // wall variance across identical runs is ±80% on this host (45-86 s
    // for the same binary), far above any conc setting's effect — treat
    // single contended walls as noisy; `quiescent_total` is the stable
    // round-over-round number (PLANS.md round-9 bench note).
    val conc = sys.env.getOrElse("SPARK_GRAFT_CONC", (cpus.toInt * 2).toString).toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // dev bisection aid: SPARK_GRAFT_SKIP=x44_semantic_neardup,x43_...
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty[String]) ++
      benchExcluded
    val t0All = System.nanoTime()
    // submit LONGEST chains first (LPT scheduling). Round-20 (verdict
    // Next #6): reverse-ALPHABETICAL submission still started the
    // heaviest chains (x1xx/x2xx names — curation pipelines, the
    // banded-recall family) behind the whole x9x..x6x mass, and the
    // driver's r19 bench showed the recall chains finishing at 84% of
    // the suite wall. The head list below is the committed
    // BENCH_LOCAL.json quiescent order (longest first, ties broken by
    // family so the planted-fixture queries start together and share
    // the one fixture build); everything else follows reverse-sorted
    // as before. Per-query timing methodology is unchanged — only the
    // submission order moved.
    val lptHead = Seq(
      "x112_curation_transitions", "x61_corpus_append",
      "x106_curation_funnel", "x243_planted_neardup_recall",
      "x251_semantic_recall_curve", "x256_semantic_lsh_recall_tuned",
      "x257_semantic_recall_banded_scale", "x258_semantic_recall_auto",
      "x247_model_gated_funnel", "x60_curation_semantic",
      "x105_curation_lines", "x54_curation_shard_map",
      "x198_fuzzy_clusters", "x107_curation_ledger", "x119_pca_power",
      "x120_edit_neardup", "x253_calibrated_gate_funnel",
      "x40_corpus_merge", "x182_fuzzy_match", "x118_embedding_covariance")
    val tail = SparkEntry.queries.toSeq.sortBy(_._1).reverse
      .filterNot { case (n, _) => lptHead.contains(n) }
    val futures = (lptHead.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
        ++ tail)
      .filterNot { case (n, _) => skip(n) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        // per-thread FAIR pool routing (local properties are
        // thread-local; set before the builder runs — eager builders
        // launch jobs inside fn() itself)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          if (chainQueries(name)) "chains" else "default")
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        // a failed query reports -1.0, not its exception-unwinding time —
        // regressions must be visible in the JSON, not averaged away
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    val total = (System.nanoTime() - t0All) / 1e9
    pool.shutdown()
    // cache-pressure diagnostic at the SUITE PEAK (before the quiescent
    // pass clears transients): `size` here is the distinct-stage count
    // the whole concurrent suite accumulated in one session — the
    // number StageCache.MaxEntries (LRU capacity) must comfortably
    // exceed for eviction to stay a long-lived-session-only path
    System.err.println(s"[bench] StageCache suite peak: " +
      s"size=${graft.ops.StageCache.size}" +
      s" fixtures=${graft.ops.StageCache.fixtureCount}" +
      s" hits=${graft.ops.StageCache.hits}" +
      s" misses=${graft.ops.StageCache.misses}" +
      s" capacity=${graft.ops.StageCache.MaxEntries}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")

    // QUIESCENT pass (round-6 verdict #7): the concurrent numbers above are
    // overlapping contended walls — right for suite throughput, misleading
    // for round-over-round per-query comparison (a query's number moves
    // with whatever happened to run beside it). Re-run each query alone,
    // sequentially, and emit BOTH views in one artifact: `value`/`wall`
    // stay the contended suite wall (the driver contract), `quiescent` /
    // `quiescent_total` are the isolated per-query truths. Skippable with
    // SPARK_GRAFT_QUIESCENT=0 for quick dev loops.
    val quiescent: Seq[(String, Double)] =
      if (sys.env.get("SPARK_GRAFT_QUIESCENT").contains("0")) Nil
      else SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => skip(n) }
        .map { case (name, fn) =>
          // COLD stage cache per query: the contended suite above runs
          // with the session StageCache on (shared-snapshot semantics —
          // the curation reports legitimately share one backbone run);
          // the quiescent pass is the per-query cold-cost comparator, so
          // a warm cache here would make pipeline queries report cached
          // lookup time as execution time and break round-over-round
          // comparison. FIXTURE entries (planted experiment scaffolding,
          // StageCache.memoFixture + inherited stages) survive the reset:
          // the recall-audit family's per-query number measures its
          // semantic generator, not a 4× replay of the shared planted
          // corpus (round-17 verdict Next #2). The numbers stay
          // deterministic round-over-round because the quiescent order
          // is fixed (sorted names — the first family query pays the
          // fixture, the rest inherit it).
          graft.ops.StageCache.clearTransient()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name quiescent FAILED: ${e.getMessage}")
              false
            }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
    val quiescentJson =
      if (quiescent.isEmpty) ""
      else {
        val qq = quiescent.map { case (k, v) => s"\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val qtot = quiescent.map(_._2).filter(_ >= 0).sum
        // TWO copies of the quiescent map (round-17 verdict Next #1):
        // `quiescent_insuite` is the reading as measured HERE — in the
        // post-suite JVM, with whatever session state the 300+ concurrent
        // queries accumulated — and is NEVER rewritten afterwards.
        // `quiescent` starts identical but is the SOLO-CONFIRMED view:
        // tools/reprobe_check.py may overwrite a flagged entry with its
        // quiet solo re-probe (host-contention adjudication). Keeping
        // both makes the insuite/solo ratio observable round over round —
        // a query that is persistently slow ONLY in-suite is a
        // session-state leak (e.g. unreclaimed checkpoint blocks), and
        // reprobe_check gates on that ratio recurring.
        s""","quiescent_total":$qtot,"quiescent":$qq,"quiescent_insuite":$qq"""
      }
    // "sf" is NUMERIC per the driver contract ({"…","sf":0.1}); the dir
    // is carried separately for humans
    val sfNum = "sf([0-9.]*[0-9])".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("-1")
    // self-describing keys (round-14 verdict #7): `queries` is easy to
    // misread as per-query cost — it is the CONTENDED completion offset
    // of each query inside the concurrent suite; `quiescent` holds the
    // isolated per-query truths. Say so in the artifact itself.
    val semantics = """"queries_semantics":"queries = per-query wall inside the CONCURRENT suite (contended completion offsets; right for suite throughput, wrong for per-query comparison); quiescent = each query re-run ALONE (the per-query cost comparator)""""
    val excludedJson = benchExcluded.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","wall":$total,$semantics,"excluded":$excludedJson,"queries":$qs$quiescentJson,"sf":$sfNum,"sf_dir":"$sfDir"}"""
    // stdout gets decorated by sbt and interleaved with log output — the
    // round-1 driver recorded parsed:null — so ALSO write the JSON to a
    // file the driver (or a human) can read without scraping, and emit it
    // on BOTH streams.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: ${e.getMessage}") }
    // Compact human summary (slowest-8 + failure count) goes to STDERR
    // only: every PERF_rNN through round 19 recorded parsed:null because
    // the last stdout JSON line was this truncated summary, not the full
    // per-query map (round-19 verdict What's-wrong #1). The contract line
    // the driver parses — the FULL one-line JSON with the complete
    // `queries` and `quiescent` maps — is now the LAST stdout line, and
    // build.sbt's `run / outputStrategy := StdoutOutput` passes it through
    // raw (no `[info] ` logger prefix in front of the `{`).
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v) => s"\"" + k + "\":" + (math.round(v * 1000) / 1000.0) }
      .mkString("{", ",", "}")
    val nFail = results.count(_._2 < 0)
    val qtot = if (quiescent.isEmpty) -1.0
      else math.round(quiescent.map(_._2).filter(_ >= 0).sum * 1000) / 1000.0
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","wall":$total,"quiescent_total":$qtot,"n_queries":${results.size},"n_failed":$nFail,"queries":$slowest,"queries_truncated":true,"queries_full":"$outPath","sf":$sfNum,"sf_dir":"$sfDir"}"""
    System.err.println(compact)
    System.err.flush()
    println(line)
    System.out.flush()
    spark.stop()
  }
}
