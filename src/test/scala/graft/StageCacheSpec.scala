package graft

import org.apache.spark.sql.functions._

/** The stage-cache contract (ops/StageCache.scala):
  *
  *  1. REUSE — two curation views over the same parquet snapshot (built
  *     from INDEPENDENT reads, not a shared DataFrame object) share one
  *     backbone computation: the second view only HITS, never re-misses.
  *  2. CORRECTNESS — cache-warm results are bitwise identical to a
  *     cleared-cache recompute (a hit may change cost, never rows).
  *  3. ISOLATION — different thresholds / different planted corpora get
  *     different entries (the key covers plans AND params).
  */
class StageCacheSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("curation views over one snapshot share the memoized backbone: " +
      "second view adds zero cache misses and matches bitwise") {
    ops.StageCache.clear()
    def corpus() = Tables.documents(spark, dir).filter(col("doc_id") % 97 =!= 0)
    def evalSet() = Tables.documents(spark, dir).filter(col("doc_id") % 97 === 0)

    val r1 = ops.Pipeline.curate(corpus(), evalSet())
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val missesAfterFirst = ops.StageCache.misses
    val hitsAfterFirst = ops.StageCache.hits
    assert(ops.StageCache.size >= 2, "backbone + contamination entries expected")

    // fresh parquet reads → fresh analyzed plans; canonical sameResult
    // must still match the cached entries (this is the property that lets
    // independent report queries in one session share the run)
    val r2 = ops.Pipeline.curate(corpus(), evalSet())
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(r1 == r2, "cache hit changed the result")
    assert(ops.StageCache.misses == missesAfterFirst,
      "second view must not re-compute any stage")
    assert(ops.StageCache.hits >= hitsAfterFirst + 2,
      "backbone and contamination must both hit")

    // the ledger is a third view of the same run: its survivors
    // complement must equal the curate survivor set, all through cache
    // hits (zero new misses)
    val ledgerIds = ops.Pipeline.curationLedger(corpus(), evalSet())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ops.StageCache.misses == missesAfterFirst,
      "ledger must derive from the cached backbone")
    val inputIds = corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    assert((inputIds -- ledgerIds) == r1.toSet,
      "ledger ∪ survivors must partition the input through the cache")
  }

  test("concurrent queries racing for the same backbone serialize on ONE " +
      "computation (the contended-bench path)") {
    ops.StageCache.clear()
    def corpus() = Tables.documents(spark, dir).filter(col("doc_id") % 97 =!= 0)
    def evalSet() = Tables.documents(spark, dir).filter(col("doc_id") % 97 === 0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // four views of the run, launched simultaneously — the insert-then-
    // force-lazily design must yield exactly ONE backbone miss; the
    // losers block on the winner's lazy holder and reuse its frames
    val results = Await.result(Future.sequence(Seq(
      Future(ops.Pipeline.curate(corpus(), evalSet())
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq),
      Future(ops.Pipeline.curate(corpus(), evalSet())
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq),
      Future(ops.Pipeline.curationFunnel(corpus(), evalSet())
        .agg(org.apache.spark.sql.functions.sum("n_clean")).collect()
        .map(_.getLong(0)).toSeq),
      Future(ops.Pipeline.curationLedger(corpus(), evalSet())
        .count() :: Nil))), Duration.Inf)
    assert(results(0) == results(1), "racing curate calls diverged")
    val backboneMisses = ops.StageCache.misses
    // exactly one backbone + one contamination entry exist; re-running
    // sequentially adds no misses (everything already cached)
    ops.Pipeline.curate(corpus(), evalSet()).count()
    assert(ops.StageCache.misses == backboneMisses,
      "post-race rerun must be fully cached")
    assert(ops.StageCache.size == 2,
      s"expected exactly backbone+contam entries, got ${ops.StageCache.size}")
  }

  test("cache-warm results are bitwise identical to a cleared-cache " +
      "recompute") {
    ops.StageCache.clear()
    val docs = frame(
      "doc_id" -> Seq[Any](1L, 2L, 3L, 4L, 5L),
      "source" -> Seq("a", "a", "b", "b", "b"),
      "text" -> Seq(
        "the quick brown fox jumps over the lazy dog again today",
        "the quick brown fox jumps over the lazy dog again today",
        "completely different words in this one document here now ok",
        "short",
        "another set of perfectly ordinary tokens for the corpus here"))
    val evalSet = frame("doc_id" -> Seq[Any](99L),
      "text" -> Seq("nothing shared with anything at all"))
    val warm1 = rows(ops.Pipeline.curationLedger(docs, evalSet)
      .orderBy("doc_id", "reason"))
    val warm2 = rows(ops.Pipeline.curationLedger(docs, evalSet)
      .orderBy("doc_id", "reason")) // served from cache
    ops.StageCache.clear()
    val cold = rows(ops.Pipeline.curationLedger(docs, evalSet)
      .orderBy("doc_id", "reason")) // full recompute
    assert(warm1 == warm2, "warm replay diverged")
    assert(warm1 == cold, "cache-warm ledger != cleared-cache ledger")
  }

  test("appendCurated reuses per-corpus-version state across batches: " +
      "second batch hits the digest-set and band-state entries") {
    ops.StageCache.clear()
    val corpus = frame(
      "doc_id" -> Seq[Any](1L, 2L),
      "source" -> Seq("a", "b"),
      "text" -> Seq(
        "existing corpus document with plenty of ordinary tokens here one",
        "second existing corpus document with plenty of ordinary tokens"))
    val evalSet = frame("doc_id" -> Seq[Any](9L), "text" -> Seq("zz yy xx"))
    val batch1 = frame(
      "doc_id" -> Seq[Any](10L),
      "source" -> Seq("c"),
      "text" -> Seq("a brand new incoming document with its own fresh tokens"))
    val batch2 = frame(
      "doc_id" -> Seq[Any](11L),
      "source" -> Seq("c"),
      "text" -> Seq("another unrelated incoming document carrying novel words"))
    val r1 = collectCol[Long](
      ops.Pipeline.appendCurated(corpus, batch1, evalSet), "doc_id")
    val missesAfterFirst = ops.StageCache.misses
    val r2 = collectCol[Long](
      ops.Pipeline.appendCurated(corpus, batch2, evalSet), "doc_id")
    // batch2 is new data (fresh plans) but the CORPUS side must be served
    // from the per-version entries computed for batch1
    assert(ops.StageCache.misses == missesAfterFirst,
      "second batch must not recompute corpus digest/band state")
    assert(r1 == Seq(10L) && r2 == Seq(11L),
      s"both novel batches must be accepted, got $r1 / $r2")
    // and the cached-corpus-state result must equal a cold recompute
    ops.StageCache.clear()
    val r2cold = collectCol[Long](
      ops.Pipeline.appendCurated(corpus, batch2, evalSet), "doc_id")
    assert(r2 == r2cold, "warm corpus state changed the append result")
  }

  test("different params and different planted corpora never share an " +
      "entry") {
    ops.StageCache.clear()
    val docs = frame(
      "doc_id" -> Seq[Any](1L, 2L, 3L),
      "source" -> Seq("a", "a", "b"),
      "text" -> Seq(
        "one ordinary document with enough plain tokens to pass quality",
        "another ordinary document with enough plain tokens to pass too",
        "a third ordinary document with enough plain tokens to pass fine"))
    val evalSet = frame("doc_id" -> Seq[Any](9L), "text" -> Seq("zz yy xx"))
    ops.Pipeline.curate(docs, evalSet, minQuality = 0.1).count()
    val m1 = ops.StageCache.misses
    // same corpus, different threshold → its own backbone entry
    ops.Pipeline.curate(docs, evalSet, minQuality = 0.2).count()
    assert(ops.StageCache.misses > m1,
      "different minQuality must not hit the 0.1 entry")
    val m2 = ops.StageCache.misses
    // different planted corpus (fresh parallelize → distinct RDD plan)
    val other = frame(
      "doc_id" -> Seq[Any](1L, 2L, 3L),
      "source" -> Seq("a", "a", "b"),
      "text" -> Seq(
        "one ordinary document with enough plain tokens to pass quality",
        "another ordinary document with enough plain tokens to pass too",
        "a DIFFERENT third document with enough plain tokens to pass ok"))
    ops.Pipeline.curate(other, evalSet, minQuality = 0.1).count()
    assert(ops.StageCache.misses > m2,
      "a different corpus must not hit the first corpus's entry")
  }

  // ---- ownership + eviction + fixtures (round-17 verdict Next #2/#7) ----

  /** A minimal memoized stage: materializes a 1-row frame derived from
    * `src` (so the entry OWNS the checkpointed RDD) and returns it. */
  private def owned(tag: String, src: org.apache.spark.sql.DataFrame,
      fixture: Boolean = false): org.apache.spark.sql.DataFrame = {
    val stage = if (fixture)
      ops.StageCache.memoFixture(tag, Seq(src), Seq())(
        ops.Checkpoints.materialize(src))
    else ops.StageCache.memo(tag, Seq(src), Seq())(
      ops.Checkpoints.materialize(src))
    stage
  }

  private def checkpointRddId(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.get

  private def persisted(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.contains(id)

  test("an evicted entry's owned checkpoint blocks are disposed eagerly " +
      "while caller-held and still-cached frames stay valid") {
    ops.StageCache.clear()
    val saved = ops.StageCache.MaxEntries
    ops.StageCache.MaxEntries = 3
    try {
      // caller-materialized frame OUTSIDE any memo block: never owned,
      // must survive every eviction untouched
      val callerHeld = ops.Checkpoints.materialize(
        frame("v" -> Seq[Any](42L)))
      val callerId = checkpointRddId(callerHeld)
      val a = owned("evict_a", frame("v" -> Seq[Any](1L)))
      val aId = checkpointRddId(a)
      assert(persisted(aId), "A's checkpoint blocks should be live")
      owned("evict_b", frame("v" -> Seq[Any](2L)))
      val c = owned("evict_c", frame("v" -> Seq[Any](3L)))
      // 4th insertion evicts A (LRU victim) and must DISPOSE its blocks
      owned("evict_d", frame("v" -> Seq[Any](4L)))
      assert(!persisted(aId),
        "evicted entry A's owned blocks must be unpersisted eagerly")
      assert(persisted(callerId) && callerHeld.collect().head.getLong(0) == 42L,
        "a frame materialized OUTSIDE the cache must never be disposed")
      assert(c.collect().head.getLong(0) == 3L,
        "still-cached entries must stay valid across an eviction")
    } finally {
      ops.StageCache.MaxEntries = saved
      ops.StageCache.clear()
    }
  }

  test("LRU: a hit refreshes an entry so it is not the next eviction " +
      "victim (an in-use backbone can't be disposed under a consumer)") {
    ops.StageCache.clear()
    val saved = ops.StageCache.MaxEntries
    ops.StageCache.MaxEntries = 3
    try {
      val srcA = frame("v" -> Seq[Any](1L))
      val a = owned("lru_a", srcA)
      val aId = checkpointRddId(a)
      val b = owned("lru_b", frame("v" -> Seq[Any](2L)))
      val bId = checkpointRddId(b)
      owned("lru_c", frame("v" -> Seq[Any](3L)))
      // HIT a (same tag + same plan) — must move it to the LRU back
      val aAgain = owned("lru_a", srcA)
      assert(checkpointRddId(aAgain) == aId, "expected a cache hit on A")
      // next insertion must evict B (now the least recently used), not A
      owned("lru_d", frame("v" -> Seq[Any](4L)))
      assert(persisted(aId), "recently-hit A must survive the eviction")
      assert(!persisted(bId), "LRU victim B's blocks must be disposed")
      assert(a.collect().head.getLong(0) == 1L)
    } finally {
      ops.StageCache.MaxEntries = saved
      ops.StageCache.clear()
    }
  }

  test("a derived entry keeps evaluating after the entry it reads from " +
      "is evicted: disposal skips RDDs live entries still reference " +
      "(round-18 verdict Next #3)") {
    ops.StageCache.clear()
    val saved = ops.StageCache.MaxEntries
    ops.StageCache.MaxEntries = 3
    try {
      val srcA = frame("v" -> Seq[Any](21L))
      val a = owned("xe_a", srcA)
      val aId = checkpointRddId(a)
      // the hazard shape: B's value is a LAZY frame over A's
      // checkpointed output — B never materializes its own copy, so
      // disposing A's blocks would leave B unrecoverable (the
      // checkpoint's lineage is truncated)
      val derived = ops.StageCache.memo("xe_derived", Seq(a), Seq())(
        a.select((col("v") * 2).as("v")))
      owned("xe_c", frame("v" -> Seq[Any](1L)))
      // 4th insertion: A is the LRU victim, but B's key plans scan A's
      // RDD, so the disposal must SKIP those blocks
      owned("xe_d", frame("v" -> Seq[Any](2L)))
      val m0 = ops.StageCache.misses
      owned("xe_a", srcA) // A's ENTRY is gone (re-memo misses) ...
      assert(ops.StageCache.misses == m0 + 1,
        "A should have been evicted by the 4th insertion")
      assert(persisted(aId),
        "A's blocks must survive eviction while derived entry B reads them")
      assert(derived.collect().head.getLong(0) == 42L,
        "derived entry must still evaluate after its input entry's eviction")
    } finally {
      ops.StageCache.MaxEntries = saved
      ops.StageCache.clear()
    }
  }

  test("an IN-FLIGHT entry is never the disposal victim: eviction picks " +
      "a completed box (or drops without disposal) while the stage is " +
      "still computing (round-18 ADVICE)") {
    ops.StageCache.clear()
    val saved = ops.StageCache.MaxEntries
    ops.StageCache.MaxEntries = 2
    try {
      val registered = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      // ONE shared source frame: frame() parallelizes a fresh RDD per
      // call, so a fresh frame would be a different key (cache miss)
      val src = frame("v" -> Seq[Any](9L))
      @volatile var slow: org.apache.spark.sql.DataFrame = null
      val t = new Thread(() => {
        slow = ops.StageCache.memo("inflight_slow", Seq(src), Seq()) {
          // materialize registers the checkpoint as owned, THEN the
          // stage stalls — the round-18 ADVICE window: an eviction now
          // would dispose a checkpoint the caller is about to use
          val m = ops.Checkpoints.materialize(frame("v" -> Seq[Any](9L)))
          registered.countDown()
          release.await()
          m
        }
      })
      t.start()
      registered.await()
      // two insertions: the first fills the cache, the second forces an
      // eviction while the slow box is mid-compute — the victim must be
      // the COMPLETED first entry, never the in-flight one
      val e1 = owned("inflight_done1", frame("v" -> Seq[Any](1L)))
      val e1Id = checkpointRddId(e1)
      owned("inflight_done2", frame("v" -> Seq[Any](2L)))
      assert(!persisted(e1Id),
        "the completed LRU entry should have been the eviction victim")
      // third insertion: cache now holds [slow (computing), done2] —
      // victim search finds done2; slow survives again
      owned("inflight_done3", frame("v" -> Seq[Any](3L)))
      release.countDown()
      t.join(60000)
      assert(slow != null && slow.collect().head.getLong(0) == 9L,
        "in-flight stage's materialized frame must survive the evictions")
      val h0 = ops.StageCache.hits
      ops.StageCache.memo("inflight_slow", Seq(src), Seq()) {
        sys.error("must be served from cache"): AnyRef
      }
      assert(ops.StageCache.hits == h0 + 1,
        "the in-flight entry must still be cached after completing")
    } finally {
      ops.StageCache.MaxEntries = saved
      ops.StageCache.clear()
    }
  }

  test("fixture entries and stages DERIVED from fixture frames survive " +
      "clearTransient; plain entries are dropped and disposed") {
    ops.StageCache.clear()
    val fxSrc = frame("v" -> Seq[Any](7L))
    val fx = owned("fixture_src", fxSrc, fixture = true)
    val fxId = checkpointRddId(fx)
    // derived stage: INPUT is the fixture's materialized frame → the
    // entry inherits fixture status mechanically
    val derived = ops.StageCache.memo("fixture_derived",
      Seq(fx), Seq())(ops.Checkpoints.materialize(
      fx.select((col("v") * 2).as("v"))))
    val derivedId = checkpointRddId(derived)
    // a MEASURED stage (inheritFixture = false) must NOT inherit even
    // with a fixture input — it goes cold with every clearTransient so
    // quiescent numbers keep pricing it (the x251-family semantic stage)
    val measured = ops.StageCache.memo("measured_stage",
      Seq(fx), Seq(), inheritFixture = false)(ops.Checkpoints.materialize(
      fx.select((col("v") * 3).as("v"))))
    val measuredId = checkpointRddId(measured)
    val plain = owned("plain_stage", frame("v" -> Seq[Any](5L)))
    val plainId = checkpointRddId(plain)
    assert(ops.StageCache.fixtureCount == 2,
      s"fixture + inherited expected, got ${ops.StageCache.fixtureCount}")
    ops.StageCache.clearTransient()
    assert(ops.StageCache.size == 2,
      "clearTransient must keep exactly the fixture family")
    assert(persisted(fxId) && persisted(derivedId),
      "fixture-family blocks must stay live across clearTransient")
    assert(!persisted(plainId),
      "transient entry's blocks must be disposed by clearTransient")
    assert(!persisted(measuredId),
      "inheritFixture=false entry must go cold with clearTransient")
    assert(fx.collect().head.getLong(0) == 7L &&
      derived.collect().head.getLong(0) == 14L)
    // a re-memo of the fixture must be a pure HIT after clearTransient
    val h0 = ops.StageCache.hits
    owned("fixture_src", fxSrc, fixture = true)
    assert(ops.StageCache.hits == h0 + 1, "fixture must survive as a hit")
    ops.StageCache.clear()
  }
}
