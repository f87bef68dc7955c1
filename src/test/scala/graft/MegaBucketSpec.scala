package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** The mega-bucket guard (Dedup.DefaultMaxBucket): a planted near-dup
  * mega-cluster — the web-scale reality of template pages that survive
  * exact dedup — must cost O(m) candidate pairs, not O(m²), while the
  * cluster output (what the pipeline actually deletes by) is unchanged.
  */
class MegaBucketSpec extends SparkSuite {

  /** m docs with identical text: every band key collides, the worst
    * possible bucket — uncapped pair fan-out would be m(m−1)/2 per band.
    */
  private def megaCorpus(m: Int): DataFrame =
    spark.range(0, m, 1, 8).select(col("id").as("doc_id"),
      lit("the quick brown fox jumps over the lazy dog again").as("text"))

  test("planted 10^4-doc mega-cluster: pair count is O(m), not O(m^2)") {
    val m = 10000
    val pairs = Dedup.lshCandidatePairs(megaCorpus(m), bands = 8,
      rowsPerBand = 2, maxBucket = 1024)
    // identical docs → one bucket of 10^4 per band → star edges only:
    // exactly m−1 distinct pairs, every one anchored at the min id
    val rows = pairs.collect()
    assert(rows.length == m - 1,
      s"expected ${m - 1} star edges, got ${rows.length}")
    assert(rows.forall(_.getLong(0) == 0L),
      "every star edge must anchor at the bucket's min-id hub")
    assert(rows.map(_.getLong(1)).toSet == (1L until m.toLong).toSet,
      "every non-hub member must keep exactly its hub edge")
  }

  test("mega-cluster star edges survive Jaccard verification and collapse " +
      "to ONE cluster with the min-id keeper (deletion outcome unchanged)") {
    val m = 2000
    val verified = Dedup.verifiedCandidatePairs(megaCorpus(m), bands = 8,
      rowsPerBand = 2, minJaccard = 1.0, maxBucket = 64)
    assert(verified.count() == m - 1,
      "identical docs: every hub edge has Jaccard 1 and must survive")
    val clusters = Dedup.clusterPairs(verified, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters.size == m && clusters.values.forall(_ == 0L),
      "the mega-cluster must collapse to one cluster keyed by the min id")
  }

  test("capped == uncapped cluster output on a near-identical planted " +
      "cluster (star edges preserve min-label connectivity)") {
    // near-identical, not byte-identical: a 12-token shared stem with a
    // per-doc suffix — survives exact dedup, Jaccard vs any member ≈ 0.7
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val docs = spark.range(0, 300, 1, 4).select(col("id").as("doc_id"),
      concat(lit(base + " tail"), (col("id") % 7).cast("string")).as("text"))
    def clusterSet(maxBucket: Int) =
      Dedup.clusterPairs(
        Dedup.verifiedCandidatePairs(docs, bands = 8, rowsPerBand = 2,
          minJaccard = 0.5, maxBucket = maxBucket), rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = clusterSet(1000000)
    val capped = clusterSet(16)
    assert(uncapped.nonEmpty)
    assert(capped == uncapped,
      "capped star-edge clustering must produce the uncapped clusters")
  }

  test("docs outside the mega-bucket keep their exact dense pairs") {
    // 1500 identical docs (one mega bucket) + a distinct 3-doc near-dup
    // group: the small group's dense pairs must be byte-identical to an
    // uncapped run — the cap only touches the overflowing bucket
    val smallTexts = Seq(
      5000L -> "one two three four five six seven eight nine ten",
      5001L -> "one two three four five six seven eight nine eleven",
      5002L -> "one two three four five six seven eight nine ten")
    val small = frame("doc_id" -> smallTexts.map(_._1),
      "text" -> smallTexts.map(_._2))
    val corpus = megaCorpus(1500).unionByName(small)
    def smallPairs(maxBucket: Int) =
      Dedup.lshCandidatePairs(corpus, bands = 8, rowsPerBand = 2,
          maxBucket = maxBucket)
        .filter(col("id_a") >= 5000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(smallPairs(1024) == smallPairs(1000000),
      "dense pairs outside the overflowing bucket must be unchanged")
    assert(smallPairs(1024).nonEmpty)
  }

  test("bandBucketHistogram reports the mega bucket and its star-edge mass") {
    val m = 3000L
    val hist = Dedup.bandBucketHistogram(megaCorpus(3000), bands = 8,
        rowsPerBand = 2, maxBucket = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // identical docs: every one of the 8 bands is a single bucket of m
    assert(hist.toSeq == Seq((m, 8L, m * (m - 1) / 2 * 8, (m - 1) * 8)),
      s"unexpected histogram: ${hist.toSeq}")
  }

  test("hashNearDupPairs star path: an over-cap signature bucket emits " +
      "hub edges only, hamming-checked against the hub") {
    val m = 3000
    // identical signatures → every band bucket has m members
    val sig = spark.range(0, m, 1, 8).select(col("id").as("doc_id"),
      lit(0x5a5a5a5aL).as("h"))
    val pairs = Dedup.hashNearDupPairs(sig, "h", nBits = 64, nBands = 16,
      maxHamming = 3, maxBucket = 100).collect()
    assert(pairs.length == m - 1)
    assert(pairs.forall(r => r.getLong(0) == 0L && r.getLong(2) == 0L),
      "star edges must anchor at the hub with hamming 0")
  }
}
