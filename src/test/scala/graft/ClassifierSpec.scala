package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** The x244 contract: trained hashed-feature weights are a REAL
  * persistable artifact — write them to parquet, read them back, score
  * through the loaded table, and the result is bit-identical to scoring
  * through the in-memory trained frame. Plus shape parity with the x130
  * stand-in scorer (same output columns, same keep rule semantics).
  */
class ClassifierSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("trainHashedWeights -> parquet -> classifierScoreWithWeights " +
      "round-trips bit-identically; weight table is dims-bounded and " +
      "micro-quantized into [-1e6, 1e6]") {
    val docs = Tables.documents(spark, dir)
    val w = TextAnalysis.trainHashedWeights(docs, col("lang") === "en",
      dims = 32)
    val rows = w.collect()
    assert(rows.length <= 32 && rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getLong(1)) <= 1000000L),
      "weights must be micro-quantized centered rates")
    // both vote directions must exist on this corpus or the score sum
    // below proves nothing
    assert(rows.exists(_.getLong(1) > 0) && rows.exists(_.getLong(1) < 0))

    val tmp = java.nio.file.Files.createTempDirectory("graft_w").toString
    try {
      w.write.mode("overwrite").parquet(tmp)
      val loaded = spark.read.parquet(tmp)
      val direct = TextAnalysis.classifierScoreWithWeights(docs, w, dims = 32)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val viaParquet = TextAnalysis
        .classifierScoreWithWeights(docs, loaded, dims = 32)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(direct === viaParquet,
        "scoring via parquet-loaded weights must be bit-identical")
      assert(direct.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("classifierScoreWithWeights has the x130 output shape and its " +
      "keep rule: keep == (score >= 0); unseen buckets score 0 via the " +
      "left join") {
    val docs = Tables.documents(spark, dir)
    val w = TextAnalysis.trainHashedWeights(docs, col("lang") === "en",
      dims = 32)
    val scored = TextAnalysis.classifierScoreWithWeights(docs, w, dims = 32)
    assert(scored.columns.toSeq ===
      Seq("doc_id", "n_tokens", "score", "prob", "keep"))
    val r = scored.collect()
    // keep reads the RAW integer sum's sign (the x130 convention); the
    // score is that sum r6-rounded per token, so a tiny negative sum can
    // round to score == 0.0 while keep is false. Gate the two unambiguous
    // sides and leave the score == 0 boundary unconstrained.
    assert(r.forall(x => x.getDouble(2) <= 0.0 || x.getBoolean(4)),
      "positive score must keep")
    assert(r.forall(x => x.getDouble(2) >= 0.0 || !x.getBoolean(4)),
      "negative score must drop")
    // a doc whose tokens all hash to buckets ABSENT from a truncated
    // weight table scores exactly 0 and keeps (the graceful-degradation
    // contract for train/serve vocabulary shift)
    val someBucketless = TextAnalysis.classifierScoreWithWeights(
      docs, w.filter(col("bucket") < 0), dims = 32).collect()
    assert(someBucketless.forall(x =>
      x.getDouble(2) === 0.0 && x.getBoolean(4)))
  }
}
