package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the HOF single-split question (round-19
  * verdict Next #8): higher-order functions are CodegenFallback in
  * Spark 4, and interpreted expression evaluation performs NO common-
  * subexpression elimination — so an expression tree that references
  * `split(text, ' ')` k times pays k split calls PER ROW. This tool
  * A/B-times the committed expression shapes against "bind once"
  * variants that evaluate the split exactly once by binding it to a
  * single-element higher-order-function lambda variable
  * (`element_at(transform(array(e), x => body(x)), 1)` — the lambda
  * variable is evaluated once and every reference reads the bound
  * value).
  *
  * Variants are INTERLEAVED (a, b, a, b, ...) within one JVM so host
  * drift cannot masquerade as a delta (OPTIMIZATION_r19.md's
  * measurement-environment rule), and each timed action is a noop-sink
  * write (guide §1.4: computes every column, discards output).
  *
  * Usage: runMain graft.SplitBench [sfDir] [reps]
  */
object SplitBench {

  private def bindOnce(c: Column, f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.localProfile(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm page cache / codegen

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[split] $label%-34s $s%7.2f s")
      s
    }

    // ---- committed shapes ------------------------------------------------
    def tokensC(text: Column) = split(text, " ")
    def shinglesCommitted(text: Column, n: Int): Column = {
      val arr = tokensC(text)
      when(size(arr) >= n,
        transform(sequence(lit(1), size(arr) - (n - 1)),
          i => concat_ws(" ", slice(arr, i, lit(n)))))
        .otherwise(array(concat_ws(" ", arr)))
    }
    def qualityCommitted(text: Column): Column = {
      val toks = tokensC(text)
      val nTok = size(toks).cast("double")
      val ttr = size(array_distinct(toks)).cast("double") / nTok
      val short = size(filter(toks, t => length(t) === 1)).cast("double") / nTok
      ttr * (lit(1.0) - short)
    }

    // ---- bind-once shapes ------------------------------------------------
    def shinglesOnce(text: Column, n: Int): Column =
      bindOnce(tokensC(text), arr =>
        when(size(arr) >= n,
          transform(sequence(lit(1), size(arr) - (n - 1)),
            i => concat_ws(" ", slice(arr, i, lit(n)))))
          .otherwise(array(concat_ws(" ", arr))))
    def qualityOnce(text: Column): Column =
      bindOnce(tokensC(text), toks => {
        val nTok = size(toks).cast("double")
        val ttr = size(array_distinct(toks)).cast("double") / nTok
        val short = size(filter(toks, t => length(t) === 1)).cast("double") / nTok
        ttr * (lit(1.0) - short)
      })

    // bandKeysArray: committed (k copies of the per-shingle hash pass
    // inlined into k array_min(transform(...))) vs staged-in-lambda
    // (one hash pass, one aggregate fold, one band projection)
    import graft.ops.Dedup.{MinhashA, MinhashB, MinhashP}
    val bands = 8; val rpb = 2; val k = bands * rpb
    def bandKeysCommitted(text: Column): Column = {
      val dig = transform(array_distinct(shinglesCommitted(text, 5)), s => md5(s))
      val hm = transform(dig, d =>
        conv(substring(d, 1, 12), 16, 10).cast("long") % MinhashP)
      val mins = (0 until k).map(i =>
        array_min(transform(hm, h => (h * MinhashA(i) + MinhashB(i)) % MinhashP)))
      array((0 until bands).map { b =>
        md5(concat_ws(":", (b * rpb until (b + 1) * rpb).map(mins): _*))
      }: _*)
    }
    def bandKeysOnce(text: Column): Column = {
      val ab = array((0 until k).map(i =>
        struct(lit(MinhashA(i)).as("a"), lit(MinhashB(i)).as("b"))): _*)
      val hm = transform(array_distinct(shinglesOnce(text, 5)), s =>
        conv(substring(md5(s), 1, 12), 16, 10).cast("long") % MinhashP)
      val mins = aggregate(hm, array_repeat(lit(MinhashP), k),
        (acc, h) => zip_with(acc, ab, (m, c) =>
          least(m, (h * c("a") + c("b")) % MinhashP)))
      bindOnce(mins, m =>
        array((0 until bands).map { b =>
          md5(concat_ws(":", (b * rpb until (b + 1) * rpb)
            .map(i => element_at(m, i + 1)): _*))
        }: _*))
    }

    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "shingle3_committed" -> (() => docs.select(col("doc_id"),
        explode(array_distinct(shinglesCommitted(col("text"), 3))).as("tok"))
        .select(col("doc_id"), md5(col("tok")).as("sk"))),
      "shingle3_bindonce" -> (() => docs.select(col("doc_id"),
        explode(array_distinct(shinglesOnce(col("text"), 3))).as("tok"))
        .select(col("doc_id"), md5(col("tok")).as("sk"))),
      "quality_committed" -> (() => docs.filter(qualityCommitted(col("text")) > 0.3)
        .select(col("doc_id"))),
      "quality_bindonce" -> (() => docs.filter(qualityOnce(col("text")) > 0.3)
        .select(col("doc_id"))),
      "bandkeys_committed" -> (() => docs.select(col("doc_id"),
        bandKeysCommitted(col("text")).as("bks"))),
      "bandkeys_bindonce" -> (() => docs.select(col("doc_id"),
        bandKeysOnce(col("text")).as("bks"))))

    // parity check before timing: bind-once variants must be bitwise-equal
    val q1 = docs.select(qualityCommitted(col("text")).as("q")).collect()
    val q2 = docs.select(qualityOnce(col("text")).as("q")).collect()
    require(q1.sameElements(q2), "quality variants diverge")
    val s1 = docs.limit(2000).select(shinglesCommitted(col("text"), 3).as("s")).collect()
    val s2 = docs.limit(2000).select(shinglesOnce(col("text"), 3).as("s")).collect()
    require(s1.sameElements(s2), "shingle variants diverge")
    val b1 = docs.limit(2000).select(bandKeysCommitted(col("text")).as("b")).collect()
    val b2 = docs.limit(2000).select(bandKeysOnce(col("text")).as("b")).collect()
    require(b1.sameElements(b2), "band-key variants diverge")
    println("[split] parity OK (quality full corpus, shingles/bandkeys 2k rows)")

    for (r <- 1 to reps; (label, mk) <- cases)
      time(s"$label r$r")(mk())
    spark.stop()
  }
}
