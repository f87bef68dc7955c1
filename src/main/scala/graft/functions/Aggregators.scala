package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators — the Spark form of the reference's "bring your own
  * ufunc over a Grouper" extension point (SURVEY.md §2.6 G2/G8). Standard
  * `Aggregator[IN, BUF, OUT]`: partial aggregation before the shuffle,
  * merge after — distributes like any built-in aggregate.
  */
object Aggregators {

  /** Exact `nonemin` (dataframe.py:980-1004): min ignoring NaN and null,
    * null when no valid value exists — semantics Spark's `min` alone can't
    * express over NaN-bearing doubles (NaN sorts above every double).
    */
  class NoneMin extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
    def zero: (Double, Boolean) = (Double.MaxValue, false)
    def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
      if (a == null || a.isNaN) b else (math.min(b._1, a), true)
    def merge(x: (Double, Boolean), y: (Double, Boolean)): (Double, Boolean) =
      (math.min(x._1, y._1), x._2 || y._2)
    def finish(b: (Double, Boolean)): java.lang.Double = if (b._2) b._1 else null
    def bufferEncoder: Encoder[(Double, Boolean)] = Encoders.product[(Double, Boolean)]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  class NoneMax extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
    def zero: (Double, Boolean) = (Double.MinValue, false)
    def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
      if (a == null || a.isNaN) b else (math.max(b._1, a), true)
    def merge(x: (Double, Boolean), y: (Double, Boolean)): (Double, Boolean) =
      (math.max(x._1, y._1), x._2 || y._2)
    def finish(b: (Double, Boolean)): java.lang.Double = if (b._2) b._1 else null
    def bufferEncoder: Encoder[(Double, Boolean)] = Encoders.product[(Double, Boolean)]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  val noneMin = org.apache.spark.sql.functions.udaf(new NoneMin, Encoders.DOUBLE)
  val noneMax = org.apache.spark.sql.functions.udaf(new NoneMax, Encoders.DOUBLE)

  /** Mergeable bounded top-k: the buffer never exceeds k values, partials
    * combine by merge-and-truncate — a constant-memory sketch whose result
    * is EXACT (unlike quantile/HLL sketches). The training-pipeline
    * workhorse for "k best documents per domain/language/cluster" where a
    * group can be billions of rows: state is O(k) on every executor, and
    * map-side partial aggregation shrinks the shuffle to k values per
    * (group × mapper). Output is sorted descending.
    */
  class TopK(k: Int) extends Aggregator[java.lang.Double, Seq[Double], Seq[Double]] {
    require(k > 0, "k must be positive")
    def zero: Seq[Double] = Vector.empty
    private def bound(s: Seq[Double]): Seq[Double] =
      if (s.size <= k) s else s.sorted(Ordering[Double].reverse).take(k)
    def reduce(b: Seq[Double], a: java.lang.Double): Seq[Double] =
      if (a == null || a.isNaN) b else bound(b :+ a.doubleValue)
    def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] = bound(x ++ y)
    def finish(b: Seq[Double]): Seq[Double] = b.sorted(Ordering[Double].reverse)
    def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  def topK(k: Int) = org.apache.spark.sql.functions.udaf(new TopK(k), Encoders.DOUBLE)

  /** Elementwise sum of equal-length LONG arrays — the fixed-point
    * centroid accumulator ([[graft.functions.Similarity.kmeansCentroids]]):
    * long addition is exact and order-independent, so partials merge
    * map-side in any order with a bit-identical result. Buffer is one
    * d-length array per (group × mapper) — the whole point: a Lloyd
    * iteration shuffles k·d longs per task instead of exploding the
    * corpus to n·d component rows. Null/empty inputs are skipped;
    * mismatched lengths fail loudly (a silent truncation would corrupt
    * every centroid component after the shorter vector).
    */
  class SumLongArrays extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    private def add(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length,
          s"SumLongArrays: mismatched lengths ${a.length} != ${b.length}")
        val out = new Array[Long](a.length)
        var i = 0
        while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    def reduce(b: Seq[Long], a: Seq[Long]): Seq[Long] =
      if (a == null) b else add(b, a)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = add(x, y)
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  val sumLongArrays = org.apache.spark.sql.functions.udaf(new SumLongArrays,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
}
