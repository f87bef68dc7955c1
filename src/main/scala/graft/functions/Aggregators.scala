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
}
