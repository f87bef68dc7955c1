package graft

import graft.ops.EventWindows
import graft.streaming.StreamingWindows
import org.apache.spark.sql.functions._

/** Structured Streaming windows must agree with the batch forms on the
  * same input (the events parquet at sf0.001 drives the stream).
  */
class StreamingSpec extends SparkSuite {

  test("streaming tumbling counts == batch tumbling counts") {
    val dir = "/root/testdata/sf0.001"
    val stream = StreamingWindows.readEventsStream(spark, dir)
    val q = StreamingWindows.runToMemory(
      StreamingWindows.tumblingCounts(stream, "10 minutes"), "stream_tumbling")
    try {
      val streamed = spark.table("stream_tumbling")
        .select("win_start", "event_type", "n", "sum_value")
      val batch = EventWindows.tumbling(Tables.events(spark, dir), 600)
        .select(col("win_start"), col("event_type"), col("n").as("bn"),
          col("sum_value").as("bsum"))
      val joined = streamed.join(batch, Seq("win_start", "event_type"), "full_outer")
      val mismatches = joined.filter(
        col("n").isNull || col("bn").isNull ||
          col("n") =!= col("bn") || col("sum_value") =!= col("bsum")).count()
      assert(mismatches == 0, "streaming and batch windows diverge")
      assert(streamed.count() > 0)
    } finally q.stop()
  }
}
