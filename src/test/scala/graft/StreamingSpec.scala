package graft

import graft.operators.Extensions
import graft.streaming.EventStream

/** Stream-batch parity: the SAME aggregation object (EventStream
  * .windowedAgg) run as a Structured Streaming query over the events
  * parquet must produce exactly the batch q26 result. */
class StreamingSpec extends SparkSpec {

  test("streaming windowed aggregation equals batch q26") {
    val q = EventStream.start(spark, sf1, "events_stream_test")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.sql(
      "SELECT day, event_type, n, sum_value FROM events_stream_test")
    val batch = Extensions.q26EventWindows(spark, sf1)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("watermark bounds state: query plan carries the watermark") {
    val agg = EventStream.windowedAgg(
      EventStream.readEvents(spark, sf1).withWatermark("ts", "1 day"))
    assert(agg.isStreaming)
    val plan = agg.queryExecution.logical.toString
    assert(plan.contains("EventTimeWatermark"), plan.take(800))
  }
}
