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

  test("q140 stream-static enrichment lands exactly on the batch join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.q140StreamEnrich(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = graft.sources.Tables.load(spark, sf1, "events")
      .join(broadcast(graft.sources.Tables.load(spark, sf1, "customer")
        .select(col("c_custkey").as("user_id"),
          col("c_nationkey").cast("bigint").as("nation"))), "user_id")
      .groupBy("nation")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq,
      "finite drained replay must equal the batch aggregation")
  }

  test("q157 streaming incremental LSH lands exactly on the q30 " +
    "index rebuild (confluence across batch splits)") {
    val streamed = graft.streaming.EventStream
      .q157StreamLsh(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val rebuilt = graft.operators.Dedup.q30DedupMinhashLsh(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === rebuilt,
      "lifetime streaming pair set must equal the full rebuild")
  }
}
