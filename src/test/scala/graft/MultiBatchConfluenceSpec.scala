package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Forced multi-batch confluence for EVERY declared streaming shape.
  *
  * Each declared query replays the events (or documents) table through
  * a REAL multi-micro-batch run — 4 part-files + maxFilesPerTrigger=1,
  * so state genuinely carries across 4 triggers — and must land on the
  * same result as the single-batch drain. Two split disciplines:
  *
  *  - The events fixture is TIME-ORDERED: file k holds the k-th
  *    event-time quartile (ties broken by event_id) and carries a
  *    strictly later modification time, so the file source replays
  *    history in event-time order — the production replay contract.
  *    This is what makes the watermark shapes exact (no row is ever
  *    late when batches ascend in time) and the per-key state machines
  *    (q267 token bucket, q283 funnel) order-proof: each user's events
  *    arrive across batches in global key order, and the per-batch
  *    sort concatenates to the oracle's global sort.
  *  - The documents fixture is an arbitrary 4-way split: the LSH
  *    index shapes (q157/q302) claim confluence under ANY split
  *    (every pair is generated exactly when its later member arrives),
  *    so they get the weaker, stronger-to-pass discipline.
  *
  * Census shapes (q109/q140/q236/q239/q253/q313/q336, and the
  * monitor family already pinned in StatefulStreamingSpec) are
  * confluent under any split — counts/sums/min-k merge associatively
  * and commutatively — but run here under the same forced replay so
  * the claim is executed, not argued.
  */
class MultiBatchConfluenceSpec extends SparkSpec {

  import MultiBatchFixtures._

  /** Multiset equality on canonicalized rows, with a readable diff. */
  private def assertSame(multi: DataFrame, single: DataFrame,
      shape: String): Unit = {
    val m = multi.collect().map(_.toString).sorted.toSeq
    val s = single.collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    assert(m === s,
      s"$shape diverged under forced 4-batch replay: " +
        s"only-multi=${m.diff(s).take(3)} only-single=${s.diff(m).take(3)}")
    assert(s.nonEmpty, s"$shape single-batch run returned no rows")
  }

  private def confluent(shape: String)(
      run: Option[Int] => DataFrame): Unit =
    test(s"$shape equals its single-batch drain under a forced " +
      "4-file time-ordered replay") {
      val multi = run(Some(1))
      spark.catalog.clearCache()
      val single = run(None)
      assertSame(multi, single, shape)
    }

  confluent("q109 windowed agg")(mf =>
    EventStream.q109StreamWindows(spark, eventsDir, mf))

  confluent("q114 mapGroupsWithState profiles")(mf =>
    EventStream.q114StreamProfiles(spark, eventsDir, mf))

  confluent("q117 flatMapGroupsWithState sessions")(mf =>
    EventStream.q117StreamSessions(spark, eventsDir, mf))

  confluent("q121 stream-stream interval join")(mf =>
    EventStream.q121StreamIntervalJoin(spark, eventsDir, mf))

  confluent("q126 streaming dedup")(mf =>
    EventStream.q126StreamDedup(spark, eventsDir, mf))

  confluent("q140 stream-static enrich")(mf =>
    EventStream.q140StreamEnrich(spark, eventsDir, mf))

  confluent("q146 foreachBatch upsert")(mf =>
    EventStream.q146StreamUpsert(spark, eventsDir, mf))

  confluent("q188 session_window")(mf =>
    EventStream.q188StreamSessionWindow(spark, eventsDir, mf))

  confluent("q236 KMV sketch windows")(mf =>
    EventStream.q236StreamKmv(spark, eventsDir, mf))

  confluent("q253 binned quantiles")(mf =>
    EventStream.q253StreamQuantile(spark, eventsDir, mf))

  confluent("q267 token-bucket rate limiter")(mf =>
    EventStream.q267StreamRateLimit(spark, eventsDir, mf))

  confluent("q283 windowed funnel machine")(mf =>
    EventStream.q283StreamFunnel(spark, eventsDir, mf))

  confluent("q313 streaming PSI")(mf =>
    EventStream.q313StreamPsi(spark, eventsDir, mf))

  confluent("q336 streaming CUSUM")(mf =>
    EventStream.q336StreamCusum(spark, eventsDir, mf))

  confluent("q442 streaming periodogram")(mf =>
    EventStream.q442StreamPeriodogram(spark, eventsDir, mf))

  confluent("q451 streaming dispersion")(mf =>
    EventStream.q451StreamDispersion(spark, eventsDir, mf))

  confluent("q458 streaming SPC chart")(mf =>
    EventStream.q458StreamSpc(spark, eventsDir, mf))

  confluent("q467 streaming user-skew monitor")(mf =>
    EventStream.q467StreamUserSkew(spark, eventsDir, mf))

  confluent("q484 streaming negative-binomial fit")(mf =>
    EventStream.q484StreamNegbin(spark, eventsDir, mf))

  confluent("q491 streaming coverage monitor")(mf =>
    EventStream.q491StreamCoverage(spark, docsDir, mf))

  confluent("q500 streaming HLL monitor")(mf =>
    EventStream.q500StreamHll(spark, eventsDir, mf))

  confluent("q505 streaming split-gain monitor")(mf =>
    EventStream.q505StreamSplitGain(spark, docsDir, mf))

  confluent("q517 streaming DSIR ratio monitor")(mf =>
    EventStream.q517StreamDsirRatios(spark, docsDir, mf))

  test("q239 heavy hitters: MG capture guarantee holds under a forced " +
    "4-file replay (sketch content may differ, the guarantee may not)") {
    // MG sketch CONTENT is merge-order dependent; the declared output
    // releases only true heavy hitters with their capture flag, which
    // the MG merge bound says can never be false — under ANY split.
    val multi = EventStream.q239StreamHeavyHitters(
      spark, eventsDir, Some(1))
    val mRows = multi.collect()
    spark.catalog.clearCache()
    val single = EventStream.q239StreamHeavyHitters(spark, eventsDir)
    val sRows = single.collect()
    spark.catalog.clearCache()
    assert(mRows.nonEmpty)
    assert(mRows.forall(_.getBoolean(4)),
      "a true heavy hitter escaped the sketch across batch merges")
    assert(mRows.map(_.toString).sorted.toSeq ===
      sRows.map(_.toString).sorted.toSeq)
  }

  test("q157 incremental LSH equals the q30 batch rebuild under a " +
    "forced 4-file arbitrary-split replay") {
    val streamed = EventStream.q157StreamLsh(spark, docsDir, Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Dedup.q30DedupMinhashLsh(spark, docsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(streamed === batch,
      s"only-streamed=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
    assert(batch.nonEmpty)
  }

  test("q302 incremental chunk dedup equals the q300 batch rebuild " +
    "under a forced 4-file arbitrary-split replay") {
    val streamed = EventStream.q302StreamChunkDedup(spark, docsDir, Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Dedup.q300ChunkNearDup(spark, docsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    spark.catalog.clearCache()
    assert(streamed === batch,
      s"only-streamed=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
    assert(batch.nonEmpty)
  }

  test("the fixture really is multi-batch: 4 part files, ascending " +
    "event-time ranges, ascending modification times") {
    val files = new java.io.File(s"$eventsDir/events.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(files.length === 4)
    assert(files.map(_.lastModified).sliding(2)
      .forall(w => w(0) < w(1)), "modification times must ascend")
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("ts"), max("ts")).head()
      (d.getTimestamp(0).getTime, d.getTimestamp(1).getTime)
    }
    assert(ranges.sliding(2).forall(w => w(0)._2 <= w(1)._1),
      s"file time ranges must be disjoint ascending: ${ranges.toSeq}")
  }
}

/** Shared fixtures, built once per JVM. */
object MultiBatchFixtures {

  /** sf0.001 events split into 4 event-time-quartile part files with
    * strictly ascending modification times (the file source replays
    * oldest-modified first, so batch k = quartile k). */
  lazy val eventsDir: String = {
    val spark = TestSpark.spark
    val ev = graft.sources.Tables.load(spark, TestSpark.sf1, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-timesplit-events").toString
    val tgt = new java.io.File(s"$dir/events.parquet")
    tgt.mkdirs()
    val ranked = ev.withColumn("__q",
      ntile(4).over(Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to 4) {
      val tmp = s"$dir/tmp$i"
      ranked.filter(col("__q") === i).drop("__q")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(tgt, f"part-$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // well-separated mtimes: the source's file ordering key
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    // q140's static dimension side reads from the same sf dir
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf1}/customer.parquet"),
      java.nio.file.Paths.get(s"$dir/customer.parquet"))
    dir
  }

  /** sf0.001 documents in an arbitrary 4-way split (no time axis —
    * the LSH shapes claim confluence under ANY split). */
  lazy val docsDir: String = {
    val spark = TestSpark.spark
    val docs = graft.sources.Tables.load(spark, TestSpark.sf1, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-split-docs").toString
    docs.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }
}
