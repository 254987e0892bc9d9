package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Event, EventStream}

/** Streaming semantics the parquet-driven parity test can't show:
  * incremental state across batches (mapGroupsWithState) and watermark
  * late-data drop across batch boundaries. */
class StatefulStreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("mapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.runningUserActivity(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("user_state_test").start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:01:00"), 7L, "purchase", 5.0),
        Event(3L, ts("2024-01-01 10:02:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData(
        Event(4L, ts("2024-01-01 11:00:00"), 7L, "purchase", 9.0))
      q.processAllAvailable()
      // latest update per user reflects ALL batches
      val latest = spark.sql(
        """SELECT user_id, max(n_events) AS n, max(n_purchases) AS p
           FROM user_state_test GROUP BY user_id""")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(latest(7L) === ((3L, 2L)))
      assert(latest(9L) === ((1L, 0L)))
    } finally q.stop()
  }

  test("watermark drops events later than 1 day behind max event time") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = EventStream.windowedAgg(
      input.toDS().toDF().withWatermark("ts", "1 day"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_data_test").start()
    try {
      // batch 1: one Jan-1 event; a Jan-4 event advances the watermark to
      // Jan-3, finalizing the Jan-1 window
      input.addData(
        Event(1L, ts("2024-01-01 12:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-04 00:30:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE Jan-1 event (behind watermark -> dropped) and a
      // Jan-6 event that finalizes the Jan-4 window
      input.addData(
        Event(3L, ts("2024-01-01 13:00:00"), 1L, "click", 1.0),
        Event(4L, ts("2024-01-06 00:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      val emitted = spark.sql(
        "SELECT day, n FROM late_data_test ORDER BY day")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(emitted("2024-01-01") === 1L,
        "late event must NOT be counted into the finalized window")
      assert(emitted("2024-01-04") === 1L)
      assert(!emitted.contains("2024-01-06"),
        "open window must not emit in append mode")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits closed sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionizeStateful(input.toDS(), gapSeconds = 1800L)
      .writeStream.outputMode("append")
      .format("memory").queryName("session_state_test").start()
    try {
      // batch 1: two events 10 min apart (one open session, nothing emits)
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 5L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:10:00"), 5L, "click", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM session_state_test").count() === 0L)
      // batch 2: an event 2h later closes the first session (n=2) and
      // opens a new one that stays in state
      input.addData(
        Event(3L, ts("2024-01-01 12:10:00"), 5L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM session_state_test")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((5L, 2L)))
    } finally q.stop()
  }

  test("session_window runs in streaming mode and emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = input.toDS().toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(
        session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("session_window_stream").start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 3L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:05:00"), 3L, "click", 1.0))
      q.processAllAvailable()
      // watermark still inside the session gap: nothing final yet
      assert(spark.sql("SELECT * FROM session_window_stream").count() === 0L)
      // jump event time far ahead: watermark passes session end + gap
      input.addData(Event(3L, ts("2024-01-01 14:00:00"), 3L, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(4L, ts("2024-01-01 18:00:00"), 3L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n FROM session_window_stream ORDER BY start")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.head === ((3L, 2L)),
        s"first closed session should hold both early events: ${rows.toSeq}")
    } finally q.stop()
  }

  test("batch and streaming share the stateful operator code path") {
    val batchResult = EventStream.runningUserActivity(
      EventStream.typedEvents(
        graft.sources.Tables.load(spark, sf1, "events")))
    import org.apache.spark.sql.functions.sum
    val total = batchResult.toDF().agg(sum("n_events")).head().getLong(0)
    assert(total === 1000L)
  }

  test("KmvMin sketch is merge-order invariant and equals the exact " +
    "k smallest distinct values") {
    val k = 8
    val agg = new graft.functions.KmvMin(k)
    val xs = Seq(42L, 7L, 7L, 99L, 3L, 42L, 15L, 8L, 23L, 4L, 16L,
      1000L, 3L, 2L, 77L, 2L)
    val truth = xs.distinct.sorted.take(k)
    // sequential reduce
    val seqBuf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(seqBuf) === truth)
    // every 2-way split merges to the same state
    for (cut <- 1 until xs.length) {
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === truth, s"split at $cut diverged")
    }
  }

  test("q236 streaming KMV estimate tracks the exact per-window " +
    "distinct count within sketch error") {
    val rows = EventStream.q236StreamKmv(spark, sf1).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val exact = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(countDistinct("user_id").as("nd")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rows.keySet === exact.keySet, "window census mismatch")
    for ((key, (nMins, est)) <- rows) {
      val nd = exact(key)
      if (nd < EventStream.StreamKmvK) {
        // under-filled sketch: the estimate IS exact (distinct hashes
        // can collide, so n_mins <= nd)
        assert(nMins <= nd && est === nMins, s"$key exact-mode")
      } else {
        // KMV relative error ~1/sqrt(k) (~18% at k=32); allow 3 sigma
        assert(est > nd / 2 && est < nd * 2,
          s"$key estimate $est vs exact $nd out of band")
      }
    }
  }

  test("q239 windowed heavy hitters: the MG guarantee holds on every " +
    "released row and the bot cohort dominates") {
    val rows = EventStream.q239StreamHeavyHitters(spark, sf1).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty, "no window produced a heavy hitter")
    assert(rows.forall(_._5),
      "a true heavy hitter escaped the sketch — MG guarantee broken")
    // the collapsed bot key fires (at tiny SFs sparse windows also
    // promote individual users — the bot's DOMINANCE is an sf0.01+
    // property, its presence is SF-invariant)
    assert(rows.exists(_._3 == -1L), "bot cohort never heavy")
    // every released row really clears the threshold
    import org.apache.spark.sql.functions._
    val census = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(col("ts").cast("date").as("day"), col("event_type"),
        expr("CASE WHEN user_id % 10 = 0 THEN -1 ELSE user_id END")
          .as("k"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))
        -> r.getLong(3)).toMap
    val totals = census.groupBy(t => (t._1._1, t._1._2)).view
      .mapValues(_.values.sum)
    for ((day, tpe, k, n, _) <- rows) {
      assert(census((day, tpe, k)) === n)
      assert(n * (EventStream.StreamHhK + 1) > totals((day, tpe)),
        s"($day,$tpe,$k) below the declared threshold")
    }
  }

  test("q157 planted HOT BAND: the streamed LSH replay stays exact and " +
    "complete under bucket skew (the q65-style skew case, streaming twin)") {
    import spark.implicits._
    // 40 IDENTICAL documents (identical minhash signatures → ONE band
    // bucket holding all of them in every band — the boilerplate-crawl
    // hot bucket) + 10 distinct docs. The q157 shape claim is that a
    // b-row bucket flows as b×b join-output ROWS across tasks (never a
    // per-bucket in-memory pair array), so a planted hot band must
    // neither crash nor lose pairs.
    val hotText = (1 to 20).map(i => s"w${i % 7}").mkString(" ")
    val docs = (0L until 40L).map(i => (i, hotText)) ++
      (100L until 110L).map(i =>
        (i, s"unique$i " * 12 + s"tail$i"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q157-skew").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val streamed = EventStream.q157StreamLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // confluence under skew: lifetime streamed output == the full batch
    // rebuild (q30) on the same corpus
    val batch = graft.operators.Dedup.q30DedupMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch,
      s"streamed/batch diverged under skew: only-streamed=" +
        s"${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    // the hot bucket really was hot: all C(40,2) identical-doc pairs
    // must be present (identical signatures collide in every band)
    val hotPairs = streamed.count { case (a, b) => a < 40 && b < 40 }
    assert(hotPairs === 40 * 39 / 2,
      s"expected the full identical-doc clique, got $hotPairs")
    spark.catalog.clearCache()
  }

  test("q347 streamed Good-Turing spectrum equals the q343 batch rebuild " +
    "under a forced multi-batch replay") {
    import spark.implicits._
    // 4 part-files + maxFilesPerTrigger=1 => 4 genuine micro-batches:
    // the census merge must be batch-split independent
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q347-multibatch").toString
    docs.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val nFiles = new java.io.File(s"$dir/documents.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 2, s"need a multi-file corpus, got $nFiles")
    val streamed = EventStream
      .q347StreamSpectrum(spark, dir, maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.TextOps.q343GoodTuring(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(streamed === batch,
      s"streamed/batch spectrum diverged: only-streamed=" +
        s"${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    assert(batch.nonEmpty)
    spark.catalog.clearCache()
  }

  test("q353 streamed vocabulary growth is batch-split independent " +
    "(4-file forced replay equals the single-batch drain)") {
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q353-multibatch").toString
    docs.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    def run(mf: Option[Int]) = EventStream
      .q353StreamVocabGrowth(spark, dir, maxFilesPerTrigger = mf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val multi = run(Some(1))
    spark.catalog.clearCache()
    val single = run(None)
    assert(multi === single,
      s"split-dependent: only-multi=${(multi -- single).take(5)} " +
        s"only-single=${(single -- multi).take(5)}")
    assert(single.nonEmpty)
    // the curve is a curve: types and tokens are nondecreasing in b
    val sorted = single.toSeq.sortBy(_._1)
    assert(sorted.sliding(2).forall(w =>
      w.length < 2 || (w(0)._2 <= w(1)._2 && w(0)._3 <= w(1)._3)))
    spark.catalog.clearCache()
  }

  test("q302 streamed chunk dedup equals the q300 batch rebuild " +
    "(confluence at chunk granularity)") {
    val streamed = EventStream.q302StreamChunkDedup(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Dedup.q300ChunkNearDup(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch,
      s"streamed/batch chunk census diverged: only-streamed=" +
        s"${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    assert(batch.nonEmpty, "census empty — planted chunk dupes missing")
    spark.catalog.clearCache()
  }

  test("q267 streamed token-bucket decisions replay a batch-collected " +
    "scala model per user and both branches carry mass") {
    import org.apache.spark.sql.functions._
    val out = EventStream.q267StreamRateLimit(spark, sf1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // single-batch drained-replay assumption: one emission per user in
    // the raw memory sink means every user's whole history hit one
    // flatMapGroupsWithState invocation (the per-invocation sort is
    // then the global order the oracle replays)
    val perBatch = spark.table("q267_stream_rate_limit_mem")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    assert(perBatch.nonEmpty && perBatch.forall(_ == 1L),
      "AvailableNow drain split users across micro-batches — the " +
        "per-batch sort no longer equals the oracle's global order")
    val events = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet === events.keySet)
    var (totAllow, totDeny) = (0L, 0L)
    for ((uid, es) <- events) {
      val sorted = es.map(e => (e._2, e._3)).sorted
      var tokens = EventStream.RateCap
      var last = Long.MinValue
      var allowed = 0L
      sorted.foreach { case (t, _) =>
        val refilled =
          if (last == Long.MinValue) tokens
          else math.min(EventStream.RateCap,
            tokens + (t - last) / EventStream.RateRefillS)
        if (refilled >= 1) { allowed += 1; tokens = refilled - 1 }
        else tokens = refilled
        last = t
      }
      val (n, a, d) = out(uid)
      assert(n === sorted.length.toLong)
      assert(a === allowed, s"user $uid admitted-count diverged")
      assert(d === n - allowed)
      totAllow += a
      totDeny += d
    }
    assert(totAllow > 0 && totDeny > 0,
      "a branch with zero mass means the calibration regressed")
  }

  test("q283 streamed funnel stages replay a batch-collected scala " +
    "machine per user and the windowed stages all carry mass") {
    import org.apache.spark.sql.functions._
    val out = EventStream.q283StreamFunnel(spark, sf1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single-batch drained-replay assumption (see q267 case above)
    val perBatch = spark.table("q283_stream_funnel_mem")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    assert(perBatch.nonEmpty && perBatch.forall(_ == 1L),
      "AvailableNow drain split users across micro-batches")
    val events = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("event_type"),
        (expr("unix_micros(ts) div 1000000") * 10000000L
          + col("event_id")).as("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet === events.keySet)
    for ((uid, es) <- events) {
      val sorted = es.map(e => (e._3, e._2)).sortBy(_._1)
      var stage = 0L
      var key = -1L
      def fits(k: Long): Boolean = k > key &&
        k / 10000000L - key / 10000000L <= EventStream.FunnelDeadlineS
      sorted.foreach { case (k, tpe) =>
        if (stage == 0L && tpe == "signup") { stage = 1; key = k }
        else if (stage == 1L && tpe == "click" && fits(k)) {
          stage = 2; key = k
        } else if (stage == 2L && tpe == "purchase" && fits(k)) {
          stage = 3; key = k
        }
      }
      assert(out(uid) === stage, s"user $uid terminal stage diverged")
    }
    val dist = out.values.groupBy(identity).view.mapValues(_.size)
    assert(Seq(1L, 2L, 3L).forall(st => dist.getOrElse(st, 0) > 0),
      s"a funnel stage carries no mass: $dist — deadline miscalibrated")
  }

  test("q369 streamed ACF equals batch q304 and is batch-split " +
    "independent (4-file forced replay)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("lag"), r.getAs[Long]("num"), r.getAs[Long]("den"))
    val streamed = EventStream.q369StreamAcf(spark, sf1)
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Stats.q304Acf(spark, sf1)
      .collect().map(key).toSet
    assert(streamed === batch,
      s"streamed/batch ACF diverged: only-streamed=" +
        s"${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
    // forced multi-batch: 4 part-files, one per micro-batch — the day
    // census merge must be batch-split independent
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q369-multibatch").toString
    ev.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val multi = EventStream
      .q369StreamAcf(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val whole = graft.operators.Stats.q304Acf(spark, dir)
      .collect().map(key).toSet
    assert(multi === whole,
      s"split-dependent: only-multi=${(multi -- whole).take(3)} " +
        s"only-whole=${(whole -- multi).take(3)}")
  }

  test("q388 streamed SPRT equals batch q386 and is batch-split " +
    "independent (4-file forced replay)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("day"), r.getAs[Long]("n"), r.getAs[Long]("k"),
        r.getAs[Long]("llr_micro"), r.getAs[String]("verdict"))
    val streamed = EventStream.q388StreamSprt(spark, sf1)
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Analytics.q386SprtMonitor(spark, sf1)
      .collect().map(key).toSet
    assert(streamed === batch,
      s"streamed/batch SPRT diverged: only-streamed=" +
        s"${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
    // forced multi-batch: 4 part-files, one per micro-batch — the
    // two-count day census merge must be batch-split independent
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q388-multibatch").toString
    ev.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val multi = EventStream
      .q388StreamSprt(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val whole = graft.operators.Analytics.q386SprtMonitor(spark, dir)
      .collect().map(key).toSet
    assert(multi === whole,
      s"split-dependent: only-multi=${(multi -- whole).take(3)} " +
        s"only-whole=${(whole -- multi).take(3)}")
  }

  test("q400 streamed EWMA equals batch q395 and is batch-split " +
    "independent (4-file forced replay)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("day"), r.getAs[Long]("x"),
        r.getAs[Long]("ewma_milli"))
    val streamed = EventStream.q400StreamEwma(spark, sf1)
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Analytics.q395Ewma(spark, sf1)
      .collect().map(key).toSet
    assert(streamed === batch,
      s"streamed/batch EWMA diverged: only-streamed=" +
        s"${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
    // forced multi-batch: 4 part-files, one per micro-batch — the
    // day-count census merge must be batch-split independent
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q400-multibatch").toString
    ev.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val multi = EventStream
      .q400StreamEwma(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val whole = graft.operators.Analytics.q395Ewma(spark, dir)
      .collect().map(key).toSet
    assert(multi === whole,
      s"split-dependent: only-multi=${(multi -- whole).take(3)} " +
        s"only-whole=${(whole -- multi).take(3)}")
  }

  test("q412 streamed halving bracket equals batch q411 and is " +
    "batch-split independent (4-file forced replay)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[Long]("cum1"),
        r.getAs[Long]("cum2"), r.getAs[Long]("cum3"),
        r.getAs[Long]("eliminated_phase"))
    val streamed = EventStream.q412StreamHalving(spark, sf1)
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Stats.q411SuccessiveHalving(spark, sf1)
      .collect().map(key).toSet
    assert(streamed === batch,
      s"streamed/batch bracket diverged: only-streamed=" +
        s"${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(batch.size === 5)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q412-multibatch").toString
    ev.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val multi = EventStream
      .q412StreamHalving(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val whole = graft.operators.Stats.q411SuccessiveHalving(spark, dir)
      .collect().map(key).toSet
    assert(multi === whole,
      s"split-dependent: only-multi=${(multi -- whole).take(3)} " +
        s"only-whole=${(whole -- multi).take(3)}")
  }

  test("q419 streamed Pocock looks equal batch q415 and are " +
    "batch-split independent (4-file forced replay)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("look"), r.getAs[String]("day"),
        r.getAs[Long]("na"), r.getAs[Long]("ka"),
        r.getAs[Long]("nb"), r.getAs[Long]("kb"),
        r.getAs[Long]("z_ppm"), r.getAs[Boolean]("crossed"))
    val streamed = EventStream.q419StreamPocock(spark, sf1)
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val batch = graft.operators.Stats.q415Pocock(spark, sf1)
      .collect().map(key).toSet
    assert(streamed === batch,
      s"streamed/batch looks diverged: only-streamed=" +
        s"${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(batch.size === 5)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q419-multibatch").toString
    ev.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val multi = EventStream
      .q419StreamPocock(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(key).toSet
    spark.catalog.clearCache()
    val whole = graft.operators.Stats.q415Pocock(spark, dir)
      .collect().map(key).toSet
    assert(multi === whole,
      s"split-dependent: only-multi=${(multi -- whole).take(3)} " +
        s"only-whole=${(whole -- multi).take(3)}")
  }

  // Round-10 verdict #8: the declared stateful shapes run on the
  // default HDFS-backed state store; at 100 TB/day state the
  // production config is RocksDB (off-heap, spillable, changelog
  // checkpointing). The provider is a pure storage swap — the operator
  // contract says the SINK must be bit-identical — so rerun every
  // stateful family member (arbitrary state q114/q117, dropDuplicates
  // q126, stream-stream join q121, incremental LSH q157) under
  // RocksDBStateStoreProvider and pin sink equality against the
  // default-provider run in the same session.
  // Round-11 verdict #3: transformWithState (Spark 4's arbitrary-state
  // API, successor to mapGroupsWithState) as a declared streaming
  // shape. The processor itself always runs on RocksDB (the API
  // requires it — q506 pins the provider for its own run and restores
  // the session conf), so "parity under both providers" here means:
  // whatever provider the SESSION is configured with, q506's sink must
  // equal the q114 twin's, which DOES honor the session provider.
  test("q506 transformWithState profiles equal the q114 " +
    "mapGroupsWithState twin under both session state providers") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks = EventStream.RocksDbProvider
    def run(k: String): Seq[String] =
      SparkEntry.queries(k)(spark, sf1)
        .collect().map(_.toString).sorted.toSeq
    // default (HDFS-backed) session provider
    val q114Default = run("q114_stream_profiles")
    val q506Default = run("q506_stream_profiles_tws")
    assert(q506Default === q114Default,
      "tws sink diverged from mapGroupsWithState under the default " +
        "session provider")
    assert(q506Default.nonEmpty)
    // RocksDB session provider
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, rocks)
    try {
      val q114Rocks = run("q114_stream_profiles")
      val q506Rocks = run("q506_stream_profiles_tws")
      assert(q506Rocks === q114Rocks,
        "tws sink diverged from mapGroupsWithState under the RocksDB " +
          "session provider")
      assert(q506Rocks === q506Default)
      // the q506 provider pin must have restored the session conf
      assert(spark.conf.get(confKey) === rocks)
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
    // and after a default-session run, no provider conf may linger
    assert(spark.conf.getOption(confKey) === prev)
  }

  test("transformWithState accumulates per-user ValueState across " +
    "micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, EventStream.RocksDbProvider)
    try {
      val input = MemoryStream[Event]
      val q = EventStream.runningUserActivityTws(input.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_state_test").start()
      try {
        input.addData(
          Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
          Event(2L, ts("2024-01-01 10:01:00"), 7L, "purchase", 5.0),
          Event(3L, ts("2024-01-01 10:02:00"), 9L, "view", 0.0))
        q.processAllAvailable()
        input.addData(
          Event(4L, ts("2024-01-01 11:00:00"), 7L, "purchase", 9.0))
        q.processAllAvailable()
        val latest = spark.sql(
          """SELECT user_id, max(n_events) AS n, max(n_purchases) AS p
             FROM tws_state_test GROUP BY user_id""")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        assert(latest(7L) === ((3L, 2L)))
        assert(latest(9L) === ((1L, 0L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("stateful shapes produce identical sinks under the RocksDB " +
    "state store provider") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val keys = Seq("q114_stream_profiles", "q117_stream_sessions",
      "q121_stream_interval_join", "q126_stream_dedup",
      "q157_stream_lsh")
    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      val base = fn(spark, sf1).collect().map(_.toString).sorted.toSeq
      val prev = spark.conf.getOption(confKey)
      spark.conf.set(confKey, rocks)
      try {
        val rocksRun = fn(spark, sf1)
          .collect().map(_.toString).sorted.toSeq
        assert(rocksRun === base,
          s"$k sink diverged under the RocksDB state store")
      } finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }
}
