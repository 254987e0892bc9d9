package graft

import org.apache.spark.sql.functions._

import graft.operators.Extensions

/** North-star extension checks (SURVEY.md §2.3): invariants the DuckDB
  * differential can't see (complement laws, idempotence, plan shape). */
class ExtensionsSpec extends SparkSpec {

  test("q156 halves partition the events exactly; gap is the share " +
    "difference; floored shares sum to within |types| ulps of 10^6") {
    val out = Extensions.q156CategoricalDrift(spark, sf1).collect()
    val total = graft.sources.Tables.load(spark, sf1, "events").count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum === total)
    out.foreach { r =>
      assert(r.getLong(5) === math.abs(r.getLong(3) - r.getLong(4)))
    }
    for (c <- Seq(3, 4)) {
      val s = out.map(_.getLong(c)).sum
      assert(s <= 1000000L && s > 1000000L - out.length,
        s"ppm shares sum to $s")
    }
  }

  test("q158 zone maps prune on the sorted layout where the unsorted " +
    "layout prunes nothing (skipping is a property of layout)") {
    val sorted = Extensions.q158ZoneMap(spark, sf1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(sorted.size === 4)
    // every block is accounted for: pruned + surviving rows = corpus
    val li = graft.sources.Tables.load(spark, sf1, "lineitem")
    val total = li.count()
    sorted.values.foreach { case (blocks, pruned, rows) =>
      assert(pruned >= 0L && pruned <= blocks)
      assert(rows <= total)
    }
    // the mid-range predicate (1997) must actually skip on the sorted
    // layout...
    assert(sorted(2)._2 > 0L, s"sorted layout pruned nothing: $sorted")
    // ...while the same stats blocked by UNSORTED arrival order span
    // the whole domain and prune zero blocks
    val unsortedPruned = li
      .groupBy((col("l_orderkey") / 4096).cast("bigint").as("blk"))
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .filter(col("hi") < lit("1997-01-01").cast("date") ||
        col("lo") > lit("1997-12-31").cast("date"))
      .count()
    assert(unsortedPruned === 0L,
      "unsorted blocks should span the domain and never prune")
  }

  test("q160 forward fill: purchases carry their own amount and " +
    "pre-first-purchase events stay null") {
    val filled = Extensions.q160ForwardFill(spark, sf1)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("v"),
        (unix_timestamp(col("ts")) * 10000000L + col("event_id"))
          .as("k"))
    val joined = filled.join(ev, "event_id").cache()
    // a purchase event's filled value is its own amount
    assert(joined.filter(col("event_type") === "purchase" &&
      col("filled") =!= col("v")).count() === 0L)
    // null exactly before each user's first purchase
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val model = joined.withColumn("seen",
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .over(w))
    assert(model.filter(col("seen") === 0L &&
      col("filled").isNotNull).count() === 0L)
    assert(model.filter(col("seen") > 0L &&
      col("filled").isNull).count() === 0L)
    joined.unpersist()
  }

  test("q161 as-of join matches the direct argmax model, nulls exactly " +
    "for users with no eligible snapshot row") {
    val got = Extensions.q161AsofJoin(spark, sf1).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // direct model: max (date, orderkey) among same-user orders at or
    // before the event date — the O(events x orders) plan q161 avoids
    // ISO date strings order correctly — sidesteps the java8-api
    // date class differences between the two timestamp carriers
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("date").cast("string").as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val ords = graft.sources.Tables.load(spark, sf1, "orders")
      .filter(col("o_custkey") % 7 =!= 3)
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.size === ev.length)
    var nulls = 0
    for ((eid, uid, d) <- ev) {
      val elig = ords.getOrElse(uid, Array.empty)
        .filter(_._2 <= d)
      val want =
        if (elig.isEmpty) None
        else Some(elig.maxBy(o => (o._2, o._3))._3)
      assert(got(eid) === want, s"event $eid user $uid date $d")
      if (want.isEmpty) nulls += 1
    }
    assert(nulls > 0, "withheld cust keys should leave some events null")
  }

  test("q162 MAD medians match a direct in-memory recompute and the " +
    "cut is non-vacuous") {
    val got = Extensions.q162MadOutliers(spark, sf1).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val rows = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((tpe, cents) <- rows) {
      val lowerMed = cents.sorted.apply((cents.length + 1) / 2 - 1)
      val devs = cents.map(c => math.abs(c - lowerMed))
      val lowerMad = devs.sorted.apply((devs.length + 1) / 2 - 1)
      val nOut = devs.count(_ > 3 * lowerMad).toLong
      assert(got(tpe) === ((lowerMed, lowerMad, nOut)), s"type $tpe")
    }
    assert(got.values.map(_._3).sum > 0L,
      "3*MAD on the exponential-tailed values must flag something")
  }

  test("q164 rolling range window matches per-row brute force") {
    val got = Extensions.q164RollingWindow(spark, sf1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("k"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = rows.groupBy(_._2)
    for ((eid, uid, k, _) <- rows) {
      val win = byUser(uid).filter(e =>
        e._3 >= k - Extensions.RollWindowSec && e._3 <= k)
      val want = (win.length.toLong, win.map(_._4).sum / 100.0)
      assert(got(eid) === want, s"event $eid")
    }
    // the window must genuinely aggregate neighbors, not just self
    assert(got.values.exists(_._1 > 1L))
  }

  test("q167 k-anonymity rollup matches an in-memory class census") {
    val got = Extensions.q167KAnonymity(spark, sf1).collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val rows = graft.sources.Tables.load(spark, sf1, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("bigint"),
        col("c_mktsegment"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " div 100000").as("band"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    for ((nat, g) <- rows.groupBy(_._2)) {
      val classes = g.groupBy(r => (r._3, r._4)).values.toSeq
      val risky = classes.filter(_.size < Extensions.KAnon)
      val want = (g.length.toLong, classes.length.toLong,
        risky.map(_.size).sum.toLong, risky.flatten.map(_._1).sum)
      assert(got(nat) === want, s"nation $nat")
    }
  }

  test("q168 equi-depth buckets hold equal counts (±1) with " +
    "non-decreasing boundaries") {
    val rows = Extensions.q168EquidepthHistogram(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((_, g) <- rows.groupBy(_._1)) {
      assert(g.map(_._2).sorted.toSeq === (0L to 9L))
      val sizes = g.map(_._4)
      assert(sizes.max - sizes.min <= 1L,
        s"equi-depth violated: ${sizes.toSeq}")
      val bounds = g.sortBy(_._2).map(_._3)
      assert(bounds.zip(bounds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q214 LM scores are well-formed probabilities over every transition") {
    val res = graft.operators.TextOps.q214BigramLmScore(spark, sf1)
      .collect()
    assert(res.nonEmpty)
    // transitions per doc = tokens - 1, summed over the ≥2-token docs
    val expected = graft.sources.Tables.load(spark, sf1, "documents")
      .select((size(split(col("text"), " ")) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1L)
      .agg(sum("nb")).head.getLong(0)
    assert(res.map(_.getAs[Long]("n_bigrams")).sum === expected)
    res.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val s = r.getAs[Long]("sum_p_ppm")
      val m = r.getAs[Long]("min_p_ppm")
      // each ppm probability is in (0, 10^6]: the doc's own bigram is in
      // the census, so p > 0 always; p = 1e6 iff w1 always precedes w2
      assert(m >= 1L && s <= n * 1000000L && m * n <= s)
    }
  }

  test("q217 l-diversity agrees with q167's census and its bounds") {
    val ld = graft.operators.Extensions.q217LDiversity(spark, sf1)
      .collect().map(r => r.getAs[Long]("c_nationkey") -> r).toMap
    val ka = graft.operators.Extensions.q167KAnonymity(spark, sf1)
      .collect()
    // same universe: per-nation row counts must match the q167 census
    ka.foreach { r =>
      assert(ld(r.getAs[Long]("c_nationkey")).getAs[Long]("n_rows")
        === r.getAs[Long]("n_rows"))
    }
    ld.values.foreach { r =>
      val minL = r.getAs[Long]("min_l")
      assert(minL >= 1L && minL <= 5L) // 5 market segments exist
      assert(r.getAs[Long]("n_rows_at_risk") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q218 fertility is >= 1 token/word and conserves the corpus words") {
    val res = graft.operators.TextOps.q218TokenizerFertility(spark, sf1)
      .collect()
    assert(res.length === 5) // 5 languages
    res.foreach { r =>
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L,
        "BPE can merge but every word is >= 1 token")
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
    }
    val corpusWords = graft.sources.Tables.load(spark, sf1, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(res.map(_.getAs[Long]("n_words")).sum === corpusWords)
  }

  test("q219 burst census is bounded and fires on this corpus") {
    val res = graft.operators.Extensions.q219BurstDetection(spark, sf1)
      .collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getAs[Long]("n_bursts") <= r.getAs[Long]("n_eval_hours"))
      assert(r.getAs[Long]("max_ratio_ppm") >= 0L)
    }
    // falsifiable: the threshold is calibrated to actually fire here
    assert(res.map(_.getAs[Long]("n_bursts")).sum > 0L)
  }

  test("q169 endpoint-sweep interval census equals the direct theta join") {
    val got = Extensions.q169IntervalJoin(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the semantic, straight: un-binned overlap theta join on the same
    // interval frame (viable at test scale only)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("k")
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    val iv = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * Extensions.AttribKeyScale +
          col("event_id")).as("k"))
      .withColumn("newrun",
        when(lag("event_type", 1).over(w) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("seq", sum("newrun").over(cum))
      .groupBy("user_id", "seq")
      .agg(max("event_type").as("state"),
        min("k").as("f"), max("k").as("t"))
    val direct = iv.as("a").join(iv.as("b"),
        col("a.state") === col("b.state") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.f") <= col("b.t") && col("b.f") <= col("a.t"))
      .groupBy(col("a.state").as("state"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a.user_id") + col("b.user_id") +
          col("a.seq") + col("b.seq")).as("checksum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === direct)
    assert(got.nonEmpty && got.forall(_._2 > 0L))
  }

  test("q82 outlier filter is non-vacuous (hits exist on uniform data)") {
    // a 2-sigma cut on a uniform column matches NOTHING (max deviation
    // is sqrt(3)*sigma ~ 1.73 sigma) — this guards the threshold against
    // regressing to a vacuously-green differential row
    assert(Extensions.q82ZscoreOutliers(spark, sf1).count() > 0L)
  }

  test("q88 bloom pruning honors its contract on real data") {
    val r = Extensions.q88BloomPrune(spark, sf1).head()
    assert(r.getAs[Long]("n_match") > 0L)
    assert(r.getAs[Boolean]("no_false_negatives"),
      "bloom filter produced a false negative")
    assert(r.getAs[Boolean]("fpr_bounded"),
      "false-positive rate exceeded the 5% bound")
  }

  test("q89 chunking tiles every document exactly") {
    import org.apache.spark.sql.functions._
    val chunks = graft.operators.TextOps.q89ChunkDocuments(spark, sf1)
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("len"))
    // stride geometry: last chunk's start + its token count = doc length,
    // and chunk indexes are dense 0..n-1
    val last = chunks.groupBy("doc_id").agg(
      max("chunk_idx").as("max_idx"),
      count(lit(1)).as("n_chunks"),
      max_by(col("n_tokens"), col("chunk_idx")).as("last_n"))
    val bad = last.join(docs, "doc_id")
      .filter(col("max_idx") =!= col("n_chunks") - 1 ||
        col("max_idx") * graft.operators.TextOps.ChunkStride
          + col("last_n") =!= col("len"))
    assert(bad.count() === 0L)
    assert(chunks.select("doc_id").distinct().count() === docs.count())
  }

  test("q122 scrub: untouched docs keep their text byte-for-byte, " +
    "cut counts respect the span geometry") {
    import org.apache.spark.sql.functions._
    val T = graft.operators.TextOps
    val r = T.q122BoilerplateScrub(spark, sf1).cache()
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ", split(col("text"), " "))).as("orig_md5"),
        size(split(col("text"), " ")).cast("bigint").as("len"))
    val j = r.join(docs, "doc_id").cache()
    // every document comes back exactly once
    assert(r.count() === docs.count())
    // n_cut = 0 <=> n_spans = 0 <=> the text is unchanged
    val bad = j.filter(
      (col("n_cut") === 0L) =!= (col("n_spans") === 0L) ||
        ((col("n_cut") === 0L) =!= (col("clean_md5") === col("orig_md5"))))
    assert(bad.count() === 0L, "identity must hold iff nothing was cut")
    // a span cuts at least ShingleN tokens (the k-gram is always fully
    // inside the doc) and at most every token
    val geo = j.filter(col("n_spans") > 0L).filter(
      col("n_cut") < col("n_spans") * graft.operators.Dedup.ShingleN ||
        col("n_cut") > col("len"))
    assert(geo.count() === 0L, "span geometry violated")
    j.unpersist(); r.unpersist()
  }

  test("q96 redaction removes every deny-listed word and counts hits") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.TextOps.q96PiiRedaction(spark, sf1)
    // no deny-listed token survives in the cleaned text
    val leaked = r.filter(
      array_contains(split(col("clean_text"), " "), "customer") ||
        array_contains(split(col("clean_text"), " "), "key") ||
        array_contains(split(col("clean_text"), " "), "merge"))
    assert(leaked.count() === 0L)
    assert(r.filter(col("n_pii") > 0L).count() > 0L, "vacuous: no hits")
    // hit count equals the deny-listed token census of the original
    val manual = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("doc_id"), size(expr(
        "filter(split(text, ' '), pw -> pw IN ('customer','key','merge'))"
      )).cast("bigint").as("m"))
    val bad = r.join(manual, "doc_id")
      .filter(col("n_pii") =!= col("m"))
    assert(bad.count() === 0L)
  }

  test("q98 postings are sorted, capped, and df-consistent") {
    import org.apache.spark.sql.functions._
    val idx = graft.operators.TextOps.q98InvertedIndex(spark, sf1)
      .collect()
    assert(idx.nonEmpty)
    idx.foreach { row =>
      val df = row.getAs[Long]("df")
      val ids = row.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length ===
        math.min(df, graft.operators.TextOps.PostingsCap.toLong))
      assert(ids.sameElements(ids.sorted), "postings not sorted")
      assert(ids.distinct.length === ids.length, "postings not distinct")
    }
  }

  test("q90 gate drops at least a decile and keeps the majority") {
    val n = graft.sources.Tables.load(spark, sf1, "documents").count()
    val kept = graft.operators.TextOps.q90QualityGate(spark, sf1).count()
    assert(n - kept >= n / 10, s"dropped ${n - kept} of $n — under a decile")
    assert(kept > n / 2, s"kept only $kept of $n")
  }

  test("q92 attribution gaps sit inside the hour and clicks are real") {
    val r = Extensions.q92ClickAttribution(spark, sf1)
    assert(r.count() > 0L)
    assert(r.filter(col("gap_s") < 0L ||
      col("gap_s") > Extensions.AttribWindowSec).count() === 0L)
    // every attributed click id is an actual click event
    val clicks = graft.sources.Tables.load(spark, sf1, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"))
    assert(r.select("click_id").exceptAll(clicks).count() === 0L)
    // one attribution per purchase
    assert(r.select("purchase_id").distinct().count() === r.count())
  }

  test("q93 cohort day-zero retention equals cohort size (the maximum)") {
    val r = Extensions.q93RetentionCohorts(spark, sf1)
    val day0 = r.filter(col("day_offset") === 0L)
      .select(col("cohort"), col("n_users").as("n0"))
    // offset-0 counts every cohort member, so it bounds all later offsets
    val viol = r.join(day0, "cohort")
      .filter(col("n_users") > col("n0"))
    assert(viol.count() === 0L)
    assert(day0.count() > 0L)
  }

  test("q20 aggregate groups cover the full returnflag x linestatus space") {
    val df = Extensions.q20GroupbyAgg(spark, sf1)
    assert(df.count() > 0 && df.count() <= 9)
    val total = df.agg(sum("n")).head().getLong(0)
    assert(total === 6000L)
  }

  test("q21 window rank returns exactly one winner per nation") {
    val df = Extensions.q21WindowRank(spark, sf1)
    assert(df.count() === df.select("c_nationkey").distinct().count())
  }

  test("q22 semi + anti partition the customer table") {
    val semi = Extensions.q22SemiJoin(spark, sf1).count()
    val anti = Extensions.q22SemiAntiJoin(spark, sf1).count()
    assert(semi + anti === 150L)
    assert(anti > 0L, "anti side should be non-empty for the P-status probe")
  }

  test("q23 exact dedup is idempotent and keeps the lowest doc_id") {
    val once = Extensions.q23DedupExact(spark, sf1)
    // all 500 texts are distinct at sf0.001 (FIXTURES.md) -> identity
    assert(once.count() === 500L)
    // idempotence on a fabricated duplicate set: doc_id shifted copies
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
    val dupes = docs.union(docs.withColumn("doc_id", col("doc_id") + 1000))
    dupes.createOrReplaceTempView("documents_dupes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("text").orderBy("doc_id")
    val dedup = dupes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(dedup.count() === 500L)
    // survivor is always the original (lower) id
    assert(dedup.filter(col("doc_id") >= 1000).count() === 0L)
  }

  test("q25 top-k similarity ranks the probe vector itself first") {
    val ids = Extensions.q25TopkSimilarity(spark, sf1)
      .collect().map(_.getLong(0))
    assert(ids.length === 20)
    assert(ids.head === 0L, "self-similarity (=1.0) must rank first")
  }

  test("q26 event windows cover the full January span") {
    val df = Extensions.q26EventWindows(spark, sf1)
    val days = df.select("day").distinct().count()
    assert(days === 30L, s"expected 30 one-day windows, got $days")
    val total = df.agg(sum("n")).head().getLong(0)
    assert(total === 1000L)
  }

  test("q27 extracts an integer k from every props JSON") {
    val df = Extensions.q27JsonExtract(spark, sf1)
    assert(df.filter(col("k").isNull).count() === 0L)
  }

  test("q39 rollup carries subtotal rows and a grand total") {
    val df = Extensions.q39Rollup(spark, sf1)
    val grand = df.filter(
      col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(grand.count() === 1L)
    assert(grand.head().getAs[Long]("n") === 6000L)
  }

  test("q40 cube contains all four grouping-set shapes") {
    val df = Extensions.q40Cube(spark, sf1)
    assert(df.filter(col("o_orderstatus").isNull &&
      col("o_orderpriority").isNull).count() === 1L)
    assert(df.filter(col("o_orderstatus").isNotNull &&
      col("o_orderpriority").isNull).count() > 0L)
    assert(df.filter(col("o_orderstatus").isNull &&
      col("o_orderpriority").isNotNull).count() > 0L)
  }

  test("q41 sessions partition all events and respect the 30-min gap") {
    val df = Extensions.q41Sessionize(spark, sf1)
    assert(df.agg(sum("n_events")).head().getLong(0) === 1000L)
    val bad = df.filter(
      col("session_end") < col("session_start")).count()
    assert(bad === 0L)
  }

  test("q44 left outer keeps every customer row at least once") {
    val df = Extensions.q44LeftOuter(spark, sf1)
    assert(df.select("c_custkey").distinct().count() === 150L)
    assert(df.filter(col("o_orderkey").isNull).count() > 0L,
      "customers without P-orders must appear with null order")
  }

  test("q45 full outer covers union of both key sets") {
    val df = Extensions.q45FullOuter(spark, sf1)
    // keys 0..149: 75 evens, 50 thirds, 25 both -> 75 + 50 - 25 = 100 rows
    assert(df.count() === 100L)
    assert(df.filter(col("even_key").isNull).count() === 25L)
    assert(df.filter(col("third_key").isNull).count() === 50L)
  }

  test("q47 approx distinct stays within the configured 2% error band") {
    val approx = Extensions.q47ApproxDistinct(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.load(spark, sf1, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n < 0.1, s"$k: approx $a vs exact $n")
    }
  }

  test("q49/q50 pivot-unpivot round trip recovers the group-by counts") {
    val long = Extensions.q50Unpivot(spark, sf1)
    val direct = graft.sources.Tables.load(spark, sf1, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
    assert(long.exceptAll(direct).count() === 0L)
    assert(direct.exceptAll(long).count() === 0L)
  }

  test("q51 explode preserves word counts per document") {
    val exploded = Extensions.q51Explode(spark, sf1)
      .groupBy("doc_id").count()
    val direct = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("count"))
    assert(exploded.exceptAll(direct).count() === 0L)
  }

  test("q57 as-of join matches every event and never looks forward") {
    val asof = Extensions.q57AsofJoin(spark, sf1)
    assert(asof.count() === 1000L)
    // join back to orders: matched order date must be <= event time
    val orders = graft.sources.Tables.load(spark, sf1, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val events = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_id"), col("ts"))
    val violations = asof.join(orders, Seq("o_orderkey"))
      .join(events, Seq("event_id"))
      .filter(col("o_orderdate") > col("ts"))
      .count()
    assert(violations === 0L, "as-of match must be at-or-before the event")
  }

  test("q58 range join assigns each part to exactly one band") {
    val df = Extensions.q58RangeJoin(spark, sf1)
    assert(df.count() === df.select("p_partkey").distinct().count())
  }

  test("q28 set ops partition the custkey set") {
    val df = Extensions.q28Setops(spark, sf1)
    val byTag = df.groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag.values.sum === 150L)
    assert(df.select("key").distinct().count() === 150L)
  }

  test("q116 pareto front equals the brute-force dominance model") {
    val front = Extensions.q116ParetoFront(spark, sf1)
      .select("c_nationkey", "c_custkey").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    // brute force: all-pairs dominance within each nation (fine at
    // sf0.001; the operator itself never compares pairs)
    val scored = graft.sources.Tables.load(spark, sf1, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .join(graft.sources.Tables.load(spark, sf1, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_nationkey"), col("cents"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val byNation = scored.groupBy(_._1)
    val model = scored.filter { case (nat, id, c, n) =>
      !byNation(nat).exists { case (_, id2, c2, n2) =>
        id2 != id && c2 >= c && n2 >= n && (c2 > c || n2 > n)
      }
    }.map(t => (t._1, t._2)).toSet
    assert(front === model)
  }

  test("q111 k-means step partitions the corpus into known clusters") {
    val conf = graft.operators.Similarity.q111KmeansRefine(spark, sf1)
    val e = graft.sources.Tables.load(spark, sf1, "embeddings")
    // the confusion matrix is a partition of the corpus: counts sum to
    // the corpus size, and every assigned cluster is an actual label
    // (centroids exist only for observed labels)
    assert(conf.agg(sum("n")).head().getLong(0) === e.count())
    val labels = e.select(col("label").cast("bigint")).distinct()
    assert(conf.select(col("cluster")).distinct()
      .exceptAll(labels).count() === 0L)
  }

  test("q112 novelty rate is a well-formed fraction of per-doc bigrams") {
    val nov = graft.operators.TextOps.q112BigramNovelty(spark, sf1)
    // novel bigrams can't exceed the doc's distinct bigrams, and the
    // distinct bigrams can't exceed word count - 1 (adjacent pairs)
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw"))
    val joined = nov.join(docs, "doc_id")
    assert(joined.filter(col("n_novel") > col("n_bigrams")).count() === 0L)
    assert(joined.filter(col("n_bigrams") > col("nw") - 1).count() === 0L)
    // every multi-word doc appears
    assert(nov.count() === docs.filter(col("nw") >= 2).count())
  }

  test("q129 z-order files each cover one 16x16 bucket tile — the " +
    "data-skipping guarantee") {
    val files = Extensions.q129ZorderLayout(spark, sf1).collect()
    assert(files.nonEmpty)
    // z div 256 pins the interleaved high 4 bits of BOTH dims, so every
    // file sits inside one 16×16 tile of (bx, by) space — the property
    // that makes point filters on EITHER column prune 15/16 of files
    val tile = 1 << (Extensions.ZBits / 2)
    for (f <- files) {
      val (minX, maxX) = (f.getLong(2), f.getLong(3))
      val (minY, maxY) = (f.getLong(4), f.getLong(5))
      assert(f.getLong(1) > 0L)
      assert(minX / tile === maxX / tile,
        s"file ${f.getLong(0)} straddles x-tiles [$minX, $maxX]")
      assert(minY / tile === maxY / tile,
        s"file ${f.getLong(0)} straddles y-tiles [$minY, $maxY]")
    }
  }

  test("q132 KS numerator equals a direct recompute and respects bounds") {
    val r = Extensions.q132KsDrift(spark, sf1).head()
    val (n1, n2, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n1 > 0L && n2 > 0L)
    assert(d >= 0L && d <= n1 * n2, "D/(n1·n2) must be a valid CDF gap")
    // direct model: collect the two samples, walk the merged domain
    val rows = graft.sources.Tables.load(spark, sf1, "lineitem")
      .filter(col("l_returnflag").isin("A", "N"))
      .select(col("l_quantity").cast("bigint").as("q"),
        col("l_returnflag").as("f"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val qs = rows.map(_._1).distinct.sorted
    var (c1, c2, best) = (0L, 0L, 0L)
    for (q <- qs) {
      c1 += rows.count(x => x._1 == q && x._2 == "A")
      c2 += rows.count(x => x._1 == q && x._2 == "N")
      best = math.max(best, math.abs(c1 * n2 - c2 * n1))
    }
    assert(d === best, s"declared KS numerator $d != model $best")
  }

  test("q170 interpolation matches a per-user scan model exactly and " +
    "stays inside the neighbor envelope") {
    val got = Extensions.q170LinearInterp(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), (unix_timestamp(col("ts")) *
          Extensions.AttribKeyScale + col("event_id")).as("k"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val model = scala.collection.mutable.Map[(Long, Long), Double]()
    for ((_, rows) <- ev.groupBy(_._1)) {
      val seq = rows.sortBy(_._2)
      val known = seq.filter(_._3 == "purchase")
      for (r <- seq if r._3 != "purchase") {
        val prev = known.filter(_._2 < r._2).lastOption
        val next = known.find(_._2 > r._2)
        for (p <- prev; n <- next)
          model((r._1, r._2)) =
            p._4 + ((n._4 - p._4) * (r._2 - p._2)) / (n._2 - p._2)
      }
    }
    assert(got.keySet === model.keySet)
    for ((k, v) <- got) {
      assert(v === model(k), s"interp mismatch at $k")
    }
  }

  test("q171 released counts stay within the noise bound of the true " +
    "counts and no suppressed group leaks") {
    val got = Extensions.q171DpCounts(spark, sf1).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = graft.sources.Tables.load(spark, sf1, "customer")
      .groupBy("c_nationkey", "c_mktsegment").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    for ((g, rel) <- got) {
      assert(truth(g) >= Extensions.DpSuppress, s"suppressed group $g leaked")
      assert(math.abs(rel - truth(g)) <= 3L, s"noise out of bound at $g")
    }
    for ((g, n) <- truth if n >= Extensions.DpSuppress)
      assert(got.contains(g), s"releasable group $g missing")
  }

  test("q173 bitmap AND-counts equal the direct distinct-key semi-join " +
    "census (bitmaps are exact, not approximate)") {
    val got = Extensions.q173BitmapIndex(spark, sf1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val li = graft.sources.Tables.load(spark, sf1, "lineitem")
    val f = li.select(col("l_returnflag").as("f"),
      col("l_orderkey").as("k")).distinct()
    val st = li.select(col("l_linestatus").as("st"),
      col("l_orderkey").as("k")).distinct()
    val direct = f.join(st, "k").groupBy("f", "st").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === direct)
  }

  test("q174 arm sizes partition the users and the z² recomputes from " +
    "the released integers") {
    val r = Extensions.q174AbLift(spark, sf1).head()
    val (n1, x1, n2, x2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = graft.sources.Tables.load(spark, sf1, "events")
      .select("user_id").distinct().count()
    assert(n1 + n2 === users)
    assert(x1 >= 0L && x1 <= n1 && x2 >= 0L && x2 <= n2)
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val p = (x1 + x2).toDouble / (n1 + n2)
    val z2 = ((p1 - p2) * (p1 - p2)) /
      ((p * (1 - p)) * (1.0 / n1 + 1.0 / n2))
    assert(r.getDouble(4) === p1 - p2)
    assert(r.getDouble(5) === z2)
  }

  test("q175 census-algebra gini equals the sorted-rank model exactly") {
    val got = Extensions.q175Gini(spark, sf1).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val raw = graft.sources.Tables.load(spark, sf1, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * lit(100)).as("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet === raw.keySet)
    raw.foreach { case (prio, xs) =>
      val n = xs.length.toLong
      val s = xs.sum
      // BigInt model: the declared algebra is decimal(38,0) exactly
      // because int64 overflows at sf10 (round-12 endurance finding)
      val ix = xs.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * x }.sum
      val gnum = 2 * ix - BigInt(n + 1) * s
      val ppb = gnum * BigInt(1000000000) / (BigInt(n) * s)
      assert(got(prio) === ((n, s, ppb.toLong)))
      assert(ppb >= 0 && ppb < BigInt(1000000000))
    }
  }

  test("q176 weighted median is the smallest value whose cumulative " +
    "weight reaches half the total") {
    val got = Extensions.q176WeightedMedian(spark, sf1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val raw = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * lit(100)).as("c"),
        col("l_quantity").cast("long").as("q")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    got.foreach { case (flag, (med, tw)) =>
      val rows = raw(flag)
      assert(tw === rows.map(_._3).sum)
      val below = rows.filter(_._2 < med).map(_._3).sum
      val atOrBelow = rows.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 < tw, "everything strictly below misses half")
      assert(atOrBelow * 2 >= tw, "including the median reaches half")
    }
  }

  test("q177 rules respect support bounds and conf/lift recompute from " +
    "the released integers") {
    val li = graft.sources.Tables.load(spark, sf1, "lineitem")
    val part = graft.sources.Tables.load(spark, sf1, "part")
    val nBaskets = li.select("l_orderkey").distinct().count()
    val rules = Extensions.q177AssocRules(spark, sf1).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val (n12, n1, n2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      assert(n12 <= math.min(n1, n2))
      assert(n12 * Extensions.AssocMinSupportDenom >= nBaskets)
      assert(r.getDouble(5) === n12.toDouble / n1.toDouble)
      assert(r.getDouble(6) ===
        (n12.toDouble * nBaskets.toDouble) / (n1.toDouble * n2.toDouble))
    }
  }

  test("q178 TWAP num/den match a per-user scan model and the quotient " +
    "recomputes from the released integers") {
    val got = Extensions.q178Twap(spark, sf1).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val model = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), floor(col("value") * lit(100)).as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues { rows =>
        val sorted = rows.sortBy(e => (e._2, e._3))
        val segs = sorted.zip(sorted.tail)
          .map { case (a, b) => (a._4, b._2 - a._2) }
        (segs.map(s => s._1 * s._2).sum, segs.map(_._2).sum)
      }.toMap.filter(_._2._2 > 0)
    assert(got.keySet === model.keySet)
    got.foreach { case (u, (num, den, twap)) =>
      assert((num, den) === model(u))
      assert(twap === num.toDouble / den.toDouble)
    }
  }

  test("q179 interpolated percentiles match the in-memory " +
    "PERCENTILE_CONT model and order correctly") {
    val got = Extensions.q179PercentileInterp(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val raw = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * lit(100)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.size === raw.size * 2)
    raw.foreach { case (flag, xs) =>
      val n = xs.length.toLong
      for (pp <- Seq(50L, 95L)) {
        val hnum = (n - 1) * pp
        val lo = xs(((hnum / 100)).toInt)
        val hi = xs(math.min(hnum / 100 + 1, n - 1).toInt)
        val frac = (hnum % 100).toDouble / 100
        val expect = lo.toDouble + frac * (hi.toDouble - lo.toDouble)
        assert(got((flag, pp)) === ((n, expect)))
      }
      assert(got((flag, 50L))._2 <= got((flag, 95L))._2)
    }
  }

  test("q226 blowup estimate equals the census arithmetic and its " +
    "top key really is the hottest") {
    val rows = graft.operators.Extensions.q226JoinBlowup(spark, sf1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 10)
    val census = graft.sources.Tables.load(spark, sf1, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = census.values.map(n => BigInt(n) * n).sum
    for ((k, n, pred, share) <- rows) {
      assert(n === census(k))
      assert(pred === n * n, s"key $k predicted_pairs")
      assert(BigInt(share) === BigInt(pred) * 1000000 / total,
        s"key $k share_ppm")
      // the prediction is exact for an equi-join: verify ONE key live
    }
    val (hotKey, hotN, hotPred, _) = rows.head
    assert(hotN === census.values.max,
      "top offender must carry the max multiplicity")
    val li = graft.sources.Tables.load(spark, sf1, "lineitem")
      .filter(col("l_partkey") === hotKey).select("l_partkey")
    assert(li.as("a").join(li.as("b"), "l_partkey").count() === hotPred,
      "predicted pair volume must equal the real join's output")
    // sorted descending with key tiebreak
    val preds = rows.map(_._3)
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b })
  }

  test("q229 TV distance is a [0, 1e6] metric that accounts for every " +
    "event and matches a recomputed L1") {
    val rows = graft.operators.Extensions.q229TvDistance(spark, sf1)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    assert(rows.values.map(v => v._1 + v._2).sum === ev.count(),
      "period halves must partition the stream")
    // recompute one type's TV from scratch
    import org.apache.spark.sql.functions._
    val d0 = ev.select(col("event_type"),
      expr(s"CAST(floor(value / ${graft.operators.Extensions.TvBand})" +
        " AS BIGINT)").as("band"),
      expr("unix_timestamp(ts) div 86400").as("d")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dmin = d0.map(_._3).min
    val half = (d0.map(_._3).max - dmin + 1) / 2
    for ((tpe, (n1, n2, tv)) <- rows) {
      assert(tv >= 0L && tv <= 1000000L, s"$tpe tv out of range")
      val mine = d0.filter(_._1 == tpe)
      val c1 = mine.filter(_._3 - dmin < half).groupBy(_._2)
        .view.mapValues(_.length.toLong).toMap
      val c2 = mine.filter(_._3 - dmin >= half).groupBy(_._2)
        .view.mapValues(_.length.toLong).toMap
      assert(c1.values.sum === n1 && c2.values.sum === n2)
      val num = (c1.keySet ++ c2.keySet).toSeq.map { b =>
        (BigInt(c1.getOrElse(b, 0L)) * n2 -
          BigInt(c2.getOrElse(b, 0L)) * n1).abs
      }.sum
      val expect = num * 1000000 /
        (2 * BigInt(math.max(n1, 1L)) * math.max(n2, 1L))
      assert(BigInt(tv) === expect, s"$tpe TV mismatch")
    }
  }

  test("q232 lateness audit matches a per-type high-water-mark replay " +
    "and finds real out-of-orderness") {
    val rows = graft.operators.Extensions.q232LatenessAudit(spark, sf1)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select("event_type", "event_id", "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime / 1000))
    val Lanes = graft.operators.Extensions.LatenessLanes
    for ((tpe, (n, nLate, maxLate, share)) <- rows) {
      val mine = ev.filter(_._1 == tpe)
      assert(n === mine.length.toLong)
      // replay: lane-local sequence by (ts, id), merge by (seq, lane)
      val arrival = mine.groupBy(_._3 % Lanes).toSeq.flatMap {
        case (lane, evs) =>
          evs.sortBy(e => (e._4, e._2)).zipWithIndex
            .map { case (e, i) => (i + 1, lane, e._4) }
      }.sortBy { case (seq, lane, _) => (seq, lane) }
      var hwm = Long.MinValue
      var late = 0L
      var worst = 0L
      for ((_, _, es) <- arrival) {
        hwm = math.max(hwm, es)
        val l = hwm - es
        if (l > 0) late += 1
        worst = math.max(worst, l)
      }
      assert(nLate === late, s"$tpe late count")
      assert(maxLate === worst, s"$tpe max lateness")
      assert(share === late * 1000000L / n)
      // the lane merge produced real out-of-orderness for every type
      assert(nLate > 0, s"$tpe: lane-skew replay found no lateness")
    }
  }

  test("q233 completes the privacy trio on q217's classes and matches " +
    "a recomputed worst-class TV per nation") {
    val E = graft.operators.Extensions
    val rows = E.q233TCloseness(spark, sf1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val cust = graft.sources.Tables.load(spark, sf1, "customer")
      .selectExpr("c_nationkey", "c_mktsegment AS seg",
        """CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           div 100000 AS band""").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val ntot = BigInt(cust.length)
    val gseg = cust.groupBy(_._2).view.mapValues(v => BigInt(v.length))
    for ((nat, (nCls, nRows, maxT, nFar, atRisk)) <- rows) {
      val mine = cust.filter(_._1 == nat)
      assert(nRows === mine.length.toLong, s"nation $nat row census")
      val classes = mine.groupBy(_._3)
      assert(nCls === classes.size.toLong)
      // note: .values.toSeq first — mapping a Map to (t, n) pairs would
      // rebuild a Map keyed by t and collapse equal-t classes
      val ts = classes.values.toSeq.map { members =>
        val n = BigInt(members.length)
        val cseg = members.groupBy(_._2).view
          .mapValues(v => BigInt(v.length))
        val num = gseg.keys.map(sg =>
          (cseg.getOrElse(sg, BigInt(0)) * ntot - gseg(sg) * n).abs).sum
        (num * 1000000 / (2 * n * ntot), n)
      }.toSeq
      assert(BigInt(maxT) === ts.map(_._1).max, s"nation $nat worst t")
      assert(maxT <= 1000000L)
      assert(nFar === ts.count(_._1 > E.TClosePpm).toLong)
      assert(BigInt(atRisk) ===
        ts.filter(_._1 > E.TClosePpm).map(_._2).sum)
    }
  }

  test("q243 overlap matrix is canonical, complete, and matches a " +
    "set-arithmetic replay for one pair") {
    val rows = graft.operators.TextOps.q243VocabOverlap(spark, sf1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).toSet).toMap
    val sources = vocab.keys.toSeq.sorted
    // one row per unordered pair, canonically ordered
    assert(rows.size === sources.size * (sources.size - 1) / 2)
    assert(rows.keys.forall { case (a, b) => a < b })
    // exact set-arithmetic replay of the first pair
    val (sa, sb) = (sources(0), sources(1))
    val (va, vb, shared, jac) = rows((sa, sb))
    assert(va === vocab(sa).size.toLong)
    assert(vb === vocab(sb).size.toLong)
    assert(shared === vocab(sa).intersect(vocab(sb)).size.toLong)
    assert(jac === shared * 1000000L / (va + vb - shared))
  }

  test("q244 confusion cells cover every document and per-language " +
    "shares telescope to ~1e6") {
    val rows = graft.operators.TextOps.q244LangConfusion(spark, sf1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val nDocs = graft.sources.Tables.load(spark, sf1, "documents")
      .count()
    assert(rows.map(_._3).sum === nDocs, "cells must partition corpus")
    for ((l, p, _, _, hit) <- rows) assert(hit === (l == p))
    for ((_, grp) <- rows.groupBy(_._1)) {
      val total = grp.map(_._4).sum
      // integer div loses < |cells| ppm per language
      assert(total <= 1000000L && total > 1000000L - grp.length,
        s"shares for ${grp.head._1} sum to $total")
    }
    // predictions stay in q34's label space; the matrix itself is the
    // finding — on this synthetic corpus it correctly reports that the
    // n-gram signal barely separates the metadata langs (mostly en/und
    // columns), which is exactly what the eval exists to surface
    val predSpace = Set("en", "es", "fr", "de", "und")
    assert(rows.forall(r => predSpace(r._2)))
    assert(rows.exists(_._5), "diagonal empty — join keys broken")
  }

  test("q245 peak concurrency matches an interval replay at hour " +
    "resolution for every state") {
    val E = graft.operators.Extensions
    val out = E.q245PeakConcurrency(spark, sf1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // rebuild the runs exactly as q143 does, then replay the sweep
    import org.apache.spark.sql.functions._
    val hscale = 3600L * E.AttribKeyScale
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * E.AttribKeyScale + col("event_id"))
          .as("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val intervals = ev.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(_._3)
      val runsB = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)]
      for ((_, tpe, k) <- sorted) {
        if (runsB.nonEmpty && runsB.last._1 == tpe) {
          val (t0, f0, _) = runsB.last
          runsB(runsB.length - 1) = (t0, f0, k)
        } else runsB += ((tpe, k, k))
      }
      runsB
    }.toSeq
    assert(intervals.length.toLong === out.values.map(_._1).sum,
      "replayed run count mismatch")
    for ((state, (ni, peak, peakH)) <- out) {
      val mine = intervals.filter(_._1 == state)
      assert(ni === mine.length.toLong)
      val hours = mine.flatMap(i => Seq(i._2 / hscale, i._3 / hscale))
        .distinct.sorted
      val actives = hours.map(h =>
        h -> mine.count(i => i._2 / hscale <= h && i._3 / hscale >= h))
      val best = actives.maxBy { case (h, a) => (a, -h) }
      assert(peak === best._2.toLong, s"$state peak")
      assert(peakH === best._1, s"$state peak hour")
    }
  }

  test("q262 fano factors replay the zero-inclusive dispersion formula " +
    "and the list is support-filtered and rank-ordered") {
    val rows = graft.operators.TextOps.q262TokenBurstiness(spark, sf1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.length <= graft.operators.TextOps.BurstTopK)
    // rank order: fano desc, token asc
    assert(rows.sliding(2).forall {
      case Array((w1, _, _, f1), (w2, _, _, f2)) =>
        f1 > f2 || (f1 == f2 && w1 < w2)
      case _ => true
    })
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val nDocs = BigInt(docs.length)
    for ((w, df, tf, fano) <- rows.take(10)) {
      assert(df >= graft.operators.TextOps.BurstMinDf)
      val counts = docs.map(_._2.count(_ == w).toLong).filter(_ > 0)
      assert(df === counts.length.toLong)
      assert(tf === counts.sum)
      val sc2 = counts.map(c => BigInt(c) * c).sum
      assert(fano ===
        ((nDocs * sc2 - BigInt(tf) * tf) * 1000000 /
          (nDocs * tf)).toLong, s"token $w fano diverged")
    }
  }

  test("q275 conversion is monotone in the window and the 6h point " +
    "replays an independent pair scan") {
    val E = graft.operators.Extensions
    val rows = E.q275AttributionSweep(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === E.AttrWindowsS)
    assert(rows.map(_._2).distinct.length === 1,
      "total click count must not depend on the window")
    val conv = rows.map(_._3)
    assert(conv.zip(conv.tail).forall { case (a, b) => a <= b },
      "a wider window cannot lose conversions")
    for ((w, nc, k, ppm) <- rows) assert(ppm === k * 1000000L / nc)
    // independent replay at the middle window
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 1000000").as("t"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val mid = E.AttrWindowsS(1)
    var converted = 0L
    var clicks = 0L
    for ((_, es) <- byUser) {
      val cs = es.filter(_._2 == "click")
      val ps = es.filter(_._2 == "purchase").map(_._3)
      clicks += cs.length
      converted += cs.count(c =>
        ps.exists(p => p > c._3 && p - c._3 <= mid))
    }
    assert(rows(1)._2 === clicks)
    assert(rows(1)._3 === converted, "6h window replay diverged")
  }

  test("q276 planner is monotone both ways and chooses the smallest " +
    "cap inside the truncation budget") {
    val T = graft.operators.TextOps
    val rows = T.q276TruncationPlanner(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === T.TruncCandidates)
    val kept = rows.map(_._2)
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b },
      "a higher cap cannot keep fewer tokens")
    val tr = rows.map(_._4)
    assert(tr.zip(tr.tail).forall { case (a, b) => a >= b },
      "a higher cap cannot truncate more documents")
    val within = rows.filter(_._5 <= T.TruncBudgetPpm)
    assert(within.nonEmpty, "no candidate fits the budget — widen grid")
    assert(rows.filter(_._6).map(_._1).toSeq ===
      Seq(within.map(_._1).min),
      "chosen must be exactly the smallest in-budget cap")
    // replay one cap against the collected length census
    val lens = graft.sources.Tables.load(spark, sf1, "documents")
      .select(size(split(col("text"), " ")).cast("bigint")).collect()
      .map(_.getLong(0))
    val cap = rows.head._1
    assert(rows.head._2 === lens.map(l => math.min(l, cap)).sum)
    assert(rows.head._4 === lens.count(_ > cap).toLong)
  }

  test("q278 both layouts cover the same rows with the same file " +
    "count, and the measured tradeoff points the right way") {
    val E = graft.operators.Extensions
    val rows = E.q278LayoutPruningEval(spark, sf1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet === Set("linear_x", "zorder"))
    val (lf, lr, lx, ly) = rows("linear_x")
    val (zf, zr, zx, zy) = rows("zorder")
    assert(lr === zr, "layouts must cover identical row sets")
    // occupancy (and hence file count) depends on SF; both are capped
    // by the 256-slot geometry
    assert(lf <= 256L && zf <= 256L)
    // linear prunes perfectly on its sort column: 1 bucket per file
    // (file == bx, so min == max in x, always — SF-independent)
    assert(lx === lf, "linear layout's x-width must be exactly 1/file")
    // z-order: per-file spans are ≤16 in BOTH dims by Morton-tile
    // construction — the bound that makes two-column pruning work
    assert(zx <= zf * 16 && zy <= zf * 16,
      "a Morton tile leaked outside its 16x16 bucket square")
    // the tradeoff: z-order pays on x, wins on y, and wins combined
    assert(zy < ly && zx > lx)
    assert(zx + zy < lx + ly,
      "z-order must win the combined pruning budget — q129's claim")
  }

  test("q288 SLA audit: quantiles ordered, breach share replays an " +
    "independent joined scan per priority") {
    val E = graft.operators.Extensions
    val rows = E.q288ShippingSla(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length === 5)
    val joined = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(graft.sources.Tables.load(spark, sf1, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    for ((pri, n, p50, p95, breach) <- rows) {
      val ds = joined(pri).map(_._2).sorted
      assert(n === ds.length.toLong)
      assert(p50 <= p95)
      def q(pct: Long): Long = ds.zipWithIndex.find {
        case (_, i) => (i + 1) * 100L >= ds.length * pct
      }.get._1
      assert(p50 === q(50) && p95 === q(95), s"$pri quantiles")
      assert(breach ===
        ds.count(_ > E.SlaDays).toLong * 1000000L / n, s"$pri breach")
    }
  }

  test("q290 sessions partition the event stream and the conversion " +
    "curve rises with session length") {
    val E = graft.operators.Extensions
    val rows = E.q290SessionConversion(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.nonEmpty)
    for ((band, n, k, ppm) <- rows) {
      assert(band >= 1 && band <= E.SessConvCap)
      assert(k <= n)
      assert(ppm === k * 1000000L / n)
    }
    // independent session count: replay the 30-min gap sessionizer
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    val sessions = ev.values.map { es =>
      val ts = es.map(_._2).sorted
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > 1800L }
    }.sum
    assert(rows.map(_._2).sum === sessions.toLong,
      "band census must partition the replayed session set")
    // engagement → conversion: the rate must be non-decreasing
    val rates = rows.map(_._4)
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      "conversion must rise with session length on this corpus")
  }

  test("q409 varint sizing replays the gap model and density drives " +
    "the savings") {
    val rows = graft.operators.TextOps.q409PostingsVarint(spark, sf1)
      .collect()
      .map(r => r.getAs[String]("term") -> (r.getAs[Long]("df"),
        r.getAs[Long]("varint_bytes"), r.getAs[Long]("fixed_bytes"),
        r.getAs[Long]("savings_ppm"))).toMap
    val postings = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .distinct().collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    def vbytes(g: Long): Long =
      if (g < 128) 1 else if (g < 16384) 2 else if (g < 2097152) 3
      else if (g < 268435456) 4 else 5
    assert(rows.keySet === postings.keySet)
    postings.foreach { case (t, ids) =>
      val gaps = (ids.head + 1) +: ids.zip(ids.tail).map(p => p._2 - p._1)
      val vb = gaps.map(vbytes).sum
      val (df, gvb, fb, sp) = rows(t)
      assert(df === ids.length.toLong, t)
      assert(gvb === vb, t)
      assert(fb === df * 8, t)
      assert(sp === (fb - vb) * 1000000L / fb, t)
      // every gap costs at least 1 and at most 8 bytes' worth
      assert(gvb >= df && gvb <= fb, t)
    }
    // the corpus's dense terms (df ~ half the corpus → gaps ~2) must
    // compress near 1 byte/posting: savings ≈ 7/8
    val best = rows.values.map(_._4).max
    assert(best > 800000L, s"densest term saves only $best ppm")
  }

  test("q408 runs test replays the run construction and stays in the " +
    "iid band") {
    val row = graft.operators.Stats.q408RunsTest(spark, sf1).head()
    val daily = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(to_date(col("ts")).as("day")).count().orderBy("day")
      .collect().map(_.getLong(1))
    val med = daily.zipWithIndex
      .sortBy { case (x, i) => (x, i) }
      .apply((daily.length + 1) / 2 - 1)._1
    // careful: the query's median rank ties on (x, day); counts map
    // 1:1 to days here so (x, index-in-day-order) reproduces it
    val above = daily.map(_ > med)
    val n1 = above.count(identity).toLong
    val n2 = above.length - n1
    val r = 1L + above.zip(above.tail).count { case (a, b) => a != b }
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(row.getAs[Long]("r") === r)
    val mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    val s2 = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1.0))
    assert(row.getAs[Long]("z_ppm") ===
      math.floor((r - mu) / math.sqrt(s2) * 1e6).toLong)
    // iid daily counts: randomness must NOT be rejected at alpha=0.001
    assert(math.abs(row.getAs[Long]("z_ppm")) < 3290527L,
      "runs test fired on the iid generator")
  }

  test("q410 encoding advisor replays the census model and picks a " +
    "consistent winner") {
    val rows = graft.operators.Extensions.q410EncodingAdvisor(spark, sf1)
      .collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val data = graft.sources.Tables.load(spark, sf1, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // density precondition of the a.k = b.k + 1 run counter: the
    // generator must emit gapless orderkeys, else the self-join
    // silently undercounts run boundaries (and the oracle shares the
    // assumption, so only this assertion would catch generator drift)
    assert(data.map(_._1).max - data.map(_._1).min + 1 ===
      data.length.toLong, "orderkey domain must be dense for q410")
    def model(vals: Seq[String]) = {
      val n = vals.length.toLong
      val ndv = vals.distinct.length.toLong
      val runs = 1L + vals.zip(vals.tail).count { case (a, b) => a != b }
      val plain = vals.map(_.length.toLong).sum
      val dlen = vals.distinct.map(_.length.toLong).sum
      val maxlen = vals.map(_.length.toLong).max
      val bits = math.max(math.ceil(math.log(ndv.toDouble) /
        math.log(2.0)).toLong, 1L)
      (n, ndv, runs, plain, dlen + (n * bits + 7) / 8,
        runs * (maxlen + 4))
    }
    Seq("o_orderstatus" -> data.map(_._2).toSeq,
      "o_orderpriority" -> data.map(_._3).toSeq).foreach {
      case (cn, vals) =>
        val (n, ndv, runs, plain, dict, rle) = model(vals)
        val r = rows(cn)
        assert(r.getAs[Long]("n") === n, cn)
        assert(r.getAs[Long]("ndv") === ndv, cn)
        assert(r.getAs[Long]("runs") === runs, cn)
        assert(r.getAs[Long]("plain_bytes") === plain, cn)
        assert(r.getAs[Long]("dict_bytes") === dict, cn)
        assert(r.getAs[Long]("rle_bytes") === rle, cn)
        // structural: each distinct value opens at least one run
        assert(ndv <= runs && runs <= n, cn)
        val best = r.getAs[String]("best")
        val m = Map("plain" -> plain, "dict" -> dict, "rle" -> rle)
        assert(m(best) === m.values.min, s"$cn winner not minimal")
    }
    // unsorted high-churn columns: dictionary must beat RLE here
    assert(rows("o_orderpriority").getAs[String]("best") === "dict")
  }

  test("q417 FOR sizing replays the min/max census and always packs " +
    "tighter than plain on these key domains") {
    val rows = graft.operators.Extensions.q417ForEncoding(spark, sf1)
      .collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val li = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = li.length.toLong
    Seq(("l_partkey", li.map(_._1)), ("l_suppkey", li.map(_._2)),
      ("qty", li.map(_._3))).foreach { case (cn, vals) =>
      val (mn, mx) = (vals.min, vals.max)
      val bits = math.max(math.ceil(math.log((mx - mn + 1).toDouble) /
        math.log(2.0)).toLong, 1L)
      val packed = (n * bits + 7) / 8 + 8
      val r = rows(cn)
      assert(r.getAs[Long]("n") === n, cn)
      assert(r.getAs[Long]("mn") === mn, cn)
      assert(r.getAs[Long]("mx") === mx, cn)
      assert(r.getAs[Long]("bits") === bits, cn)
      assert(r.getAs[Long]("packed_bytes") === packed, cn)
      assert(r.getAs[Long]("plain_bytes") === n * 8, cn)
      assert(r.getAs[Long]("savings_ppm") ===
        (n * 8 - packed) * 1000000L / (n * 8), cn)
      // the generator's key domains are far narrower than 64 bits
      assert(bits < 32L, cn)
      assert(packed < n * 8, cn)
    }
  }

  test("q465 dictionary advisor replays the byte model and low-" +
    "cardinality columns always win") {
    val E = graft.operators.Extensions
    val rows = E.q465DictEncodingAdvisor(spark, sf1).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n"), r.getAs[Long]("ndv"),
          r.getAs[Long]("plain_bytes"), r.getAs[Long]("dict_bytes"),
          r.getAs[Long]("win_ppm"))).toMap
    assert(rows.size === E.DictCols.size)
    E.DictCols.foreach { case (tab, c) =>
      val vals = graft.sources.Tables.load(spark, sf1, tab)
        .select(c).collect().map(_.getString(0))
      val n = vals.length.toLong
      val ndv = vals.distinct.length.toLong
      val plain = vals.map(_.length.toLong).sum
      val bits = math.max(1,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(ndv - 1, 1)))
      // ladder semantics: smallest b with ndv <= 2^b
      val b = (1 to 40).find(b => ndv <= (1L << b)).getOrElse(63)
      val dict = vals.distinct.map(_.length.toLong).sum +
        (n * b + 7) / 8
      val (gN, gNdv, gPlain, gDict, gWin) = rows(s"$tab.$c")
      assert(gN === n); assert(gNdv === ndv); assert(gPlain === plain)
      assert(gDict === dict, s"$tab.$c dict bytes (bits=$bits)")
      assert(gWin === dict * 1000000L / plain)
      // every audited column is low-cardinality: dictionary must win
      assert(gWin < 1000000L, s"$tab.$c dictionary should win")
    }
  }

  test("q466 date-gap audit replays the distinct-day census and the " +
    "dense axes report zero missing days") {
    val E = graft.operators.Extensions
    val rows = E.q466DateGapAudit(spark, sf1).collect()
      .map(r => r.getAs[String]("axis") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("span_days"),
          r.getAs[Long]("missing_days"), r.getAs[Long]("max_gap_days")))
      .toMap
    assert(rows.size === E.GapCols.size)
    E.GapCols.foreach { case (tab, c) =>
      val days = graft.sources.Tables.load(spark, sf1, tab)
        .select(to_date(col(c)).as("d")).distinct().collect()
        .map(_.getDate(0).toLocalDate).sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        days.head, days.last) + 1
      val maxGap =
        if (days.length < 2) 0L
        else days.sliding(2).map(w => java.time.temporal.ChronoUnit
          .DAYS.between(w(0), w(1))).max - 1
      val (gN, gSpan, gMiss, gGap) = rows(s"$tab.$c")
      assert(gN === days.length.toLong, s"$tab.$c days")
      assert(gSpan === span, s"$tab.$c span")
      assert(gMiss === span - days.length, s"$tab.$c missing")
      assert(gGap === maxGap, s"$tab.$c gap")
      assert(gMiss >= 0L && gGap >= 0L)
    }
    // the 30-day events axis is dense by generation
    assert(rows("events.ts")._3 === 0L)
  }

  test("q468 histogram advisor: estimates replay the interpolation " +
    "model and equi-depth never loses badly on this skewless column") {
    val E = graft.operators.Extensions
    val rows = E.q468HistogramErrorAdvisor(spark, sf1).collect()
      .map(r => r.getAs[String]("htype") ->
        (r.getAs[Long]("mean_abs_err_ppm"), r.getAs[Long]("max_err_ppm")))
      .toMap
    assert(rows.keySet === Set("equi_width", "equi_depth"))
    rows.values.foreach { case (mean, mx) =>
      assert(mean >= 0L && mx >= mean)
      assert(mx <= 1000000L, "error cannot exceed the whole relation")
    }
    // l_quantity is uniform on 1..50: both histograms should estimate
    // range selectivities within a few percent
    rows.foreach { case (t, (mean, _)) =>
      assert(mean < 50000L, s"$t mean err $mean ppm on a uniform column")
    }
  }

  test("q482 session-gap sweep replays the break-count identity and " +
    "is monotone: larger gaps mean fewer sessions") {
    val E = graft.operators.Extensions
    val rows = E.q482SessionGapSweep(spark, sf1).collect()
      .map(r => r.getAs[Long]("gap_s") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("mean_events_milli")))
      .toMap
    assert(rows.keySet === E.SessionGapsS.toSet)
    val evs = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"),
        expr("CAST(date_trunc('second', ts) AS LONG)").as("tse"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nu = evs.size.toLong
    val ne = evs.values.map(_.size.toLong).sum
    E.SessionGapsS.foreach { g =>
      val breaks = evs.values.map(ts =>
        ts.sliding(2).count(w => w.length == 2 && w(1) - w(0) > g)
          .toLong).sum
      val (gN, gM) = rows(g)
      assert(gN === nu + breaks, s"gap $g sessions")
      assert(gM === 1000L * ne / (nu + breaks), s"gap $g mean")
    }
    val ns = E.SessionGapsS.map(rows(_)._1)
    assert(ns === ns.sorted.reverse, "session count must fall with gap")
  }

  test("q490 props profile replays the parse ledger and the generator " +
    "emits a fully valid k in 0..99") {
    val row = graft.operators.Extensions.q490JsonPropsProfile(spark, sf1)
      .head()
    val ks = graft.sources.Tables.load(spark, sf1, "events")
      .select("props").collect().map(_.getString(0))
      .map { p =>
        val m = """\{"k": (\d+)\}""".r.findFirstMatchIn(p)
        m.map(_.group(1).toLong)
      }
    assert(row.getAs[Long]("n") === ks.length.toLong)
    assert(row.getAs[Long]("n_valid") === ks.count(_.isDefined).toLong)
    assert(row.getAs[Long]("n_invalid") === ks.count(_.isEmpty).toLong)
    val vs = ks.flatten
    assert(row.getAs[Long]("k_min") === vs.min)
    assert(row.getAs[Long]("k_max") === vs.max)
    assert(row.getAs[Long]("k_mean_milli") ===
      1000L * vs.sum / vs.length)
    assert(row.getAs[Long]("k_distinct") === vs.distinct.length.toLong)
    // generator contract: single-key JSON, k in 0..99, always parses
    assert(row.getAs[Long]("n_invalid") === 0L)
    assert(vs.min >= 0L && vs.max <= 99L)
  }
}
