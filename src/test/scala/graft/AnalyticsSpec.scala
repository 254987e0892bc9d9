package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Semantic checks for the round-7 analytics surface (q180–q185). The
  * DuckDB differential pins exact values; these pin the INVARIANTS that
  * must hold at any scale factor. */
class AnalyticsSpec extends SparkSpec {

  test("q368 isotonic fit equals an imperative PAV model and is monotone") {
    val rows = Analytics.q368IsotonicCalibration(spark, sf1).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("fit_ppm")))
      .sortBy(_._1)
    // imperative pool-adjacent-violators on the same census
    case class Pool(var n: Long, var p: Long) {
      def mean: Double = p.toDouble / n
    }
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Pool, Int)]
    rows.foreach { case (_, n, p, _) =>
      pools += ((Pool(n, p), 1))
      while (pools.length >= 2 &&
          pools(pools.length - 2)._1.mean >= pools.last._1.mean) {
        val (b, cb) = pools.remove(pools.length - 1)
        val (a, ca) = pools.remove(pools.length - 1)
        pools += ((Pool(a.n + b.n, a.p + b.p), ca + cb))
      }
    }
    val fits = pools.flatMap { case (pool, cnt) =>
      Seq.fill(cnt)(pool.mean)
    }
    assert(fits.length === rows.length)
    rows.zip(fits).foreach { case ((bin, _, _, fp), m) =>
      assert(fp === math.floor(m * 1e6).toLong, s"bin $bin")
    }
    // monotone nondecreasing
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
    // and sum-preserving over each pool: total fitted mass = total pos
    val fitted = rows.zip(fits).map { case ((_, n, _, _), m) => n * m }.sum
    assert(math.abs(fitted - rows.map(_._3).sum) < 1e-6)
  }

  test("q180 correlations are bounded and the matrix covers all 6 pairs") {
    val rows = Analytics.q180CorrMatrix(spark, sf1).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(!c.isNaN && math.abs(c) <= 1.0 + 1e-12,
        s"corr out of [-1,1]: $r")
    }
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.size === 6, "duplicate pair emitted")
  }

  test("q180 corr agrees with Spark's own corr() to float tolerance") {
    val ours = Analytics.q180CorrMatrix(spark, sf1)
      .filter(col("x_col") === "quantity" && col("y_col") === "price")
      .head().getAs[Double]("corr")
    // reference correlation over the same scaled-integer inputs
    val ref = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(col("l_quantity").cast("double").as("q"),
        floor(col("l_extendedprice") * 100).cast("double").as("p"))
      .agg(corr("q", "p")).head().getDouble(0)
    assert(math.abs(ours - ref) < 1e-9, s"ours=$ours ref=$ref")
  }

  test("q181 KMV: estimate falls back to exact below K, and n_exact " +
    "matches a direct distinct count") {
    val rows = Analytics.q181KmvSketch(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("est_distinct")
      if (nd < Analytics.KmvK)
        assert(est === nd, s"below-K group must be exact: $r")
      assert(est > 0)
    }
    // the LCG is a bijection mod the prime, so n_exact = true distinct
    val direct = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_type"),
        expr("user_id * 512 + dayofyear(ts)").as("key"))
      .groupBy("event_type")
      .agg(countDistinct("key").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === direct(r.getString(0)))
    }
  }

  test("q182 counts contiguous vcp runs (hand-checked mini case)") {
    import spark.implicits._
    // build a tiny frame through the same machinery: one user with
    // v c p v c p x, one with gaps only (v x c p is a match at 'cp'? no —
    // pattern needs the full contiguous 'vcp')
    val events = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (1L, "view", 4L), (1L, "click", 5L), (1L, "purchase", 6L),
      (1L, "error", 7L),
      (2L, "view", 1L), (2L, "error", 2L), (2L, "click", 3L),
      (2L, "purchase", 4L))
      .toDF("user_id", "event_type", "k")
    val got = events
      .select(col("user_id"),
        substring(col("event_type"), 1, 1).as("c"), col("k"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("k"), col("c"))).as("lst"))
      .withColumn("sq",
        expr("array_join(transform(array_sort(lst), x -> x.c), '')"))
      .select(col("user_id"),
        expr("CAST((length(sq) - length(replace(sq, 'vcp', ''))) div 3" +
          " AS BIGINT)").as("n_matches"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 2L, "two contiguous vcp runs")
    assert(got(2L) === 0L, "interrupted run must not match")
  }

  test("q183 predictions never overlap the edge set and scores are " +
    "positive") {
    val pred = Analytics.q183LinkPrediction(spark, sf1)
    val rows = pred.collect()
    rows.foreach { r =>
      assert(r.getAs[String]("b1") < r.getAs[String]("b2"),
        s"pair not canonicalized: $r")
      assert(r.getAs[Long]("common") >= 1L)
    }
  }

  test("q184 order keys are unique and interleave sources at equal rank") {
    val rows = Analytics.q184CurriculumOrder(spark, sf1).collect()
    val keys = rows.map(_.getAs[Long]("order_key"))
    assert(keys.toSet.size === keys.length, "order_key must be injective")
    // within one rank level, consecutive keys differ only in source index
    val byRank = rows.groupBy(_.getAs[Long]("rank_in_source"))
    byRank.values.foreach { g =>
      val idx = g.map(_.getAs[Long]("order_key") % Analytics.CurriculumStride)
      assert(idx.toSet.size === idx.length,
        "distinct sources at one rank must get distinct slots")
    }
  }

  test("q185 grid join finds exactly the brute-force pair set") {
    import spark.implicits._
    val got = Analytics.q185GridJoin(spark, sf1)
      .select("id1", "id2", "dist2").as[(Long, Long, Long)]
      .collect().toSet
    val pt = graft.sources.Tables.load(spark, sf1, "part").select(
      col("p_partkey").as("id"),
      floor(col("p_retailprice") * 100).as("x"),
      (col("p_size") * 20).cast("bigint").as("y"))
    val a = pt.select(col("id").as("id1"), col("x").as("x1"),
      col("y").as("y1"))
    val b = pt.select(col("id").as("id2"), col("x").as("x2"),
      col("y").as("y2"))
    val brute = a.crossJoin(b)
      .filter(col("id1") < col("id2"))
      .withColumn("dist2",
        (col("x1") - col("x2")) * (col("x1") - col("x2")) +
          (col("y1") - col("y2")) * (col("y1") - col("y2")))
      .filter(col("dist2") <= Analytics.GridR2)
      .select("id1", "id2", "dist2").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === brute,
      s"grid join must be exact: missing=${brute -- got} " +
        s"extra=${got -- brute}")
  }

  test("q186 labels partition the point set and respect the definitions") {
    val rows = Analytics.q186DbscanLabels(spark, sf1).collect()
    val total = graft.sources.Tables.load(spark, sf1, "part").count()
    assert(rows.length === total, "every point must get a label")
    val byLabel = rows.groupBy(_.getAs[String]("label"))
    byLabel.getOrElse("core", Array()).foreach { r =>
      assert(r.getAs[Long]("n_nbrs") + 1 >= Analytics.DbscanMinPts)
    }
    byLabel.getOrElse("noise", Array()).foreach { r =>
      assert(r.getAs[Long]("n_nbrs") + 1 < Analytics.DbscanMinPts)
    }
    // every border point is non-core with at least one core neighbor
    val core = byLabel.getOrElse("core", Array())
      .map(_.getAs[Long]("id")).toSet
    if (core.nonEmpty) {
      import spark.implicits._
      val pairs = Analytics.gridPairs(spark, sf1)
        .select("id1", "id2").as[(Long, Long)].collect()
      val nbrsOfCore = pairs.flatMap { case (a, b) =>
        (if (core(a)) Seq(b) else Nil) ++ (if (core(b)) Seq(a) else Nil)
      }.toSet
      byLabel.getOrElse("border", Array()).foreach { r =>
        val id = r.getAs[Long]("id")
        assert(!core(id) && nbrsOfCore(id),
          s"border point $id must be a non-core neighbor of a core")
      }
    }
  }

  test("q187 AUC matches the brute-force pairwise win rate") {
    val r = Analytics.q187AucExact(spark, sf1).head()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // brute force at sf0.001: mean over (pos, neg) pairs of
    // win=1, tie=0.5 — the definition the rank-sum shortcut computes
    import spark.implicits._
    val v = graft.sources.Tables.load(spark, sf1, "events")
      .select(floor(col("value") * 100).as("sc"),
        (col("event_type") === "purchase").as("pos"))
    val p = v.filter(col("pos")).select(col("sc").as("ps"))
    val n = v.filter(!col("pos")).select(col("sc").as("ns"))
    val brute = p.crossJoin(n)
      .select(when(col("ps") > col("ns"), 1.0)
        .when(col("ps") === col("ns"), 0.5).otherwise(0.0).as("w"))
      .agg(avg("w")).head().getDouble(0)
    assert(math.abs(auc - brute) < 1e-12, s"census=$auc brute=$brute")
  }

  test("q189 sketch invariants: rho bounded by k, estimates positive, " +
    "exact counts consistent") {
    val r = Analytics.q189KmvSetOps(spark, sf1).head()
    val k = r.getAs[Long]("k")
    assert(k <= Analytics.KmvK.toLong)
    assert(r.getAs[Long]("rho") <= k)
    assert(r.getAs[Long]("union_est") > 0)
    assert(r.getAs[Long]("inter_est") <= r.getAs[Long]("union_est"))
    val (na, nb, ni) = (r.getAs[Long]("n_a_exact"),
      r.getAs[Long]("n_b_exact"), r.getAs[Long]("n_inter_exact"))
    assert(ni <= math.min(na, nb), "intersection bounded by both sets")
  }

  test("q190 F statistic is finite and the decomposition is consistent") {
    val r = Analytics.q190AnovaF(spark, sf1).head()
    assert(r.getAs[Long]("k") === 5L)
    val (msb, msw, f) = (r.getAs[Double]("msb"), r.getAs[Double]("msw"),
      r.getAs[Double]("f_stat"))
    assert(msw > 0 && !f.isNaN && !f.isInfinite)
    assert(math.abs(f - msb / msw) < 1e-12)
  }

  test("q191 pairs are mutual and within the top-K cut") {
    val rows = Analytics.q191ReciprocalNn(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id_1") < r.getAs[Long]("vec_id_2"))
      assert(r.getAs[Long]("r12") <= Analytics.RnnTopK.toLong)
      assert(r.getAs[Long]("r21") <= Analytics.RnnTopK.toLong)
    }
  }

  test("q191 cell ladder: zero planes at every declared-correctness " +
      "size, log-growth above") {
    import spark.implicits._
    val ladder = graft.operators.Dedup
      .srpPlaneLadder(Analytics.RnnCellBase, 0)
    val got = Seq(500L, 2000L, 2001L, 20000L, 200000L, 100000000L)
      .toDF("n_vecs")
      .selectExpr("n_vecs", s"$ladder AS p")
      .as[(Long, Int)].collect().toMap
    // 500 = sf0.01, 2000 = sf0.1 (both correctness corpora) -> 0 planes
    // -> one cell per label -> the original whole-label declaration.
    assert(got(500L) === 0 && got(2000L) === 0)
    assert(got(2001L) === 1, "first doubling starts right past the base")
    assert(got(20000L) === 4, "sf1: 16 cells/label, ~125 vectors each")
    assert(got(200000L) === 7, "sf10: 128 cells/label, ~156 each")
    assert(got(100000000L) === 14, "ladder caps at the 14-plane family")
  }

  test("q192 decayed score never exceeds the undecayed cents sum") {
    import spark.implicits._
    val decayed = Analytics.q192DecayedEngagement(spark, sf1)
      .select("user_id", "decayed_cents").as[(Long, Long)].collect().toMap
    val raw = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100)).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(decayed.keySet === raw.keySet)
    decayed.foreach { case (u, d) =>
      assert(d <= raw(u) && d >= 0, s"user $u: decayed=$d raw=${raw(u)}")
    }
  }

  test("q193 triples obey Apriori monotonicity against the pair census") {
    import spark.implicits._
    val triples = Analytics.q193FrequentTriples(spark, sf1)
      .as[(String, String, String, Long)].collect()
    assert(triples.nonEmpty)
    // pair census over the same baskets
    val pairs = graft.operators.Extensions
      .q177AssocRules(spark, sf1)
      .select("b1", "b2", "n12").as[(String, String, Long)]
      .collect().map { case (a, b, n) => (a, b) -> n }.toMap
    triples.foreach { case (b1, b2, b3, n123) =>
      // q177's pair frame is support-filtered, so only check pairs it kept
      Seq((b1, b2), (b1, b3), (b2, b3)).foreach { p =>
        pairs.get(p).foreach(n12 => assert(n123 <= n12,
          s"triple ($b1,$b2,$b3)=$n123 exceeds pair $p=$n12"))
      }
    }
  }

  test("q194 finds exactly the brute-force distance-1 pair set") {
    import spark.implicits._
    val got = Analytics.q194TypoJoin(spark, sf1)
      .as[(String, String)].collect().toSet
    val w = graft.sources.Tables.load(spark, sf1, "supplier")
      .select(col("s_name").as("w")).distinct()
    val brute = w.select(col("w").as("w1"))
      .crossJoin(w.select(col("w").as("w2")))
      .filter(col("w1") < col("w2") &&
        levenshtein(col("w1"), col("w2")) === 1)
      .as[(String, String)].collect().toSet
    assert(got === brute,
      s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("q195 bins cover the corpus and rates are valid ppm") {
    val rows = Analytics.q195CalibrationBins(spark, sf1).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === graft.sources.Tables.load(spark, sf1, "events").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
      val ppm = r.getAs[Long]("rate_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("q196 shares sum to ~1e6 (floor loss bounded by cell count)") {
    val rows = Analytics.q196SeasonalProfile(spark, sf1).collect()
    val s = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(s <= 1000000L && s > 1000000L - rows.length,
      s"share sum $s with ${rows.length} cells")
    rows.foreach { r =>
      val d = r.getAs[Long]("dow")
      assert(d >= 0 && d <= 6, s"dow out of DuckDB 0-6 convention: $r")
    }
  }

  test("q197 returns a descending top-10 path census") {
    val rows = Analytics.q197SessionPaths(spark, sf1).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing")
    rows.foreach(r => assert(r.getAs[String]("path").nonEmpty))
  }

  test("q198 changepoint lies inside the day range with a valid CUSUM") {
    val r = Analytics.q198Changepoint(spark, sf1).head()
    val days = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("ts").cast("date")).distinct().count()
    val i = r.getAs[Long]("i")
    assert(i >= 1 && i <= days)
    assert(r.getAs[Long]("dev_scaled") >= 0)
  }

  test("q199 jaccard is valid ppm and zero exactly when no wedge closes") {
    val rows = Analytics.q199EdgeJaccard(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Long]("jaccard_ppm")
      val c = r.getAs[Long]("common")
      assert(j >= 0 && j <= 1000000L)
      assert((c == 0) == (j == 0))
    }
  }

  test("q180 plans as one partial-aggregated pass: no hash exchange") {
    val plan = Analytics.q180CorrMatrix(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the sufficient-statistics pass must not shuffle rows:\n$plan")
    assert(plan.contains("Exchange SinglePartition"),
      "expected exactly the 1-row partial-aggregate collect")
  }

  test("q197 rides ONE user-keyed exchange for sessions + strings") {
    val plan = Analytics.q197SessionPaths(spark, sf1)
      .queryExecution.executedPlan.toString
    val userEx = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(userEx === 1,
      s"session windows and the per-session string build must share " +
        s"one user-keyed exchange, found $userEx:\n$plan")
  }

  test("q200 curve is a monotone CDF bounded by the cohort") {
    val rows = Analytics.q200ConversionCurve(spark, sf1).collect()
      .sortBy(_.getAs[Long]("gap_d"))
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b },
      "cumulative counts must strictly increase")
    assert(cums.last === rows.map(_.getAs[Long]("n")).sum)
    rows.foreach(r =>
      assert(r.getAs[Long]("converted_ppm") <= 1000000L))
  }

  test("q201 deciles are balanced and cumulative shares end at ~1e6") {
    val rows = Analytics.q201LorenzCurve(spark, sf1).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length === 10)
    val members = rows.map(_.getAs[Long]("n_members"))
    assert(members.max - members.min <= 1,
      s"equal-count deciles expected: ${members.toSeq}")
    val shares = rows.map(_.getAs[Long]("cum_share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last === 1000000L ||
      shares.last === 999999L, // one floor unit at most
      s"final cumulative share ${shares.last}")
  }

  test("q202 overlap is symmetric-canonical valid ppm and self-overlap " +
    "would be 1e6") {
    val rows = Analytics.q202HistIntersection(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
      val p = r.getAs[Long]("overlap_ppm")
      assert(p >= 0 && p <= 1000000L)
    }
  }

  test("q203 smoothing shrinks toward the global mean") {
    val rows = Analytics.q203TargetEncoding(spark, sf1).collect()
    assert(rows.nonEmpty)
    // global mean from the released integers
    val gm = rows.map(r => r.getAs[Long]("raw_mean_cents") *
      r.getAs[Long]("n")).sum / rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_mean_cents")
      val sm = r.getAs[Long]("smoothed_mean_cents")
      // smoothed value lies between raw mean and the prior (±1 floor)
      assert(sm >= math.min(raw, gm) - 1 && sm <= math.max(raw, gm) + 1,
        s"smoothed $sm outside [$raw, $gm] for $r")
    }
  }

  test("q204 negatives never collide with positives and respect K") {
    import spark.implicits._
    val neg = Analytics.q204NegativeSampling(spark, sf1)
      .as[(Long, Long, String)].collect()
    assert(neg.nonEmpty)
    assert(neg.forall(_._2 <= Analytics.NegK.toLong))
    val pos = graft.sources.Tables.load(spark, sf1, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("u"))
      .join(graft.sources.Tables.load(spark, sf1, "lineitem")
        .select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .join(graft.sources.Tables.load(spark, sf1, "part")
        .select(col("p_partkey"), col("p_brand").as("b")),
        col("l_partkey") === col("p_partkey"))
      .select("u", "b").distinct()
      .as[(Long, String)].collect().toSet
    neg.foreach { case (u, _, b) =>
      assert(!pos((u, b)), s"negative ($u,$b) is actually a positive")
    }
  }

  test("q205 modularity terms are internally consistent") {
    val rows = Analytics.q205Modularity(spark, sf1).collect()
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    // sum of internal edges <= m; sum of volumes == 2m
    assert(rows.map(_.getAs[Long]("lc")).sum <= m)
    assert(rows.map(_.getAs[Long]("dc")).sum === 2 * m)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_term_scaled") ===
        4 * m * r.getAs[Long]("lc") -
          r.getAs[Long]("dc") * r.getAs[Long]("dc"))
    }
  }

  test("q206 conductance is valid ppm and cut edges are double-counted " +
    "consistently") {
    val rows = Analytics.q206Conductance(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("conductance_ppm")
      assert(p >= 0 && p <= 1000000L)
      assert(r.getAs[Long]("cut") <= r.getAs[Long]("dc"),
        "a community's cut cannot exceed its volume")
    }
    // every crossing edge contributes to exactly two communities
    assert(rows.map(_.getAs[Long]("cut")).sum % 2 === 0)
  }

  test("q207 assortativity is a valid correlation") {
    val r = Analytics.q207Assortativity(spark, sf1).head()
    val v = r.getAs[Double]("r")
    assert(!v.isNaN && math.abs(v) <= 1.0 + 1e-12)
    assert(r.getAs[Long]("n") % 2 === 0, "symmetrized edge list is even")
  }

  test("q208 arm counts partition the user set and chi2 recomputes") {
    val r = Analytics.q208SrmCheck(spark, sf1).head()
    val (n0, n1, t) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"),
      r.getAs[Long]("t"))
    assert(n0 + n1 === t)
    assert(t === graft.sources.Tables.load(spark, sf1, "events")
      .select("user_id").distinct().count())
    val chi2 = (2.0 * n0 - t) * (2.0 * n0 - t) / t
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-12)
  }

  test("q209 stickiness is bounded by 1e6 and DAU never exceeds MAU") {
    val rows = Analytics.q209Stickiness(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("stickiness_ppm")
      assert(p >= 0 && p <= 1000000L)
      assert(r.getAs[Long]("sdau") <=
        r.getAs[Long]("n_days") * r.getAs[Long]("mau"),
        "daily actives cannot exceed days x monthly actives")
    }
  }

  test("q210 stump beats the trivial edge cuts and partitions the corpus") {
    val r = Analytics.q210DecisionStump(spark, sf1).head()
    val total = graft.sources.Tables.load(spark, sf1, "events").count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") === total)
    assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    assert(r.getAs[Long]("purity_ppm") > 0)
  }

  test("q211 WAU is at least any single day's DAU and at most the " +
    "user count") {
    import spark.implicits._
    val wau = Analytics.q211RollingWau(spark, sf1)
      .select(col("day").cast("string"), col("wau"))
      .as[(String, Long)].collect().toMap
    assert(wau.nonEmpty)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
    val users = ev.select("user_id").distinct().count()
    val dau = ev.select(col("ts").cast("date").cast("string").as("d"),
        col("user_id")).distinct()
      .groupBy("d").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    dau.foreach { case (d, n) =>
      assert(wau(d) >= n, s"WAU($d)=${wau(d)} below DAU $n")
    }
    wau.values.foreach(w => assert(w <= users))
  }

  test("q212 collapse conserves the corpus and OTHER absorbs the rest") {
    val rows = Analytics.q212RareCollapse(spark, sf1).collect()
    val total = graft.sources.Tables.load(spark, sf1, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    val kept = rows.filter(_.getAs[String]("cat") != "__OTHER__")
    kept.foreach(r => assert(r.getAs[Long]("n_merged") === 1L))
    val nLangs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("lang").distinct().count()
    assert(rows.map(_.getAs[Long]("n_merged")).sum === nLangs)
  }

  test("q185 candidate generation is cell-bounded (no cartesian in plan)") {
    val plan = Analytics.q185GridJoin(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"spatial join must ride the grid equi-join:\n$plan")
  }

  test("q230 blocking metrics are internally consistent and the " +
    "completeness hole is exactly the 2nd-to-last-char pairs") {
    val r = Analytics.q230BlockingEval(spark, sf1).collect().head
    val (nNames, nAll, nCand, nTruth, nCap) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(nAll === nNames * (nNames - 1) / 2)
    assert(nCand <= nAll && nCap <= nTruth && nCap <= nCand)
    assert(r.getLong(5) === 1000000L - nCand * 1000000L / nAll)
    assert(r.getLong(6) === nCap * 1000000L / math.max(nTruth, 1L))
    // recompute the scheme's structural hole: an ED-1 pair escapes both
    // blocks iff the edit is a substitution at position len-1 (neither
    // the last char nor inside the shared prefix of scheme B)
    val names = graft.sources.Tables.load(spark, sf1, "supplier")
      .select("s_name").distinct().collect().map(_.getString(0))
    val truth = for {
      a <- names; b <- names if a < b
      if a.length == b.length &&
        a.zip(b).count { case (x, y) => x != y } == 1
    } yield (a, b)
    // all same-format names: ED-1 here is exactly one substitution
    assert(truth.length.toLong === nTruth,
      "recomputed ED-1 truth count mismatch")
    val missed = truth.count { case (a, b) =>
      val i = a.zip(b).indexWhere { case (x, y) => x != y }
      i == a.length - 2 // 2nd-to-last position: no block catches it
    }
    assert(nCap === nTruth - missed,
      s"captured must be truth minus the declared hole ($missed pairs)")
  }

  test("q240 bootstrap interval is ordered, brackets the point mean, " +
    "and replica b=0 matches a hand-rolled Poisson resample") {
    val rows = Analytics.q240BootstrapCi(spark, sf1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .selectExpr("event_type", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS vc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((tpe, (n, mean, lo, hi)) <- rows) {
      assert(lo <= hi, s"$tpe interval inverted")
      assert(lo <= mean && mean <= hi,
        s"$tpe point mean $mean outside [$lo, $hi]")
      val mine = ev.filter(_._1 == tpe)
      assert(n === mine.length.toLong)
      assert(BigInt(mean) ===
        BigInt(mine.map(_._3).sum) * 1000000 / n)
      // all 32 replica means recomputed from the declared LCG +
      // Poisson table: the released interval must be exactly the 2nd
      // smallest / 2nd largest
      val means = (0 until Analytics.BootB).map { b =>
        var sm = BigInt(0); var sw = 0L
        for ((_, id, vc) <- mine) {
          val u = ((id * 64 + b) * 1103515245L + 12345L) %
            2147483647L % 1000000L
          val m =
            if (u < Analytics.BootP0) 0L
            else if (u < Analytics.BootP1) 1L
            else if (u < Analytics.BootP2) 2L
            else if (u < Analytics.BootP3) 3L else 4L
          sm += BigInt(m * vc); sw += m
        }
        // Poisson(1) mass conservation: replica weight ~ n
        assert(sw > n / 2 && sw < n * 2, s"$tpe b=$b weight $sw vs $n")
        sm * 1000000 / math.max(sw, 1L)
      }.sorted
      assert(BigInt(lo) === means(1), s"$tpe ci_lo")
      assert(BigInt(hi) === means(Analytics.BootB - 2), s"$tpe ci_hi")
    }
  }

  test("q242 Wilson bound never exceeds the raw rate, shrinks small " +
    "samples hardest, and ranks dense") {
    val rows = Analytics.q242WilsonRank(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._5).sorted.toSeq === (1L to rows.length))
    for ((band, n, k, w, _) <- rows) {
      assert(k <= n)
      val raw = k * 1000000L / n
      assert(w <= raw, s"band $band: bound $w above raw rate $raw")
      assert(w >= 0L || k == 0L, s"band $band negative bound with k>0")
    }
    // shrinkage property: for equal raw rates, the smaller sample gets
    // the lower bound — check via the formula on two synthetic pairs
    def wilson(k: Double, n: Double): Double = {
      val z2 = 3.8416
      (k / n + z2 / (2 * n) - 1.96 * math.sqrt(
        (k / n * (1 - k / n) + z2 / (4 * n)) / n)) / (1 + z2 / n)
    }
    assert(wilson(2, 2) < wilson(90, 100),
      "2/2 must not outrank 90/100 — the whole point of the bound")
  }

  test("q247 chi2 cells span the full cross domain, margins telescope, " +
    "and a cell's contribution replays the cross-multiplied formula") {
    val rows = Analytics.q247Chi2Independence(spark, sf1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val sources = rows.map(_._1).distinct
    val langs = rows.map(_._2).distinct
    assert(rows.length === sources.length * langs.length,
      "one row per (source, lang) cell — zero-observed cells included")
    val n = rows.head._6
    assert(rows.map(_._3).sum === n, "cell counts must partition corpus")
    for ((src, grp) <- rows.groupBy(_._1)) {
      assert(grp.map(_._3).sum === grp.head._4,
        s"row margin broken for $src")
      assert(grp.map(_._4).distinct.length === 1)
    }
    for ((_, _, o, r, c, nn, chi) <- rows) {
      assert(chi >= 0L)
      val dev = BigInt(nn) * o - BigInt(r) * c
      assert(chi === (dev * dev * 1000000 / (BigInt(nn) * r * c)).toLong,
        "contribution must replay the exact integer formula")
    }
  }

  test("q248 always emits all nine digits, shares telescope to ~1e6, " +
    "and the expectation literals are the Benford constants") {
    val rows = Analytics.q248Benford(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 9L))
    val n = rows.head._3
    assert(rows.map(_._2).sum === n, "digit counts must partition orders")
    val shareSum = rows.map(_._4).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 9,
      s"shares sum to $shareSum")
    assert(rows.map(_._5).toSeq ===
      Analytics.BenfordPpm.toSeq, "expectation column != shared literals")
    assert(math.abs(Analytics.BenfordPpm.sum - 1000000L) < 9)
    for ((_, o, nn, share, b, dev, chi) <- rows) {
      assert(dev === math.abs(share - b))
      assert(chi >= 0L)
      val num = BigInt(o) * 1000000 - BigInt(nn) * b
      assert(chi === (num * num / (BigInt(nn) * b)).toLong)
    }
  }

  test("q249 silhouette cells partition the corpus, values stay in " +
    "[0, 1e6], and the mean is bracketed by min/max") {
    val rows = graft.operators.Similarity.q249Silhouette(spark, sf1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    val nVecs = graft.sources.Tables.load(spark, sf1, "embeddings").count()
    assert(rows.map(_._2).sum === nVecs,
      "every (non-zero-norm) vector lands in exactly one cell")
    for ((cell, n, mean, mn, mx) <- rows) {
      assert(n > 0)
      assert(mn >= 0L && mx <= 1000000L, s"cell $cell out of range")
      assert(mn <= mean && mean <= mx, s"cell $cell mean not bracketed")
    }
    // centroid vectors score a perfect 1.0 against their own cell, so
    // any cell containing its centroid tops out at exactly 1e6
    assert(rows.exists(_._5 === 1000000L),
      "no cell reached the centroid's own perfect silhouette")
  }

  test("q252 level/trend replay the exact halving recurrence over the " +
    "per-nation weekly census, and the forecast is their sum") {
    val out = Analytics.q252HoltSmoothing(spark, sf1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    val census = graft.sources.Tables.load(spark, sf1, "orders")
      .join(graft.sources.Tables.load(spark, sf1, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("n"),
        date_trunc("week", col("o_orderdate")).as("w"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet === census.keySet)
    for ((nat, rows) <- census) {
      val xs = rows.sortBy(_._2.getTime).map(_._3)
      var l = xs.head
      var b = 0L
      for (x <- xs.tail) {
        val l2 = (x + l + b) / 2
        b = (l2 - l + b) / 2
        l = l2
      }
      val (nWeeks, level, trend, fc) = out(nat)
      assert(nWeeks === xs.length)
      assert(level === l, s"nation $nat level diverged")
      assert(trend === b, s"nation $nat trend diverged")
      assert(fc === l + b)
    }
    // the signed-division edge must actually occur for the
    // differential to mean anything
    assert(out.values.exists(_._3 < 0),
      "no nation with a negative trend — recurrence edge unexercised")
  }

  test("q255 every row's LOO feature excludes its own target: formula " +
    "replays, and raising own y lowers own encoding within a segment") {
    val rows = Analytics.q255LooEncoding(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val bySeg = rows.groupBy(_._2)
    val prior = rows.map(_._3).sum / rows.length
    for ((seg, grp) <- bySeg) {
      val (nSeg, sumSeg) = (grp.length.toLong, grp.map(_._3).sum)
      for ((_, _, cents, loo) <- grp.take(50))
        assert(loo === (sumSeg - cents + Analytics.LooM * prior) /
          (nSeg - 1 + Analytics.LooM), s"segment $seg formula diverged")
      // anti-monotone in own target: the leakage-safety signature
      val sorted = grp.sortBy(_._3)
      assert(sorted.head._4 >= sorted.last._4,
        s"segment $seg: cheapest order must get the highest encoding")
    }
  }

  test("q256 pair count is n(n-1)/2 and the median slope replays an " +
    "independent all-pairs computation per nation") {
    val rows = Analytics.q256TheilSen(spark, sf1).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val census = graft.sources.Tables.load(spark, sf1, "orders")
      .join(graft.sources.Tables.load(spark, sf1, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("n"),
        date_trunc("week", col("o_orderdate")).as("w"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("c"))
      .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    for ((nat, nw, np, slope) <- rows) {
      assert(np === nw * (nw - 1) / 2)
      val xs = census(nat).sortBy(_._2.getTime).map(_._3)
      assert(nw === xs.length)
      val slopes = (for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield (xs(j) - xs(i)) * 1000000L / (j - i)).sorted
      assert(slope === slopes(((slopes.length + 1) / 2 - 1).toInt),
        s"nation $nat median slope diverged from brute-force replay")
    }
  }

  test("q258 emits all segments plus the pooled row, arms partition " +
    "the orders, and signs/reversal flags are mutually consistent") {
    val rows = Analytics.q258SimpsonAudit(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getBoolean(8)))
    val byName = rows.map(r => r._1 -> r).toMap
    assert(byName.contains("ALL"))
    val segs = rows.filter(_._1 != "ALL")
    assert(segs.length === 5)
    val all = byName("ALL")
    assert(segs.map(_._2).sum === all._2, "treated arms must sum")
    assert(segs.map(_._4).sum === all._4, "control arms must sum")
    val nOrders = graft.sources.Tables.load(spark, sf1, "orders").count()
    assert(all._2 + all._4 === nOrders)
    for ((seg, nt, kt, nc, kc, trp, crp, sign, rev) <- rows) {
      assert(kt <= nt && kc <= nc)
      assert(trp === kt * 1000000L / nt)
      assert(crp === kc * 1000000L / nc)
      assert(sign === math.signum(kt * nc - kc * nt))
      assert(rev === (sign * all._8 === -1L),
        s"$seg reversal flag inconsistent with signs")
    }
  }

  test("q259 theta/rho2 replay the sufficient-statistics formulas in " +
    "BigInt and the adjustment preserves each arm's identity") {
    val rows = Analytics.q259Cuped(spark, sf1).collect()
      .map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.keySet === Set(true, false))
    // independent per-user pre/post replay
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val per = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("ts"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (u, es) =>
        (u, es.filter(_._2.before(split)).map(_._3).sum,
          es.filterNot(_._2.before(split)).map(_._3).sum)
      }.toSeq
    val n = BigInt(per.length)
    val sx = per.map(e => BigInt(e._2)).sum
    val sy = per.map(e => BigInt(e._3)).sum
    val sxx = per.map(e => BigInt(e._2) * e._2).sum
    val sxy = per.map(e => BigInt(e._2) * e._3).sum
    val syy = per.map(e => BigInt(e._3) * e._3).sum
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val theta = (cov * 1000000 / varx).toLong
    val rho2 = ((cov * 1000 / varx) * (cov * 1000 / vary)).toLong
    val xbar = (sx * 1000000 / n).toLong
    assert(rho2 >= 0L && rho2 <= 1000000L, s"rho2 $rho2 not a share")
    for ((arm, (nu, meanPost, meanAdj, thetaOut, rho2Out)) <- rows) {
      assert(thetaOut === theta)
      assert(rho2Out === rho2)
      val grp = per.filter(e => (e._1 % 2 == 1) == arm)
      assert(nu === grp.length.toLong)
      val sxa = grp.map(e => BigInt(e._2)).sum
      val sya = grp.map(e => BigInt(e._3)).sum
      assert(meanPost === (sya * 1000000 / nu).toLong)
      assert(meanAdj === (sya * 1000000 / nu -
        BigInt(theta) * (sxa * 1000000 / nu - xbar) / 1000000).toLong)
    }
    assert(rows(true)._1 + rows(false)._1 === per.length.toLong)
  }

  test("q264 banded Kendall counts replay an O(n^2) brute force over " +
    "the banded scores at sf0.001") {
    val r = Analytics.q264KendallTau(spark, sf1).collect().head
    val (n, p, c, d, tx, ty, tau) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6))
    val bands = graft.sources.Tables.load(spark, sf1, "documents")
      .select(expr("least(n_chars div 128, 31)"),
        expr("""(size(array_distinct(split(text, ' '))) * 100
             div size(split(text, ' '))) div 4"""))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(n === bands.length.toLong)
    assert(p === n * (n - 1) / 2)
    var (bc, bd, btx, bty) = (0L, 0L, 0L, 0L)
    for (i <- bands.indices; j <- (i + 1) until bands.length) {
      val ((x1, y1), (x2, y2)) = (bands(i), bands(j))
      val sx = java.lang.Long.signum(x1 - x2)
      val sy = java.lang.Long.signum(y1 - y2)
      if (sx == 0) btx += 1
      if (sy == 0) bty += 1
      if (sx * sy > 0) bc += 1
      if (sx * sy < 0) bd += 1
    }
    assert(c === bc, "concordant prefix-sum algebra diverged")
    assert(d === bd, "discordant prefix-sum algebra diverged")
    assert(tx === btx && ty === bty, "tie marginals diverged")
    val expTau = math.floor((bc - bd) * 1000000.0 /
      math.sqrt((p - btx).toDouble * (p - bty).toDouble)).toLong
    assert(tau === expTau)
    assert(tau >= -1000000L && tau <= 1000000L)
  }

  test("q265 seasonal medians, residuals, MAD and flags replay an " +
    "independent decomposition over the monthly census") {
    val rows = Analytics.q265SeasonalResidual(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val monthly = rows.map(r => ((r._1, r._2), r._3)).toMap
    // seasonal = lower median per calendar month, ties by (rev, yr)
    val seasonal = rows.groupBy(_._2).map { case (mo, grp) =>
      val sorted = grp.map(g => (g._3, g._1)).sorted
      mo -> sorted((sorted.length + 1) / 2 - 1)._1
    }
    val resid = rows.map(r => ((r._1, r._2), r._3 - seasonal(r._2)))
      .toMap
    val absSorted = rows
      .map(r => (math.abs(resid((r._1, r._2))), r._1, r._2)).sorted
    val mad = absSorted((absSorted.length + 1) / 2 - 1)._1
    for ((yr, mo, rev, sea, rs, flag) <- rows) {
      assert(rev === monthly((yr, mo)))
      assert(sea === seasonal(mo), s"($yr,$mo) seasonal diverged")
      assert(rs === resid((yr, mo)))
      assert(flag === (math.abs(rs) > 3 * mad), s"($yr,$mo) flag")
    }
  }

  test("q266 Welch t replays the sufficient-statistics expression and " +
    "agrees in sign with the mean difference") {
    val r = Analytics.q266WelchT(spark, sf1).collect().head
    val (n1, n2, m1, m2, t) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val vals = graft.sources.Tables.load(spark, sf1, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = vals.filter(_._1 == "purchase").map(_._2)
    val b = vals.filter(_._1 == "click").map(_._2)
    assert(n1 === a.length.toLong && n2 === b.length.toLong)
    assert(m1 === a.sum * 1000000L / n1)
    assert(m2 === b.sum * 1000000L / n2)
    def varOf(xs: Array[Long]): Double = {
      val n = xs.length.toDouble
      val s = xs.sum.toDouble
      val q = xs.map(x => x.toDouble * x).sum
      (n * q - s * s) / (n * n * (n - 1.0))
    }
    val expT = (a.sum.toDouble / n1 - b.sum.toDouble / n2) /
      math.sqrt(varOf(a) + varOf(b))
    assert(math.abs(t - math.floor(expT * 1e6).toLong) <= 1L,
      s"t_ppm $t vs scala replay ${math.floor(expT * 1e6).toLong}")
    assert(math.signum(t.toDouble) ===
      math.signum((m1 - m2).toDouble) || t == 0L)
  }

  test("q268 variance and MDE replay the design formulas per event " +
    "type, and MDE shrinks as sqrt(n) grows") {
    val rows = Analytics.q268MdePower(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length === 5)
    val vals = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1)
    for ((tpe, n, mean, varC, mde) <- rows) {
      val xs = vals(tpe).map(_._2)
      assert(n === xs.length.toLong)
      assert(mean === xs.sum * 1000000L / n)
      val sv = BigInt(xs.sum)
      val qv = xs.map(x => BigInt(x) * x).sum
      assert(varC === ((BigInt(n) * qv - sv * sv) /
        (BigInt(n) * (n - 1))).toLong)
      val varD = (n.toDouble * qv.toDouble - sv.toDouble * sv.toDouble) /
        (n.toDouble * (n - 1.0))
      val exp = math.floor(2.801585 *
        math.sqrt(2.0 * varD / (n / 2)) * 1e6).toLong
      assert(math.abs(mde - exp) <= 1L, s"$tpe MDE diverged")
      assert(mde > 0L)
    }
  }

  test("q277 the tail holds ~5% of each type's mass and the shortfall " +
    "replays a collected tail mean above the VaR") {
    val rows = Analytics.q277ExpectedShortfall(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length === 5)
    val vals = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1)
    for ((tpe, n, varC, nTail, es) <- rows) {
      val xs = vals(tpe).map(_._2).sorted
      assert(n === xs.length.toLong)
      // VaR replay: smallest value whose cum count reaches 95%
      val varExp = xs.zipWithIndex
        .find { case (_, i) => (i + 1) * 100L >= xs.length * 95L }
        .get._1
      assert(varC === varExp, s"$tpe VaR diverged")
      val tail = xs.filter(_ >= varC)
      assert(nTail === tail.length.toLong)
      assert(es === tail.map(BigInt(_)).sum * 1000000 / tail.length,
        s"$tpe shortfall diverged")
      assert(es >= varC * 1000000L, "tail mean cannot sit below VaR")
      // the >= VaR tail can exceed 5% only through ties at the VaR
      assert(nTail * 100 >= n * 5, s"$tpe tail too small")
    }
  }

  test("q279 precision/recall staircase: recall is monotone along " +
    "descending thresholds and the endpoints are exact") {
    val rows = Analytics.q279PrCurve(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(-_._1)
    assert(rows.nonEmpty)
    val rec = rows.map(_._5)
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      "recall must grow as the threshold drops")
    assert(rec.last === 1000000L,
      "the lowest threshold must recall every positive")
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(expr("CAST(floor(value) AS BIGINT)").as("b"),
        (col("event_type") === "purchase").as("pos")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val posTotal = ev.count(_._2).toLong
    for ((t, tp, fp, prec, r2) <- rows.take(20)) {
      val above = ev.filter(_._1 >= t)
      assert(tp === above.count(_._2).toLong, s"t=$t tp")
      assert(fp === above.count(!_._2).toLong, s"t=$t fp")
      assert(prec === tp * 1000000L / (tp + fp))
      assert(r2 === tp * 1000000L / posTotal)
    }
  }

  test("q281 interval is ordered, the point difference replays the " +
    "exact arm means, and replica diffs drive the bounds") {
    val r = Analytics.q281BootstrapDiff(spark, sf1).collect().head
    val (point, nRep, lo, hi) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    assert(nRep === Analytics.BootB.toLong)
    assert(lo <= hi, "interval bounds out of order")
    val vals = graft.sources.Tables.load(spark, sf1, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val p = vals.filter(_._1 == "purchase").map(_._2)
    val c = vals.filter(_._1 == "click").map(_._2)
    val exp = p.map(BigInt(_)).sum * 1000000 / p.length -
      c.map(BigInt(_)).sum * 1000000 / c.length
    assert(point === exp.toLong, "point difference diverged")
    // the interval should be a real spread, not collapsed to a point
    assert(hi > lo, "32 resamples collapsed to one value")
  }

  test("q286 deciles are balanced to within one user and the recency " +
    "anchor replays from the raw events") {
    val rows = Analytics.q286RfmFeatures(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    for (dcol <- Seq(rows.map(_._5), rows.map(_._6), rows.map(_._7))) {
      assert(dcol.forall(d => d >= 1 && d <= 10))
      val sizes = dcol.groupBy(identity).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, "decile imbalance beyond 1")
    }
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    val anchor = ev.values.flatten.map(_._2).max
    for ((uid, rec, freq, mon, _, _, _) <- rows.take(30)) {
      val es = ev(uid)
      assert(freq === es.size.toLong)
      assert(mon === es.map(_._3).sum)
      assert(rec === java.time.temporal.ChronoUnit.DAYS.between(
        es.map(_._2).max, anchor))
    }
    // decile replay: rank every user by (recency, user_id) and check
    // the released r_decile is exactly the rank-derived decile
    val nu = rows.length.toLong
    val ranked = rows.sortBy(r => (r._2, r._1)).zipWithIndex
    for (((r, i)) <- ranked.take(50))
      assert(r._5 === i.toLong * 10 / nu + 1,
        s"user ${r._1} r_decile diverged from rank replay")
  }

  test("q287 exactly one threshold is chosen, it maximizes the exact " +
    "F1 algebra, and the confusion counts telescope") {
    val rows = Analytics.q287F1Optimizer(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.count(_._6) === 1, "exactly one chosen threshold")
    val best = rows.find(_._6).get
    val posTotal = rows.head._2 + rows.head._4
    for ((band, tp, fp, fn, f1, _) <- rows) {
      assert(f1 === 2 * tp * 1000000L / (2 * tp + fp + fn),
        s"band $band F1 algebra")
      assert(tp + fn === posTotal,
        "tp + fn must be the constant positive total")
      assert(f1 <= best._5,
        s"band $band beats the chosen threshold")
    }
    assert(rows.filter(_._5 == best._5).map(_._1).min === best._1,
      "F1 ties must break toward the smaller band")
  }

  test("q297 drawdowns replay a sequential walk over the demeaned " +
    "weekly series per nation") {
    val rows = Analytics.q297MaxDrawdown(spark, sf1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val census = graft.sources.Tables.load(spark, sf1, "orders")
      .join(graft.sources.Tables.load(spark, sf1, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("n"),
        date_trunc("week", col("o_orderdate")).as("w"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1)
    assert(rows.keySet === census.keySet)
    for ((nat, es) <- census) {
      val xs = es.sortBy(_._2).map(_._3)
      val mu = xs.sum / xs.length
      var (cum, runmax, bestDd, bestWeek) = (0L, Long.MinValue, -1L, 0L)
      for ((x, i) <- xs.zipWithIndex) {
        cum += x - mu
        if (cum > runmax) runmax = cum
        val dd = runmax - cum
        if (dd > bestDd) { bestDd = dd; bestWeek = i + 1L }
      }
      val (nw, mdd, tw) = rows(nat)
      assert(nw === xs.length.toLong)
      assert(mdd === bestDd, s"nation $nat drawdown diverged")
      assert(tw === bestWeek, s"nation $nat trough week diverged")
      assert(mdd >= 0L)
    }
  }

  test("q298 weekday profile covers all seven days, shares telescope, " +
    "and the dow convention matches the q296 spine") {
    val rows = Analytics.q298WeekdayRevenue(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L to 6L))
    val nOrders = graft.sources.Tables.load(spark, sf1, "orders")
      .count()
    assert(rows.map(_._2).sum === nOrders)
    val oShare = rows.map(_._4).sum
    assert(oShare <= 1000000L && oShare > 1000000L - 7)
    val rShare = rows.map(_._5).sum
    assert(rShare <= 1000000L && rShare > 1000000L - 7)
    // dow convention: join a known date through the q296 spine
    val spine = graft.operators.Core.q296DateDim(spark, sf1)
      .select("day", "dow").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val sunday = spine.find(_._2 == 0L).get._1
    assert(sunday.getDayOfWeek === java.time.DayOfWeek.SUNDAY,
      "dow 0 must be Sunday — the q196/q296 normalized convention")
  }

  test("q299 the pricing profile replays a collected census and the " +
    "volume-discount direction is measured, not assumed") {
    val rows = Analytics.q299QuantityDiscount(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(expr("CAST(floor(l_quantity) AS BIGINT)"),
        expr("CAST(floor(l_discount * 10000) AS BIGINT)"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.map(_._2).sum === li.values.map(_.length.toLong).sum)
    for ((qty, n, disc, price) <- rows.take(15)) {
      val xs = li(qty)
      assert(n === xs.length.toLong)
      assert(disc === xs.map(x => BigInt(x._2)).sum.toLong * 100 / n)
      assert(price === (xs.map(x => BigInt(x._3)).sum / n).toLong)
    }
    // no directional claim: this generator draws extendedprice
    // independently of quantity (checked) — the profile's VALUES are
    // what the differential pins, and the flat surface is itself the
    // finding the operator exists to surface
    assert(rows.forall(r => r._3 >= 0L && r._4 > 0L))
  }

  test("q382 Brier/ECE collapse identities hold against a row-level " +
    "replay") {
    val row = Analytics.q382BrierEce(spark, sf1).head()
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(expr("CAST(floor(value / 10) AS BIGINT)").as("bin"),
        expr(s"least(999999, CAST(floor(value * 100) AS BIGINT) * " +
          s"${Analytics.BrierScaler})").as("p"),
        (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = ev.length.toLong
    assert(row.getAs[Long]("n") === n)
    val brier = ev.map { case (_, p, y) =>
      val d = BigInt(p - (if (y) 1000000L else 0L)); d * d }.sum
    assert(row.getAs[Long]("brier_mean_ppm2") === (brier / n).toLong)
    // ECE collapse: sum over bins of |sum p - 1e6 * n_pos|
    val ece = ev.groupBy(_._1).values.map { g =>
      (BigInt(g.map(_._2).sum) -
        BigInt(1000000L) * g.count(_._3)).abs }.sum
    assert(row.getAs[Long]("ece_num") === ece.toLong)
    assert(row.getAs[Long]("ece_ppm") === (ece / n).toLong)
  }

  test("q384 EMD replays a brute-force transport model and dominates " +
    "the mean-shift lower bound") {
    val rows = Analytics.q384HistEmd(spark, sf1).collect()
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select(col("source"), expr("n_chars div 64").as("bin"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sources = bySrc.keys.toSeq.sorted
    assert(rows.length === sources.combinations(2).length)
    val allBins = docs.map(_._2).distinct.sorted
    rows.foreach { r =>
      val (s1n, s2n) = (r.getString(0), r.getString(1))
      val (g1, g2) = (bySrc(s1n), bySrc(s2n))
      val (t1, t2) = (g1.length.toLong, g2.length.toLong)
      assert(r.getAs[Long]("t1") === t1 && r.getAs[Long]("t2") === t2)
      // brute-force: integrate |F1*t2 - F2*t1| over the union grid
      var f1 = 0L; var f2 = 0L; var num = BigInt(0)
      allBins.zip(allBins.tail).foreach { case (b, nxt) =>
        f1 += g1.count(_ == b); f2 += g2.count(_ == b)
        num += (BigInt(f1) * t2 - BigInt(f2) * t1).abs * (nxt - b)
      }
      assert(r.getAs[Long]("emd_num") === num.toLong)
      // Wasserstein-1 >= |mean difference| (equality iff no crossing)
      val meanDiffNum = (BigInt(g1.sum) * t2 - BigInt(g2.sum) * t1).abs
      assert(num >= meanDiffNum,
        s"EMD below the mean-shift bound for ($s1n,$s2n)")
    }
  }

  test("q386 SPRT trajectory replays the Wald walk over the exact " +
    "day census with consistent verdicts") {
    val rows = Analytics.q386SprtMonitor(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("ts").cast("date").cast("string").as("day"),
        (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val byDay = ev.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.count(_._2).toLong)).toMap
    val l1 = math.log(0.21 / 0.19); val l0 = math.log(0.79 / 0.81)
    val hi = math.log(19.0)
    var n = 0L; var k = 0L
    assert(rows.length === byDay.size)
    rows.foreach { case (day, gn, gk, llrMicro, verdict) =>
      val (dn, dk) = byDay(day)
      n += dn; k += dk
      assert(gn === n && gk === k, s"$day cumulative counts")
      val llr = k.toDouble * l1 + (n - k).toDouble * l0
      assert(llrMicro === math.floor(llr * 1e6).toLong, s"$day llr")
      val expect = if (llr >= hi) "accept_h1"
        else if (llr <= -hi) "accept_h0" else "continue"
      assert(verdict === expect, s"$day verdict")
    }
  }

  test("q387 MCC threshold sweep replays the confusion matrix, bounds " +
    "the metric, and flags a unique argmax") {
    val rows = Analytics.q387MccThreshold(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select(expr("CAST(floor(value) AS BIGINT)").as("band"),
        (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val totP = ev.count(_._2).toLong; val totN = ev.size - totP
    rows.foreach { case (band, tp, fp, fn, tn, num, ppm, _) =>
      assert(tp === ev.count(e => e._1 >= band && e._2).toLong)
      assert(fp === ev.count(e => e._1 >= band && !e._2).toLong)
      assert(fn === totP - tp && tn === totN - fp)
      assert(num === tp * tn - fp * fn)
      assert(ppm >= -1000000L && ppm <= 1000000L, s"band $band MCC range")
    }
    assert(rows.count(_._8) === 1, "exactly one chosen band")
    val chosen = rows.find(_._8).get
    assert(rows.forall(r => r._7 < chosen._7 ||
      (r._7 == chosen._7 && r._1 >= chosen._1)), "argmax w/ tie-break")
  }

  test("q395 EWMA replays the exact dyadic recursion and stays inside " +
    "the running envelope") {
    val rows = Analytics.q395Ewma(spark, sf1).collect()
      .sortBy(_.getAs[String]("day"))
    val daily = rows.map(_.getAs[Long]("x"))
    // exact model: E_1 = x_1, E_t = x_t·2^(t-2) + E_(t-1);
    // ewma_milli = E_t·1000 / 2^(t-1) truncated
    var e = BigInt(0)
    daily.zipWithIndex.foreach { case (x, i) =>
      val t = i + 1
      e += (if (t == 1) BigInt(x) else BigInt(x) << (t - 2))
      val expected = (e * 1000 / (BigInt(1) << (t - 1))).toLong
      assert(rows(i).getAs[Long]("ewma_milli") === expected, s"day $t")
      // the smoother never leaves the running [min, max] envelope
      val lo = daily.take(t).min * 1000L
      val hi = daily.take(t).max * 1000L
      assert(rows(i).getAs[Long]("ewma_milli") >= lo - 1)
      assert(rows(i).getAs[Long]("ewma_milli") <= hi)
    }
    // day 1 initializes at the first observation exactly
    assert(rows.head.getAs[Long]("ewma_milli") === daily.head * 1000L)
    // half-life one day: the last value weights the last observation at
    // 1/2, so it sits within half the last jump of x_last
    val last = rows.last
    assert(math.abs(last.getAs[Long]("ewma_milli") -
      daily.last * 1000L) <= math.abs(daily.last - daily(daily.length - 2))
        * 1000L)
  }

  test("q396 Herfindahl: brute-force shares, competition bounds, and " +
    "supplier-count consistency") {
    val rows = Analytics.q396Herfindahl(spark, sf1).collect()
    val per = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("c"))
      .join(graft.sources.Tables.load(spark, sf1, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey", "s_suppkey").agg(sum("c").as("sc"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => BigInt(x._2))).toMap
    val names = graft.sources.Tables.load(spark, sf1, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getString(1) -> r.getAs[Number](0).longValue).toMap
    assert(rows.length === per.size)
    rows.foreach { r =>
      val shares = per(names(r.getAs[String]("n_name")))
      val s = shares.sum
      assert(r.getAs[Long]("n_suppliers") === shares.length.toLong)
      assert(r.getAs[Long]("total_cents") === s.toLong)
      val hhi = (shares.map(x => x * x).sum * 100000000 / (s * s)).toLong
      assert(r.getAs[Long]("hhi_e8") === hhi)
      // perfect competition floor 10^8/n (floor slack), monopoly cap 10^8
      assert(hhi >= 100000000L / shares.length - 1)
      assert(hhi <= 100000000L)
    }
  }

  test("q397 Adamic-Adar agrees with q183 on the candidate set and " +
    "bounds each score by its wedge count") {
    val aa = Analytics.q397AdamicAdar(spark, sf1).collect()
      .map(r => (r.getAs[String]("b1"), r.getAs[String]("b2")) ->
        (r.getAs[Long]("common"), r.getAs[Long]("aa_score"))).toMap
    val cn = Analytics.q183LinkPrediction(spark, sf1).collect()
      .map(r => (r.getAs[String]("b1"), r.getAs[String]("b2")) ->
        r.getAs[Long]("common")).toMap
    // same non-edge candidate pairs, same wedge counts
    assert(aa.keySet === cn.keySet)
    aa.foreach { case (k, (common, score)) =>
      assert(common === cn(k), s"wedge count drift at $k")
      // each wedge center has degree in [2, 2·|brands|]: per-wedge
      // weight is at most floor(1e6/ln 2) and strictly positive
      assert(score >= common, s"weight must be >= 1 at $k")
      assert(score <= common * 1442695L, s"weight cap at $k")
    }
    // AA must actually discriminate: unless every common neighbor has
    // the same degree, at least two equal-common pairs get different
    // scores (holds on this generator's hub-heavy brand graph)
    val byCommon = aa.values.groupBy(_._1).filter(_._2.size > 1)
    assert(byCommon.exists(_._2.map(_._2).toSet.size > 1),
      "AA scores collapse to a function of the wedge count")
  }

  test("q399 Viterbi replays a brute-force DP and beats both " +
    "single-state paths") {
    val row = Analytics.q399Viterbi(spark, sf1).head()
    val days = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("k"))
      .orderBy("day")
      .collect().map(r => r.getLong(2) * 1000000L / r.getLong(1))
    val (muH, muL, pen) = (Analytics.ViterbiMuHigh,
      Analytics.ViterbiMuLow, Analytics.ViterbiSwitch)
    val eh = days.map(r => -math.abs(r - muH))
    val el = days.map(r => -math.abs(r - muL))
    // brute-force forward DP with path strings, stay-preferring ties
    var (vh, vl, ph, pl) = (eh(0), el(0), "H", "L")
    (1 until days.length).foreach { t =>
      val nvh = eh(t) + math.max(vh, vl - pen)
      val nvl = el(t) + math.max(vl, vh - pen)
      val nph = (if (vh >= vl - pen) ph else pl) + "H"
      val npl = (if (vl >= vh - pen) pl else ph) + "L"
      vh = nvh; vl = nvl; ph = nph; pl = npl
    }
    assert(row.getAs[Long]("n_days") === days.length.toLong)
    assert(row.getAs[Long]("v_high") === vh)
    assert(row.getAs[Long]("v_low") === vl)
    val path = row.getAs[String]("path")
    assert(path === (if (vh >= vl) ph else pl))
    assert(path.length === days.length)
    assert(path.forall(c => c == 'H' || c == 'L'))
    // optimality floor: the decoded path's score beats (or ties) both
    // constant paths — all-high and all-low
    val best = math.max(vh, vl)
    assert(best >= eh.sum, "worse than the all-H path")
    assert(best >= el.sum, "worse than the all-L path")
  }

  test("q401 slope-one deviations replay the brute-force model and " +
    "stay inside the rating span") {
    val rows = Analytics.q401SlopeOne(spark, sf1).collect()
      .map(r => (r.getAs[String]("b1"), r.getAs[String]("b2")) ->
        (r.getAs[Long]("n_co"), r.getAs[Long]("dev_num"),
          r.getAs[Long]("dev_milli"))).toMap
    val ratings = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("c"))
      .join(graft.sources.Tables.load(spark, sf1, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.sources.Tables.load(spark, sf1, "part")
          .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("o_custkey", "p_brand")
      .agg(expr("CAST(sum(c) * 1000 DIV count(*) AS BIGINT)").as("r"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ratings.groupBy(_._1)
    val model = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)]
    byUser.values.foreach { ds =>
      val sorted = ds.sortBy(_._2)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        val k = (sorted(i)._2, sorted(j)._2)
        val (n0, s0) = model.getOrElse(k, (0L, 0L))
        model(k) = (n0 + 1, s0 + (sorted(i)._3 - sorted(j)._3))
      }
    }
    assert(rows.keySet === model.keySet.toSet)
    model.foreach { case (k, (n, s)) =>
      val (gn, gs, gd) = rows(k)
      assert(gn === n, s"$k n_co")
      assert(gs === s, s"$k dev_num")
      assert(gd === s / n, s"$k dev_milli")  // JVM / truncates like DIV
      // a mean difference can never exceed the global rating span
      val span = ratings.map(_._3).max - ratings.map(_._3).min
      assert(math.abs(gd) <= span, s"$k out of span")
    }
  }

  test("q404 MASE replays the exact lag model") {
    val row = Analytics.q404Mase(spark, sf1).head()
    val daily = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(to_date(col("ts")).as("day")).count().orderBy("day")
      .collect().map(_.getLong(1))
    val n = daily.length
    val s7 = (7 until n).map(i => math.abs(daily(i) - daily(i - 7))).sum
    val s1 = (1 until n).map(i => math.abs(daily(i) - daily(i - 1))).sum
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("sum_abs_7") === s7)
    assert(row.getAs[Long]("n_7") === (n - 7).toLong)
    assert(row.getAs[Long]("sum_abs_1") === s1)
    assert(row.getAs[Long]("n_1") === (n - 1).toLong)
    assert(row.getAs[Long]("mase_milli") ===
      (BigInt(s7) * (n - 1) * 1000 / (BigInt(s1) * (n - 7))).toLong)
    // iid daily counts: seasonal-naive ≈ plain naive, so MASE sits
    // near 1 — a strong seasonal signal would push it well below
    assert(row.getAs[Long]("mase_milli") > 300L)
    assert(row.getAs[Long]("mase_milli") < 3000L)
  }

  test("q406 DTW replays the brute-force DP and is bounded by the " +
    "diagonal alignment") {
    val row = Analytics.q406Dtw(spark, sf1).head()
    val census = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
          .as("na"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("nb"))
      .orderBy("day")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val a = census.map(_._1); val b = census.map(_._2)
    val n = a.length
    val big = Analytics.DtwBig
    var prev = Array.tabulate(n + 1)(i => if (i == 0) 0L else big)
    (0 until n).foreach { j =>
      val cur = Array.fill(n + 1)(big)
      (1 to n).foreach { i =>
        cur(i) = math.abs(a(i - 1) - b(j)) +
          math.min(math.min(prev(i - 1), prev(i)), cur(i - 1))
      }
      prev = cur
    }
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("dtw_cost") === prev(n))
    assert(row.getAs[Long]("per_step_milli") ===
      prev(n) * 1000L / (2L * n))
    // elastic alignment can only improve on the rigid diagonal
    val diag = (0 until n).map(i => math.abs(a(i) - b(i))).sum
    assert(prev(n) <= diag, "DTW worse than the identity alignment")
    assert(prev(n) >= 0L && prev(n) < big)
  }

  test("q407 Markov census conserves transitions and the conditional " +
    "entropy replays the fixed-order model") {
    val rows = Analytics.q407MarkovEntropy(spark, sf1).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("cnt"), r.getAs[Long]("h_cond_milli")))
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1),
        r.getLong(2), r.getString(3)))
    // brute-force transitions per user in (ts, event_id) order
    val model = scala.collection.mutable.Map
      .empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { g =>
      g.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
        .sliding(2).foreach { w =>
          if (w.length == 2) {
            val k = (w(0)._4, w(1)._4)
            model(k) = model.getOrElse(k, 0L) + 1
          }
        }
    }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === model.toMap)
    val total = model.values.sum
    assert(rows.map(_._3).sum === total)
    // entropy replay in the declared fixed (from, to) literal order
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rowSums = types.map(s =>
      s -> types.map(t => model.getOrElse((s, t), 0L)).sum).toMap
    var hn = 0.0
    types.foreach { s => types.foreach { t =>
      val c = model.getOrElse((s, t), 0L)
      if (c != 0L)
        hn += c.toDouble * (math.log(rowSums(s).toDouble) / math.log(2.0)
          - math.log(c.toDouble) / math.log(2.0))
    } }
    assert(rows.head._4 === math.floor(hn / total * 1000).toLong)
    // 5 exchangeable types: H(next|cur) must sit near log2 5 ≈ 2.32
    assert(rows.head._4 > 2000L && rows.head._4 < 2322L,
      s"conditional entropy ${rows.head._4} off the iid band")
  }

  test("q413 LIS/LDS replay the O(n^2) DP and satisfy Erdos-Szekeres") {
    val row = Analytics.q413Lis(spark, sf1).head()
    val daily = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(to_date(col("ts")).as("day")).count().orderBy("day")
      .collect().map(_.getLong(1))
    def longest(cmp: (Long, Long) => Boolean): Long = {
      val lens = new Array[Long](daily.length)
      daily.indices.foreach { i =>
        val prior = (0 until i).filter(j => cmp(daily(j), daily(i)))
        lens(i) = 1 + (if (prior.isEmpty) 0L else prior.map(lens).max)
      }
      lens.max
    }
    val (lis, lds) = (longest(_ < _), longest(_ > _))
    assert(row.getAs[Long]("n_days") === daily.length.toLong)
    assert(row.getAs[Long]("lis_len") === lis)
    assert(row.getAs[Long]("lds_len") === lds)
    // Erdos-Szekeres: any sequence of n distinct-ish values has
    // lis·lds >= n (ties only weaken the strict-subsequence lengths,
    // never below the distinct-value bound — assert on the n floor)
    assert(lis * lds >= daily.distinct.length.toLong)
    assert(lis >= 1L && lis <= daily.length)
    assert(lds >= 1L && lds <= daily.length)
  }

  test("q414 rescaled-range blocks replay the exact-deviation model") {
    val rows = Analytics.q414RescaledRange(spark, sf1).collect()
      .map(r => (r.getAs[Long]("w"), r.getAs[Long]("block")) ->
        (r.getAs[Long]("r_scaled"), r.getAs[Long]("rs_milli"))).toMap
    val daily = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy(to_date(col("ts")).as("day")).count().orderBy("day")
      .collect().map(_.getLong(1))
    Seq(10, 30).foreach { w =>
      val nBlocks = daily.length / w
      (0 until nBlocks).foreach { b =>
        val xs = daily.slice(b * w, (b + 1) * w)
        val tot = xs.sum
        val devs = xs.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (cum, i) => w * cum - (i + 1) * tot }
        val rScaled = devs.max - devs.min
        val sx2 = xs.map(x => BigInt(x) * x).sum
        val rs = math.floor(rScaled.toDouble * 1000 /
          math.sqrt((w * sx2 - BigInt(tot) * tot).toDouble)).toLong
        val (gr, grs) = rows((w.toLong, b.toLong))
        assert(gr === rScaled, s"w=$w b=$b")
        assert(grs === rs, s"w=$w b=$b")
        assert(gr > 0L && grs > 0L, s"w=$w b=$b degenerate")
      }
      assert(rows.keys.count(_._1 == w.toLong) === nBlocks, s"w=$w")
    }
    // iid short memory: R/S should grow roughly like sqrt(w) — the
    // w=30 block must exceed the w=10 average but stay within ~3x
    val rs10 = rows.collect { case ((10L, _), (_, rs)) => rs }
    val rs30 = rows((30L, 0L))._2
    assert(rs30 > rs10.min, "no growth from w=10 to w=30")
    assert(rs30 < 3L * rs10.max, "suspicious long-memory blowup")
  }

  test("q437 Katz agrees with q183 wedge counts off-edge, covers every " +
    "edge with adj=1, and the score is the declared combination") {
    val katz = Analytics.q437KatzIndex(spark, sf1).collect()
      .map(r => (r.getAs[String]("b1"), r.getAs[String]("b2")) ->
        (r.getAs[Long]("adj"), r.getAs[Long]("paths2"),
          r.getAs[Long]("katz_micro"))).toMap
    katz.values.foreach { case (adj, p2, score) =>
      assert(adj == 0L || adj == 1L)
      assert(score === adj * Analytics.KatzB1Micro +
        p2 * Analytics.KatzB2Micro)
    }
    // off-edge pairs with paths2 > 0 are exactly q183's candidates
    val lp = Analytics.q183LinkPrediction(spark, sf1).collect()
      .map(r => (r.getAs[String]("b1"), r.getAs[String]("b2")) ->
        r.getAs[Long]("common")).toMap
    lp.foreach { case (pair, common) =>
      val (adj, p2, _) = katz(pair)
      assert(adj === 0L, s"$pair is a q183 non-edge")
      assert(p2 === common, s"$pair wedge count")
    }
    val offEdge = katz.filter { case (_, (adj, p2, _)) =>
      adj == 0L && p2 > 0L }
    assert(offEdge.keySet === lp.keySet)
  }

  test("q436 rich-club phi replays from q437's edge set and is a " +
    "valid density at every threshold") {
    val rows = Analytics.q436RichClub(spark, sf1).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_club"), r.getAs[Long]("e_club"),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(rows.size === Analytics.RichClubKs.size)
    val edges = Analytics.q437KatzIndex(spark, sf1).collect()
      .filter(_.getAs[Long]("adj") == 1L)
      .map(r => (r.getAs[String]("b1"), r.getAs[String]("b2")))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    Analytics.RichClubKs.foreach { k =>
      val club = deg.filter(_._2 > k).keySet
      val eClub = edges.count(e => club(e._1) && club(e._2)).toLong
      val (gN, gE, gPhi) = rows(k)
      assert(gN === club.size.toLong, s"k=$k n_club")
      assert(gE === eClub, s"k=$k e_club")
      if (club.size >= 2) {
        val phi = 2L * eClub * 1000000L /
          (club.size.toLong * (club.size - 1))
        assert(gPhi === Some(phi), s"k=$k phi")
        assert(phi <= 1000000L, s"k=$k phi is a density")
      } else assert(gPhi.isEmpty, s"k=$k degenerate")
    }
  }

  test("q441 epi panel replays the 2x2 cells and the three ratios " +
    "agree in direction") {
    val row = Analytics.q441EpiRatios(spark, sf1).head()
    val cells = graft.sources.Tables.load(spark, sf1, "orders")
      .select((col("o_orderpriority") === "1-URGENT").as("ex"),
        (col("o_orderstatus") === "F").as("bad"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val a = cells.count(c => c._1 && c._2).toLong
    val b = cells.count(c => c._1 && !c._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val d = cells.count(x => !x._1 && !x._2).toLong
    assert(row.getAs[Long]("a") === a)
    assert(row.getAs[Long]("b") === b)
    assert(row.getAs[Long]("c") === c)
    assert(row.getAs[Long]("d") === d)
    val rr = BigInt(a) * (c + d) * 1000000 / (BigInt(c) * (a + b))
    val or = BigInt(a) * d * 1000000 / (BigInt(b) * c)
    assert(row.getAs[Long]("rr_ppm") === rr.toLong)
    assert(row.getAs[Long]("or_ppm") === or.toLong)
    val rd = row.getAs[Long]("rd_ppm")
    // direction agreement: RR>1 iff OR>1 iff RD>0 (exact cells)
    assert((rr > 1000000) === (or > 1000000))
    assert((rr > 1000000) === (rd > 0) || rd == 0)
    val chi2 = row.getAs[Long]("chi2_milli")
    val z = (a + b + c + d).toDouble *
      math.pow(a.toDouble * d - b.toDouble * c, 2) /
      ((a + b).toDouble * (c + d) * (a + c) * (b + d))
    assert(math.abs(chi2 - math.floor(z * 1000)) <= 1.0)
  }

  test("q445 Granger screen replays the closed-form two-regression F " +
    "from exact moments") {
    val row = Analytics.q445GrangerLite(spark, sf1).head()
    val daily = graft.sources.Tables.load(spark, sf1, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("yv"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val byDay = daily.map(d => d._1 -> d).toMap
    val pairs = daily.flatMap { case (d, x, yv) =>
      byDay.get(d.plusDays(1)).map(t => (t._3, yv, x)) } // (yt, ylag, xlag)
    val n = pairs.length.toLong
    assert(row.getAs[Long]("n") === n)
    def S(f: ((Long, Long, Long)) => (Long, Long)): Double = {
      val ab = pairs.map(p => { val (a, b) = f(p); BigInt(a) * b }).sum
      val sa = pairs.map(p => BigInt(f(p)._1)).sum
      val sb = pairs.map(p => BigInt(f(p)._2)).sum
      n.toDouble * ab.toDouble - sa.toDouble * sb.toDouble
    }
    val say = S(p => (p._1, p._2)); val sby = S(p => (p._1, p._3))
    val sab = S(p => (p._2, p._3)); val saa = S(p => (p._2, p._2))
    val sbb = S(p => (p._3, p._3)); val syy = S(p => (p._1, p._1))
    val det = saa * sbb - sab * sab
    val b1 = (say * sbb - sby * sab) / det
    val b2 = (sby * saa - say * sab) / det
    val rssR = syy - say * (say / saa)
    val rssU = syy - (say * b1 + sby * b2)
    val f = (rssR - rssU) * (n - 3.0) / rssU
    assert(row.getAs[Long]("f_milli") === math.floor(f * 1e3).toLong)
    assert(row.getAs[Long]("b2_sign") === (if (b2 > 0) 1L
      else if (b2 < 0) -1L else 0L))
    assert(f >= -1e-9, "F statistic must be nonnegative")
  }

  test("q447 SPC chart uses complete weeks only, replays the A2/D3/D4 " +
    "limits, and an in-control generator flags few weeks") {
    val rows = Analytics.q447SpcControl(spark, sf1).collect()
      .map(r => r.getAs[Long]("wk") ->
        (r.getAs[Long]("sum_rv"), r.getAs[Long]("r"),
          r.getAs[Boolean]("x_ooc"), r.getAs[Boolean]("r_ooc"))).toMap
    val daily = graft.sources.Tables.load(spark, sf1, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("rv"))
      .collect().map { r =>
        val d = r.getDate(0).toLocalDate
        val wk = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse("1995-01-01"), d) / 7
        (wk, r.getLong(1))
      }
    val complete = daily.groupBy(_._1).filter(_._2.length == 7)
    assert(rows.keySet === complete.keySet)
    val nw = complete.size.toLong
    val st = complete.values.map(_.map(_._2).sum).sum
    val sr = complete.values
      .map(g => g.map(_._2).max - g.map(_._2).min).sum
    val center = st.toDouble / nw / 7.0
    val rbar = sr.toDouble / nw
    var ooc = 0
    complete.foreach { case (wk, g) =>
      val sum = g.map(_._2).sum
      val r = g.map(_._2).max - g.map(_._2).min
      val (gSum, gR, gX, gRf) = rows(wk)
      assert(gSum === sum); assert(gR === r)
      val xbar = sum.toDouble / 7.0
      assert(gX === (xbar > center + 0.419 * rbar ||
        xbar < center - 0.419 * rbar), s"wk $wk x")
      assert(gRf === (r.toDouble > 1.924 * rbar ||
        r.toDouble < 0.076 * rbar), s"wk $wk r")
      if (gX || gRf) ooc += 1
    }
    assert(ooc.toDouble / nw < 0.25, s"too many OOC weeks: $ooc/$nw")
  }

  test("q459 SMD panel replays the per-arm covariate cells and the " +
    "randomized parity arms are balanced") {
    val rows = Analytics.q459PropensityBalance(spark, sf1).collect()
      .map(r => r.getAs[String]("covariate") ->
        (r.getAs[Long]("nt"), r.getAs[Long]("nc"),
          r.getAs[Long]("smd_milli"), r.getAs[Boolean]("imbalanced")))
      .toMap
    assert(rows.size === 4)
    val per = graft.sources.Tables.load(spark, sf1, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)"))
          .as("spend_cents"),
        countDistinct(to_date(col("ts"))).as("active_days"))
      .collect()
      .map(r => (r.getLong(0) % 2 == 1,
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val covs = Seq("n_events", "n_purchases", "spend_cents",
      "active_days")
    val tArm = per.filter(_._1).map(_._2)
    val cArm = per.filterNot(_._1).map(_._2)
    covs.zipWithIndex.foreach { case (cv, i) =>
      val (nt, nc) = (tArm.length.toLong, cArm.length.toLong)
      def stats(xs: Seq[Seq[Long]]) = {
        val v = xs.map(_(i))
        (v.map(BigInt(_)).sum, v.map(x => BigInt(x) * x).sum)
      }
      val (st, qt) = stats(tArm); val (sc, qc) = stats(cArm)
      val vt = (qt.toDouble - st.toDouble * (st.toDouble / nt)) /
        (nt - 1.0)
      val vc = (qc.toDouble - sc.toDouble * (sc.toDouble / nc)) /
        (nc - 1.0)
      val smd = math.abs(st.toDouble / nt - sc.toDouble / nc) /
        math.sqrt((vt + vc) / 2.0)
      val (gNt, gNc, gSmd, gImb) = rows(cv)
      assert(gNt === nt); assert(gNc === nc)
      assert(gSmd === math.floor(smd * 1e3).toLong, cv)
      assert(gImb === (gSmd > Analytics.SmdGateMilli))
      // user_id parity is as-good-as-random, but sf0.001 has only ~15
      // users total (SE(SMD) ~ sqrt(4/7.5) ~ 0.73) — the 0.1 gate and
      // even large SMDs legitimately fire here; bound at 3 SE
      assert(gSmd < 2200L, s"$cv SMD $gSmd outside 3 SE at n~7.5/arm")
    }
  }

  test("q469 churn cells partition the user-week transitions and the " +
    "steady state replays the closed form") {
    val row = Analytics.q469ChurnSteadyState(spark, sf1).head()
    val (aa, ai, ia, ii) = (row.getAs[Long]("aa"), row.getAs[Long]("ai"),
      row.getAs[Long]("ia"), row.getAs[Long]("ii"))
    val n = row.getAs[Long]("n_users")
    // 3 transitions per user over the 4-week spine
    assert(aa + ai + ia + ii === 3 * n)
    if (aa + ai > 0)
      assert(row.getAs[Long]("churn_ppm") === ai * 1000000L / (aa + ai))
    // at sf0.001 every one of the ~15 users is active every week, so
    // the revive/steady denominators can legitimately be zero (NULL)
    if (ai + ia > 0)
      assert(row.getAs[Long]("steady_active_ppm") ===
        ia * 1000000L / (ai + ia))
    else assert(row.isNullAt(row.fieldIndex("steady_active_ppm")))
    // brute-force the cells
    val cut = (d: java.sql.Timestamp) => d
    val evs = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), java.time.temporal.ChronoUnit.DAYS
        .between(java.time.LocalDate.parse("2024-01-01"),
          r.getDate(1).toLocalDate) / 7))
      .filter(_._2 < 4).distinct
    val users = evs.map(_._1).distinct
    var (baa, bai, bia, bii) = (0L, 0L, 0L, 0L)
    // users with no events in weeks 0..3 still sit on the spine
    val allUsers = graft.sources.Tables.load(spark, sf1, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    allUsers.foreach { u =>
      val act = (0 until 4).map(w => evs.contains((u, w.toLong)))
      (1 until 4).foreach { w =>
        (act(w - 1), act(w)) match {
          case (true, true) => baa += 1
          case (true, false) => bai += 1
          case (false, true) => bia += 1
          case (false, false) => bii += 1
        }
      }
    }
    assert((aa, ai, ia, ii) === ((baa, bai, bia, bii)))
  }

  test("q471 decile lift is a partition, conversion is monotone-ish in " +
    "propensity, and cumulative gain ends at one") {
    val rows = Analytics.q471DecileLift(spark, sf1).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length === 10)
    val totalN = rows.map(_.getAs[Long]("n")).sum
    val totalConv = rows.map(_.getAs[Long]("n_conv")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("conv_ppm") ===
        r.getAs[Long]("n_conv") * 1000000L / r.getAs[Long]("n"))
    }
    assert(rows.last.getAs[Long]("cum_gain_ppm") === 1000000L,
      "cumulative gain must end at 100%")
    // deciles ranked by PRE purchases: the top decile must capture at
    // least its proportional share of POST converters (persistence)
    val d1 = rows.head
    assert(d1.getAs[Long]("n_conv") * totalN >=
      totalConv * d1.getAs[Long]("n"),
      "top pre-propensity decile under-captures post converters")
  }

  test("q481 LTV composes the q469 chain: lifetime is the geometric " +
    "identity and LTV the declared integer product") {
    val row = Analytics.q481CustomerLtv(spark, sf1).head()
    val auw = row.getAs[Long]("active_uw")
    val spend = row.getAs[Long]("spend_cents")
    assert(auw > 0L && spend > 0L)
    val churn = Option(row.get(2)).map(_.asInstanceOf[Long])
    val life = Option(row.get(3)).map(_.asInstanceOf[Long])
    val ltv = Option(row.get(4)).map(_.asInstanceOf[Long])
    (churn, life, ltv) match {
      case (Some(c), Some(l), Some(v)) =>
        // lifetime_milli = 1e9 / churn_ppm up to integer truncation
        assert(math.abs(l - 1000000000L / math.max(c, 1L)) <= l,
          "lifetime and churn disagree wildly")
        assert(v > 0L)
        // LTV >= one active week's spend when lifetime >= 1 week
        assert(v >= spend / auw)
      case _ =>
        // no churn observed at this SF: lifetime/LTV must be NULL
        assert(life.isEmpty && ltv.isEmpty)
    }
  }

  test("q493 growth accounting satisfies the flow identity " +
    "dau = new + retained + resurrected and delta = new + res - churn") {
    val rows = Analytics.q493GrowthAccounting(spark, sf1).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("new_u"),
          r.getAs[Long]("retained"), r.getAs[Long]("resurrected"),
          r.getAs[Long]("churned"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (d, (dau, nu, ret, res, _)) =>
      assert(dau === nu + ret + res, s"$d stock identity")
    }
    // flow identity against the previous day's dau
    val sorted = rows.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, prev), (d, cur)) =>
        assert(cur._1 - prev._1 === cur._2 + cur._4 - cur._5,
          s"$d flow identity")
      case _ =>
    }
    // brute-force one day's cells
    val ud = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val firstDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).min)
    val days = byDay.keys.toSeq.sorted
    val probe = days(days.length / 2)
    val prevD = probe.minusDays(1)
    val (act, prevAct) = (byDay(probe), byDay.getOrElse(prevD, Set.empty[Long]))
    val key = probe.toString
    val (dau, nu, ret, res, ch) = rows(key)
    assert(dau === act.size.toLong)
    assert(nu === act.count(u => firstDay(u) == probe).toLong)
    assert(ret === act.intersect(prevAct).size.toLong)
    assert(res === act.count(u =>
      !prevAct(u) && firstDay(u) != probe).toLong)
    assert(ch === (prevAct -- act).size.toLong)
  }
}
