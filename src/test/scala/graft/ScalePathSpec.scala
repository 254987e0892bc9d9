package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Event, EventStream}

/** Scale-path mechanics: bucketed co-located joins (the shuffle that
  * ISN'T there) and streaming dedup with watermark-bounded state. */
class ScalePathSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // bucketed scans only pay off when Spark doesn't fuse them away
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.sources.Tables.load(spark, sf1, "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = graft.sources.Tables.load(spark, sf1, "orders")
        .select("o_orderkey", "o_totalprice")
      Sink.writeBucketedTable(li, "l_orderkey", 8, "b_lineitem")
      Sink.writeBucketedTable(ord, "o_orderkey", 8, "b_orders")
      val joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it's still the right answer
      val expect = graft.sources.Tables.load(spark, sf1, "lineitem")
        .join(graft.sources.Tables.load(spark, sf1, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("q123 declared bucketed join: sort-merge with zero exchange") {
    try {
      val df = graft.operators.Extensions.q123BucketedJoin(spark, sf1)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"the declared plan must be the at-scale SMJ shape:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$plan")
      // and it's still the right answer
      val expect = graft.sources.Tables.load(spark, sf1, "lineitem")
        .join(graft.sources.Tables.load(spark, sf1, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(df.count() === expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    }
  }

  test("q12 multiway join: the dim chain stays broadcast (no SMJ demotion)") {
    // VERDICT r6 item 6: two bench draws put q12 over 2× its baseline;
    // re-measure cleared it (1.4×, box noise), but the PLAN claim —
    // the left-deep dim chain (customer, nation, region) rides broadcast
    // joins, never a shuffle per dim — is what holds at 1000 executors,
    // so pin it here where a threshold/AQE change would silently flip it.
    val plan = graft.operators.Core.q12MultiwayJoin(spark, sf1)
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 3,
      s"expected the 3 dim joins to be BroadcastHashJoin, found $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dim join was demoted to sort-merge:\n$plan")
  }

  test("q89 chunking plans with zero exchanges (pure generator pass)") {
    val plan = graft.operators.TextOps.q89ChunkDocuments(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle:\n$plan")
  }

  test("q62 hash split plans with zero exchanges") {
    val plan = graft.operators.Pipeline.q62HashSplit(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"content-hash split must not shuffle:\n$plan")
  }

  test("q96 redaction plans with zero exchanges (codegen'd scrub pass)") {
    val plan = graft.operators.TextOps.q96PiiRedaction(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"redaction must not shuffle:\n$plan")
  }

  test("q95 packing re-aggregates on the window partitioning: 1 exchange") {
    val plan = graft.operators.Pipeline.q95PackSequences(spark, sf1)
      .queryExecution.executedPlan.toString
    val n = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(n === 1,
      s"packing needs exactly the window's source shuffle, found $n:\n$plan")
  }

  test("centroid assignment shuffles nothing: no Exchange hashpartitioning") {
    // the ANN scale path (q29/q76): the per-vector argmax must stay
    // in-row over the broadcast centroid array — a hashpartitioning
    // Exchange here means the ×NumCentroids-expanded corpus is crossing
    // the wire again (the window-rank formulation this replaced)
    val assign = graft.operators.Similarity.assigned(
      graft.operators.Similarity.vectors(spark, sf1))
    val plan = assign.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignment must not shuffle the corpus:\n$plan")
  }

  test("q106 winsorize rides ONE exchange: rank, bounds, and re-agg") {
    // bounds come from whole-partition window aggregates over the rank
    // window's own c_nationkey exchange — a bounds join (or uncached
    // second consumption) would show up as a second non-broadcast shuffle
    val plan = graft.operators.Extensions.q106Winsorize(spark, sf1)
      .queryExecution.executedPlan.toString
    val n = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(n === 1,
      s"winsorize needs exactly the group-key shuffle, found $n:\n$plan")
  }

  test("q108 vocab ranks only the top-V survivors (TakeOrderedAndProject)") {
    // the census must reduce through orderBy.limit(V) before any global
    // rank window — a row_number over the full census would show a
    // single-partition Exchange under a Window instead
    val plan = graft.operators.TextOps.q108VocabEncode(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab selection must be a bounded top-V, not a global sort:\n$plan")
  }

  test("q111 k-means step: only the census shuffles, assignment is in-row") {
    // the corpus-bearing exchanges must be the (label, dim) census and
    // tiny-side aggregates — the vector re-assignment itself may not
    // introduce a corpus-wide hashpartitioning beyond them, and nothing
    // may go all-pairs
    val plan = graft.operators.Similarity.q111KmeansRefine(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"k-means step must not compare pairs:\n$plan")
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n <= 3,
      s"census + confusion agg need <=3 keyed exchanges, found $n:\n$plan")
  }

  test("q120 multi-probe fans out on the probe side only and its recall " +
    "vs exact top-k is at least single-probe q76's") {
    import org.apache.spark.sql.expressions.Window
    val S = graft.operators.Similarity
    val q120 = S.q120MultiprobeAnn(spark, sf1)
    // plan: the ×nprobe explode must ride the broadcast (probe) branch —
    // the corpus branch stays an in-row assignment feeding one equi-join
    val plan = q120.queryExecution.executedPlan.toString
    // (the BroadcastNestedLoopJoins in this plan are the O(1)-row
    // centroid-array broadcasts, not pair generation)
    assert(!plan.contains("CartesianProduct"),
      s"multi-probe must stay an equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin [cent_id"),
      s"corpus×probe candidates must pair via the cell equi-join:\n$plan")
    assert("Generate".r.findAllIn(plan).size === 1,
      s"exactly one explode (the probe→cell fan-out):\n$plan")
    // recall: ground truth = brute-force top-BatchTopK per probe
    val e = S.vectors(spark, sf1)
    val probes = e.filter(col("vec_id") < S.NumProbes)
      .select(col("vec_id").as("probe_id"), col("ed").as("ped"),
        col("nrm").as("pnrm"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("pcos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(probes))
      .withColumn("pcos",
        graft.functions.VectorFunctions.vec_dot(col("ed"), col("ped")) /
          (col("nrm") * col("pnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= S.BatchTopK)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int = df
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count(exact.contains)
    val multi = hits(q120)
    val single = hits(S.q76BatchAnn(spark, sf1))
    assert(multi >= single,
      s"nprobe=${S.NProbe} recalled $multi exact hits < nprobe=1's $single")
    // every probe is its own nearest neighbor, and its own cell is its
    // nearest cell — rank 1 must be the probe itself
    val self = q120.filter(col("rank") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(self.forall { case (p, v) => p === v },
      s"rank-1 should be the probe itself: ${self.toSeq}")
  }

  test("q153 eval's tp equals an independent exact-truth recompute") {
    import org.apache.spark.sql.expressions.Window
    val S = graft.operators.Similarity
    val eval = S.q153AnnEval(spark, sf1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(eval.size === S.NumProbes)
    val e = S.vectors(spark, sf1)
    val probes = e.filter(col("vec_id") < S.NumProbes)
      .select(col("vec_id").as("probe_id"), col("ed").as("ped"),
        col("nrm").as("pnrm"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("pcos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(probes))
      .withColumn("pcos",
        graft.functions.VectorFunctions.vec_dot(col("ed"), col("ped")) /
          (col("nrm") * col("pnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= S.BatchTopK)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tpModel = S.q120MultiprobeAnn(spark, sf1)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(exact.contains).groupBy(_._1).view.mapValues(_.length)
    (0L until S.NumProbes.toLong).foreach { pid =>
      val (tp, ppm) = eval(pid)
      assert(tp === tpModel.getOrElse(pid, 0).toLong,
        s"probe $pid: declared tp $tp != recomputed")
      assert(ppm === tp * 1000000L / S.BatchTopK)
    }
  }

  test("q215 MRR rows are one-per-probe with consistent rank arithmetic") {
    import graft.operators.Similarity
    val res = Similarity.q215MrrEval(spark, sf1).collect()
    assert(res.length === Similarity.NumProbes)
    res.foreach { r =>
      val rank = r.getAs[Long]("ann_rank")
      val rr = r.getAs[Long]("rr_ppm")
      assert(rank >= 0L && rank <= Similarity.BatchTopK)
      if (rank == 0L) assert(rr === 0L, "missed nn must score 0")
      else assert(rr === 1000000L / rank, "rr must be 1e6 div rank")
      // self was excluded on both sides: the true nn is never the probe
      assert(r.getAs[Long]("nn_id") !== r.getAs[Long]("probe_id"))
    }
  }

  test("q154 gram matrix: full upper triangle, nonnegative diagonal, " +
    "every cell Cauchy-Schwarz-consistent with the diagonal") {
    val S = graft.operators.Similarity
    val g = S.q154GramMatrix(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d = S.GramDims
    assert(g.size === d * (d + 1) / 2)
    for (i <- 0 until d)
      assert(g((i.toLong, i.toLong)) >= 0L)
    // a TRUE second-moment matrix obeys (Σxy)² ≤ Σx²·Σy² exactly —
    // any per-cell sum corruption (lost partition, double count)
    // breaks this long before it would be visible in a spot check
    for (i <- 0 until d; j <- i + 1 until d) {
      val off = g((i.toLong, j.toLong))
      assert(off * off <=
        g((i.toLong, i.toLong)) * g((j.toLong, j.toLong)),
        s"Cauchy-Schwarz violated at ($i,$j)")
    }
  }

  test("q127 semdedup pairs only within IVF cells and every drop names " +
    "a smaller same-cell keeper") {
    val S = graft.operators.Similarity
    val df = S.q127Semdedup(spark, sf1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"semdedup must pair via the cell equi-join, not all-pairs:\n$plan")
    val cell = S.assigned(S.vectors(spark, sf1))
      .select("vec_id", "cent_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "τ should drop something on this corpus")
    for ((v, keeper, n) <- rows) {
      assert(keeper < v, s"keeper $keeper must precede dropped $v")
      assert(cell(keeper) === cell(v),
        s"keeper $keeper (cell ${cell(keeper)}) not in $v's cell ${cell(v)}")
      assert(n >= 1L)
    }
  }

  test("q128 rerank: stage 1 is a bounded TakeOrderedAndProject and the " +
    "scale-corrected int8 prefilter recalls the exact top-k") {
    val S = graft.operators.Similarity
    val df = S.q128RerankAnn(spark, sf1)
    val plan = df.queryExecution.executedPlan.toString
    // the candidate cut must reduce through orderBy.limit(pool) — a
    // global row_number over the corpus would plan a single-partition
    // Exchange under a Window instead
    assert(plan.contains("TakeOrderedAndProject"),
      s"stage-1 pool must be a bounded top-${S.RerankPool}:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.find(_._2 == 1L).map(_._1) === Some(0L),
      s"rank 1 should be the probe itself: ${got.toSeq}")
    // exact ground truth: brute-force cosine top-k
    val e = S.vectors(spark, sf1)
    val probe = e.filter(col("vec_id") === 0L)
      .select(col("ed").as("ped"), col("nrm").as("pnrm"))
    val exact = e.crossJoin(broadcast(probe))
      .withColumn("pcos",
        graft.functions.VectorFunctions.vec_dot(col("ed"), col("ped")) /
          (col("nrm") * col("pnrm")))
      .orderBy(col("pcos").desc, col("vec_id"))
      .limit(S.TopK)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val hits = got.count(g => exact.contains(g._1))
    // measured 10/10 at every SF once the per-vector scales correct the
    // raw integer dot; ≥8 guards against benign testdata regeneration
    assert(hits >= 8,
      s"int8 prefilter recalled only $hits/${S.TopK} exact neighbors")
  }

  test("q133 MMR equals the exact greedy model over the collected pool") {
    val S = graft.operators.Similarity
    val got = S.q133MmrSelect(spark, sf1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._2)
    assert(got.map(_._2).toSeq === (1L to S.MmrK).toSeq)
    assert(got.map(_._1).distinct.length === S.MmrK, "picks must be unique")
    // exact model: collect the same relevance-ranked pool, run the
    // greedy loop in Scala with the same fold-order dot product
    val e = S.vectors(spark, sf1)
    val probe = e.filter(col("vec_id") === 0L)
      .select(col("ed").as("ped"), col("nrm").as("pnrm"))
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    val pool = e.crossJoin(broadcast(probe))
      .withColumn("rel",
        graft.functions.VectorFunctions.vec_dot(col("ed"), col("ped")) /
          (col("nrm") * col("pnrm")))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(S.RerankPool)
      .select("vec_id", "ed", "nrm", "rel")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(3),
        r.getDouble(2)))
    var sel = List(pool.maxBy(p => (p._3, -p._1))._1)
    val byId = pool.map(p => p._1 -> p).toMap
    while (sel.length < S.MmrK) {
      val cand = pool.filterNot(p => sel.contains(p._1)).map { p =>
        val maxsim = sel.map { sid =>
          val sv = byId(sid)
          dot(p._2, sv._2) / (p._4 * sv._4)
        }.max
        (p._1, 0.7 * p._3 - 0.3 * maxsim)
      }
      sel = sel :+ cand.maxBy(c => (c._2, -c._1))._1
    }
    assert(got.map(_._1).toSeq === sel,
      s"engine picks ${got.map(_._1).toSeq} != model $sel")
    // diversity must actually bite: the MMR set differs from pure top-k
    val topk = pool.sortBy(p => (-p._3, p._1)).take(S.MmrK).map(_._1).toSet
    assert(got.map(_._1).toSet !== topk,
      "λ=0.7 should trade some relevance for diversity on this corpus")
  }

  test("q134 funnel counts are monotone down the sequence") {
    val m = graft.operators.Extensions.q134Funnel(spark, sf1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet === Set("1_view", "2_click", "3_purchase"))
    assert(m("1_view") >= m("2_click"),
      "a click conversion needs a prior view")
    assert(m("2_click") >= m("3_purchase"),
      "a purchase conversion needs a prior click")
    assert(m("1_view") > 0L)
  }

  test("q135 mixture sampling honors the capped retention contract") {
    val rows = graft.operators.Pipeline.q135MixtureApply(spark, sf1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    for ((src, nDocs, nKept, ppm) <- rows) {
      assert(nKept <= nDocs, src)
      assert(ppm >= 0L && ppm <= graft.operators.Pipeline.SampleMod, src)
      if (ppm == graft.operators.Pipeline.SampleMod)
        assert(nKept === nDocs, s"$src at weight >= 1 must keep all")
    }
    // the mixture must genuinely downsample somewhere, or it's vacuous
    assert(rows.exists(r => r._3 < r._2),
      "expected at least one down-weighted source")
  }

  test("q136 coverage curve is monotone and well-formed") {
    val rows = graft.operators.TextOps.q136VocabCoverage(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      graft.operators.TextOps.CoverageKs.map(_.toLong))
    val total = rows.head._3
    assert(rows.forall(_._3 == total))
    assert(rows.forall(r => r._2 <= r._3 && r._4 <= 1000000L))
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted,
      "coverage must be nondecreasing in k")
    assert(rows.last._2 > rows.head._2,
      "larger vocab should cover strictly more on a Zipfian census")
  }

  test("q143 state-run intervals ride ONE user-keyed exchange") {
    // lag, the cumulative run-id sum, and the run aggregate all share
    // the (user_id, k) partitioning — a second keyed exchange means a
    // window or aggregate stopped reusing it
    val plan = graft.operators.Extensions.q143StateIntervals(spark, sf1)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1,
      s"runs need exactly the user shuffle, found $n:\n$plan")
  }

  test("q169 sweep census plans with no join (quadratic generator gone)") {
    // the round-8 rewrite's whole point: the pair census comes from a
    // prefix-sum sweep over the checkpointed endpoint sort, so the
    // declared plan must contain NO join node of any kind — a join
    // reappearing here means the quadratic candidate generator
    // (SCALING.md case study) is back. Observable shape past the
    // checkpoint: the MapPartitions emit pass feeding the one census
    // exchange; the endpoint range exchange lives inside the
    // checkpointed job by design (lineage truncation).
    val df = graft.operators.Extensions.q169IntervalJoin(spark, sf1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sweep must not join:\n$plan")
    assert(plan.contains("MapPartitions"),
      s"sweep emit pass missing:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"only the types-sized census may shuffle, found $exchanges:\n$plan")
  }

  test("q221 dense ids plan with no global window and survive coalesce") {
    val df = graft.operators.Pipeline.q221DenseIds(spark, sf1)
    val plan = df.queryExecution.executedPlan.toString
    // the whole point: never the single-partition global window
    assert(!plan.contains("Window"), s"global window crept back:\n$plan")
    assert(plan.contains("MapPartitions"), plan)
    // the declared tail is narrow: checkpointed sort → numbering, no
    // post-checkpoint exchange
    assert(!plan.contains("Exchange"), plan)
    // regression: Verify writes through coalesce(1), which merges the
    // numbering pass into one task — ids must come from the embedded
    // pid, not TaskContext (offsets zeroed otherwise)
    val viaCoalesce = df.coalesce(1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(viaCoalesce === expected)
  }

  test("q138 snapshot diff counts equal the mutation arithmetic") {
    val m = graft.operators.Pipeline.q138SnapshotDiff(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = graft.sources.Tables.load(spark, sf1, "orders")
      .select(col("o_orderkey").cast("long").as("k")).collect()
      .map(_.getLong(0))
    val removed = keys.count(_ % 13 == 0).toLong
    val added = keys.count(_ % 97 == 0).toLong
    val changed = keys.count(k => k % 10 == 0 && k % 13 != 0).toLong
    assert(m("removed") === removed)
    assert(m("added") === added)
    assert(m("changed") === changed)
    assert(m.values.sum === keys.length + added,
      "every key of either snapshot is classified exactly once")
  }

  test("q144 count-min estimates dominate exact counts (CMS theorem) " +
      "and the width is small enough that the sketch really overcounts") {
    val rows = graft.operators.TextOps.q144Countmin(spark, sf1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === graft.operators.TextOps.CmTopK)
    for ((w, exact, est) <- rows)
      assert(est >= exact, s"CMS must never undercount: $w $est < $exact")
    assert(rows.exists { case (_, exact, est) => est > exact },
      "width is sized below the bigram domain — at least one probe " +
        "must land in the overcount regime or the test data degenerated")
  }

  test("q145 merkle diff equals the unpruned full diff and actually " +
      "prunes clean blocks") {
    val m = graft.operators.Pipeline.q145MerkleDiff(spark, sf1)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    // unpruned reference: classify every key of either snapshot
    val keys = graft.sources.Tables.load(spark, sf1, "orders")
      .select(col("o_orderkey").cast("long").as("k")).collect()
      .map(_.getLong(0))
    val blk = (k: Long) => k / graft.operators.Pipeline.MerkleBlock
    val touched = (k: Long) => blk(k) % 8 == 3
    val removed = keys.filter(k => touched(k) && k % 13 == 0)
    val added = keys.filter(k => touched(k) && k % 97 == 0)
    val changed =
      keys.filter(k => touched(k) && k % 10 == 0 && k % 13 != 0)
    assert(m("removed") === ((removed.length.toLong, removed.sum)))
    assert(m("added") ===
      ((added.length.toLong, added.map(_ + 10000000L).sum)))
    assert(m("changed") === ((changed.length.toLong, changed.sum)))
    val (dirty, _) = m("dirty_blocks")
    val (total, _) = m("total_blocks")
    assert(dirty < total,
      s"digest compare must prune clean blocks ($dirty/$total dirty)")
  }

  test("q146 upsert merge is batch-split invariant (LWW max commutes)") {
    import spark.implicits._
    val E = graft.streaming.EventStream
    val rows = Seq( // (user_id, k, last_type, n_upserts)
      (1L, 10L, "a", 1L), (1L, 30L, "c", 1L), (1L, 20L, "b", 1L),
      (2L, 5L, "x", 1L), (2L, 6L, "y", 1L), (3L, 7L, "z", 1L))
    def df(rs: Seq[(Long, Long, String, Long)]) =
      rs.toDF("user_id", "k", "last_type", "n_upserts")
    val empty = df(Seq.empty)
    val oneShot = E.mergeUpserts(empty, df(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // same rows split into three "micro-batches", merged incrementally
    val split = rows.grouped(2).foldLeft(empty) { (snap, b) =>
      E.mergeUpserts(snap, df(b))
    }.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(oneShot.toSeq === split.toSeq)
    assert(oneShot.find(_._1 == 1L).get._3 === "c", "LWW picks max k")
  }

  test("q147 label propagation separates two cliques joined by a bridge") {
    import spark.implicits._
    val G = graft.operators.Graph
    // two triangles {0,1,2} and {10,11,12} plus a bridge 2-10
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L)).toDF("u", "v")
    val nodes = (Seq(0L, 1L, 2L, 10L, 11L, 12L)).toDF("id")
    val out = G.labelPropagation(nodes, und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(out(0L), out(1L), out(2L)).size === 1,
      "first clique converges to one label")
    assert(Set(out(10L), out(11L), out(12L)).size === 1,
      "second clique converges to one label")
    assert(out(0L) !== out(11L),
      "the bridge must not merge the two communities")
  }

  test("q148 shot boundaries: uniform payload has zero cuts, a hard " +
      "mid-payload content switch has at least one") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    val uniform = "a" * 256
    val switch = "a" * 128 + "0" * 128 // digits land in a different bin
    val dir = java.nio.file.Files.createTempDirectory("shots")
    Seq((0L, uniform), (1L, switch)).toDF("doc_id", "text")
      .withColumn("source", lit("t")).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = M.q148ShotBoundaries(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === 0L)
    assert(out(1L) >= 1L)
  }

  test("q149 BPE token counts are bounded by char and word counts") {
    val rows = graft.operators.TextOps.q149BpeTokenize(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((_, nWords, nBpe) <- rows)
      assert(nBpe >= nWords,
        "every word is at least one token after 3 merges")
  }

  test("q150 transition mass: per-source shares sum to ~1e6 and total " +
      "count equals events minus first-events") {
    val rows = graft.operators.Extensions
      .q150MarkovTransitions(spark, sf1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val events = graft.sources.Tables.load(spark, sf1, "events")
    val total = events.count()
    val users = events.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === total - users)
    for ((prev, group) <- rows.groupBy(_._1)) {
      val ppm = group.map(_._4).sum
      // integer floor division loses < |group| ppm per source state
      assert(ppm <= 1000000L && ppm > 1000000L - group.length,
        s"$prev shares sum to $ppm")
    }
  }

  test("q151 token budget: kept tokens within budget, kept set is the " +
      "hash-prefix") {
    val P = graft.operators.Pipeline
    val rows = P.q151TokenBudget(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((src, nKept, tok) <- rows) {
      assert(tok <= P.TokenBudget, s"$src kept $tok tokens")
      assert(nKept >= 1L)
    }
  }

  test("q159 systematic picks telescope: per-source pick totals equal " +
      "floor(source weight / stride) exactly") {
    val P = graft.operators.Pipeline
    val picks = P.q159SystematicSample(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(picks.nonEmpty)
    assert(picks.values.forall(_ > 0L))
    // Σ_docs (⌊cum/S⌋ − ⌊(cum−w)/S⌋) telescopes to ⌊total/S⌋ — any
    // dropped doc, double count, or mis-ordered cumsum breaks this
    val totals = graft.sources.Tables.load(spark, sf1, "documents")
      .groupBy("source").agg(sum("n_chars").as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, w) <- totals)
      assert(picks.getOrElse(src, 0L) === w / P.SysStep,
        s"$src: picks ${picks.getOrElse(src, 0L)} != ${w / P.SysStep}")
  }

  test("q163 salted join really keys on (key, salt) and single-exchange " +
      "window queries plan exactly one shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.operators.Extensions.q163SaltedJoin(spark, sf1)
        .queryExecution.executedPlan.toString
      // the join condition must carry the salt — otherwise the hot key
      // still lands on one reducer and the whole construction is a no-op
      assert(plan.contains("_salt"),
        s"salt key missing from the executed join plan:\n$plan")
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", "10485760")
    // the union-and-fill as-of join, the range rolling window, and the
    // rank transform each claim ONE key-partitioned exchange
    for ((name, df) <- Seq(
      "q161" -> graft.operators.Extensions.q161AsofJoin(spark, sf1),
      "q164" -> graft.operators.Extensions.q164RollingWindow(spark, sf1),
      "q165" -> graft.operators.Pipeline.q165RankTransform(spark, sf1))) {
      val plan = df.queryExecution.executedPlan.toString
      val n = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
      assert(n === 1, s"$name expected exactly 1 exchange, got $n:\n$plan")
    }
  }

  test("q165 rank transform matches the strictly-smaller-count model " +
      "(ties share a feature value; untied extremes pin 0 and 1e6)") {
    val rows = graft.operators.Pipeline.q165RankTransform(spark, sf1)
      .join(graft.sources.Tables.load(spark, sf1, "documents")
        .select("doc_id", "n_chars"), "doc_id")
      .select("source", "n_chars", "r_ppm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._1)
    for ((_, g) <- bySrc if g.length > 1) {
      val n = g.length.toLong
      // rank() - 1 = count of strictly smaller values, so the feature
      // is a pure function of the value's position in the distribution
      for ((_, len, ppm) <- g) {
        val smaller = g.count(_._2 < len).toLong
        assert(ppm === smaller * 1000000L / (n - 1),
          s"len $len in group of $n")
      }
      assert(g.filter(_._2 == g.map(_._2).min).forall(_._3 == 0L))
    }
  }

  test("q141 keeps exactly K per source and the kept set is stable") {
    val P = graft.operators.Pipeline
    val a = P.q141GroupSample(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.nonEmpty)
    for ((src, n, _) <- a)
      assert(n === P.GroupSampleK.toLong, s"$src sampled $n")
    val b = P.q141GroupSample(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq === b.toSeq, "checksummed kept set must be stable")
  }

  test("q110/q113 candidate joins are equi-joins, never cartesian") {
    for ((name, df) <- Seq(
        "q110" -> graft.operators.Dedup.q110ContainmentJoin(spark, sf1),
        "q113" -> graft.operators.TextOps.q113FingerprintMatch(spark, sf1))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must pair only via key collisions:\n$plan")
    }
  }

  test("q97 mixture weights scan the corpus exactly once") {
    val plan = graft.operators.Pipeline.q97MixtureWeights(spark, sf1)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1,
      s"totals must derive from the census, not a rescan ($scans):\n$plan")
  }

  test("q99 pagerank never collects: result is a distributed checkpoint") {
    // the API contract is no driver-side rank state; the returned frame
    // is the checkpointed RDD of the last round
    val qe = graft.operators.Graph.q99PageRank(spark, sf1).queryExecution
    assert(qe.executedPlan.toString.contains("Scan ExistingRDD"),
      "final ranks should read the per-round localCheckpoint")
  }

  test("q85 broadcasts the per-stratum rates, not the corpus") {
    val plan = graft.operators.Pipeline.q85StratifiedSample(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rates should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must not shuffle for the rates join:\n$plan")
  }

  test("q86 centroid aggregate runs partial before the exchange") {
    // the posexplode fan-out must be reduced map-side: plan shape is
    // HashAggregate(partial) -> Exchange -> HashAggregate(final)
    val plan = graft.operators.Similarity.q86LabelCentroids(spark, sf1)
      .queryExecution.executedPlan.toString
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs >= 2 && plan.contains("Exchange"),
      s"expected partial+final aggregate around one exchange:\n$plan")
  }

  test("stream-stream interval join attributes purchases to clicks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val joined = EventStream.clickPurchaseJoin(
      input.toDS().toDF(), "2 hours", "INTERVAL 1 HOUR")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attribution_test").start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
        Event(2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 9.0), // in window
        Event(3L, ts("2024-01-01 12:00:00"), 7L, "purchase", 5.0), // too late
        Event(4L, ts("2024-01-01 10:15:00"), 9L, "purchase", 1.0)) // no click
      q.processAllAvailable()
      val rows = spark.table("attribution_test")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((1L, 2L)),
        s"expected exactly click 1 -> purchase 2, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("q514 timer comparator pin: expiry at or below the final " +
    "watermark fires, expiry above it stays armed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, EventStream.RocksDbProvider)
    val input = MemoryStream[Event]
    val q = EventStream.sessionizeWithTimers(
        input.toDS().withWatermark("ts", "0 seconds"),
        EventStream.SessionGapSeconds)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("q514_pin_test").start()
    try {
      // the 10:30:00 event IS the stream max → the watermark parks at
      // 10:30:00.000 ms forever; user 1's expiry (09:30) sits below it,
      // user 2's (10:30) exactly AT it, user 3's (11:00) above
      input.addData(
        Event(1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0),
        Event(2L, ts("2024-01-01 10:00:00"), 2L, "click", 0.0),
        Event(3L, ts("2024-01-01 10:30:00"), 3L, "click", 0.0))
      q.processAllAvailable()
      // the timer fires in the no-data micro-batch that runs after the
      // watermark advances; poll for it rather than racing it
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def fired(): Set[Long] = spark.table("q514_pin_test")
        .filter($"via" === "timer")
        .select("user_id").collect().map(_.getLong(0)).toSet
      while (fired().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(200)
      q.processAllAvailable() // settle any in-flight batch
      val f = fired()
      assert(f.contains(1L), s"expiry below wm must fire, got $f")
      assert(f.contains(2L),
        s"expiry exactly AT wm must fire (inclusive <=), got $f")
      assert(!f.contains(3L), s"expiry above wm must stay armed, got $f")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  test("q514 sf0.001 replay equals the inclusive-comparator model and " +
    "its event rows equal q117's sessionization exactly") {
    val rows = EventStream.q514StreamTimerSessions(spark, sf1).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"),
        r.getAs[Long]("end_s"), r.getAs[Long]("n_events"),
        r.getAs[String]("via")))
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val gap = EventStream.SessionGapSeconds
    val wmMs = ev.map(_._2).max // 0-second delay → wm = max event ms
    val model = ev.groupBy(_._1).flatMap { case (uid, es) =>
      val ss = es.map(_._2 / 1000).sorted
      val sessions = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      var start = ss.head; var last = ss.head; var n = 1L
      ss.tail.foreach { t =>
        if (t - last <= gap) { last = t; n += 1 }
        else { sessions += ((start, last, n)); start = t; last = t; n = 1 }
      }
      sessions += ((start, last, n))
      val closedByEvent = sessions.init.map { case (a, b, c) =>
        (uid, a, b, c, "event") }
      val tail = sessions.last
      val closedByTimer =
        if ((tail._2 + gap) * 1000 <= wmMs)
          Seq((uid, tail._1, tail._2, tail._3, "timer"))
        else Seq.empty
      closedByEvent ++ closedByTimer
    }.toSet
    assert(rows.toSet === model)
    assert(rows.length === model.size, "duplicate emissions")
    // the via='event' rows are exactly q117's declared output
    val q117 = EventStream.q117StreamSessions(spark, sf1).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_s"),
        r.getAs[Long]("end_s"), r.getAs[Long]("n_events"), "event"))
    assert(rows.filter(_._5 == "event").toSet === q117.toSet)
  }

  test("checkpointed stream restarts without reprocessing or duplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-stream-out").toString
    val input = MemoryStream[Event]
    def run(): Unit = {
      val q = input.toDS().toDF()
        .select("event_id", "user_id", "event_type")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    input.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      Event(2L, ts("2024-01-01 10:01:00"), 8L, "view", 0.0))
    run()
    // second incarnation of the query, same checkpoint: only NEW data
    // may be emitted — the committed offsets survive the restart
    input.addData(Event(3L, ts("2024-01-01 10:02:00"), 9L, "click", 2.0))
    run()
    val ids = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L),
      s"restart must not duplicate or drop events, got ${ids.toSeq}")
  }

  test("observe() collects data-quality metrics during the write pass") {
    // production pipelines attach metrics to the job itself — no second
    // scan for row counts / null counts / sums
    val obs = new org.apache.spark.sql.Observation("sink_metrics")
    val df = graft.sources.Tables.load(spark, sf1, "orders")
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
          .as("null_status"),
        min(col("o_orderkey")).as("min_key"))
    val out = java.nio.file.Files
      .createTempDirectory("graft-observe").toString
    df.write.mode("overwrite").format("noop").save(out)
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] === 1500L)
    assert(m("null_status").asInstanceOf[Long] === 0L)
    assert(m("min_key").asInstanceOf[Long] === 0L)
  }

  test("streaming dedup drops in-horizon re-deliveries across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.dedupStream(input.toDS().toDF(), "1 day")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream_test").start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0), // same batch dup
        Event(2L, ts("2024-01-01 10:05:00"), 8L, "view", 0.0))
      q.processAllAvailable()
      input.addData( // cross-batch re-delivery, still within the horizon
        Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        Event(3L, ts("2024-01-01 11:00:00"), 9L, "click", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream_test")
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L),
        s"each event_id must survive exactly once, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("q223 input rankings plan as top-k (TakeOrderedAndProject), " +
    "never a global corpus sort") {
    val df = graft.operators.Pipeline.q223RrfFusion(spark, sf1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"each pool list must be a streaming top-k:\n$plan")
    // the only full Sort allowed is over the fused ≤2k-row frame; a
    // corpus-wide Sort would show as Sort + Exchange rangepartitioning
    // over the document scan — pin its absence
    assert(!plan.contains("rangepartitioning"),
      s"no corpus-wide range sort may appear in the fusion plan:\n$plan")
  }

  test("AQE demotion sentinel: the pinned plan shapes hold under " +
    "adaptive execution ON and OFF") {
    // The suite's other plan assertions run under the session default
    // (AQE on). A Spark upgrade or config drift could silently replan
    // the flagged queries under the OTHER setting — e.g. AQE's runtime
    // join demotion replacing a pinned broadcast chain with sort-merge,
    // or the no-AQE path re-introducing an exchange AQE used to elide.
    // Re-assert the three load-bearing shapes under BOTH settings so a
    // change fails loudly here instead of surfacing as a bench cliff.
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      for (aqe <- Seq("true", "false")) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        // q12: dim chain stays broadcast, never sort-merge
        val p12 = graft.operators.Core.q12MultiwayJoin(spark, sf1)
          .queryExecution.executedPlan.toString
        assert("BroadcastHashJoin".r.findAllIn(p12).size >= 3 &&
          !p12.contains("SortMergeJoin"),
          s"[aqe=$aqe] q12 dim chain demoted:\n$p12")
        // q110: candidates pair only via key collisions
        val p110 = graft.operators.Dedup
          .q110ContainmentJoin(spark, sf1)
          .queryExecution.executedPlan.toString
        assert(!p110.contains("CartesianProduct") &&
          !p110.contains("BroadcastNestedLoopJoin"),
          s"[aqe=$aqe] q110 lost its equi-join shape:\n$p110")
        spark.catalog.clearCache()
        // q89: chunker stays a pure generator pass (zero exchanges)
        val p89 = graft.operators.TextOps
          .q89ChunkDocuments(spark, sf1)
          .queryExecution.executedPlan.toString
        assert(!p89.contains("Exchange"),
          s"[aqe=$aqe] q89 chunking gained a shuffle:\n$p89")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.catalog.clearCache()
    }
  }

  test("q340 KN census: marginals ride broadcast joins, one census " +
    "shuffle family, no sort-merge") {
    val plan = graft.operators.TextOps.q340KneserNey(spark, sf1)
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2,
      s"expected the u1/u2 marginal joins broadcast, found $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a census-sized marginal join was demoted to sort-merge:\n$plan")
    spark.catalog.clearCache()
  }

  test("q344 CKA: the corpus-sized work is ONE census aggregation — " +
    "everything after the gram is broadcast") {
    val plan = graft.operators.Similarity.q344CkaPrefix(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"a census-sized join was demoted to sort-merge:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-dim sums must join the gram census by broadcast:\n$plan")
    spark.catalog.clearCache()
  }

  test("q345 moment-sketch OLS plans as one partial-aggregated scan: " +
    "a single exchange, no join") {
    val plan = graft.operators.Stats.q345OlsMoments(spark, sf1)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected exactly the final-agg single-partition exchange, " +
        s"found $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"OLS must not join:\n$plan")
    assert(plan.contains("partial"),
      s"moment sums must map-side combine:\n$plan")
    spark.catalog.clearCache()
  }

  test("q398 bottom-k sample plans as a partial-combining aggregate — " +
    "no per-stratum rank window, no corpus sort") {
    val plan = graft.operators.Pipeline.q398BottomkSample(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the mergeable aggregator was demoted to a rank window:\n$plan")
    // the typed Aggregator must combine map-side: partial states
    // appear before the stratum exchange
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"),
      s"typed top-k aggregate missing:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"unexpected join in a pure aggregation:\n$plan")
    spark.catalog.clearCache()
  }

  test("q401 slope-one: part joins by broadcast, pairs generated " +
    "in-row (no brand-pair sort-merge join)") {
    val plan = graft.operators.Analytics.q401SlopeOne(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"part dim must broadcast:\n$plan")
    // exactly one join family may shuffle: lineitem⋈orders on orderkey;
    // the pair census must come from the in-row generator, not a join
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 1,
      s"pair generation leaked into a join (found $smj SMJs):\n$plan")
    assert(plan.contains("Generate"),
      s"in-row pair explode missing:\n$plan")
    spark.catalog.clearCache()
  }

  test("q396 Herfindahl: two-level aggregation map-side combines; " +
    "nation name attach broadcasts") {
    val plan = graft.operators.Analytics.q396Herfindahl(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"census must map-side combine:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"25-row nation attach must broadcast:\n$plan")
    spark.catalog.clearCache()
  }

  // ---------------------------------------------------------- session 8

  test("q431 Holm: all ten pair z's ride ONE census window pass (one " +
    "non-broadcast exchange chain, no per-pair rescan)") {
    // the aggregate is localCheckpointed, so the executed plan of the
    // declared result covers only the 10-row step-down — assert the
    // CENSUS plan instead: census + one ordered window = bounded
    // exchange count, independent of the pair count
    val census = graft.sources.Tables.load(spark, sf1, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .groupBy("vc")
      .agg(count(lit(1)).as("c_all"),
        (0 until 5).map(i => sum(when(col("event_type") ===
          Seq("click", "error", "purchase", "signup", "view")(i), 1L)
          .otherwise(0L)).as(s"c$i")): _*)
    val plan = census.queryExecution.executedPlan.toString
    val n = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(n <= 1, s"census should shuffle once, found $n:\n$plan")
  }

  test("q434 RBP: the corpus side joins the broadcast probe batch " +
    "(no corpus-corpus shuffle join)") {
    val plan = graft.operators.Similarity.q434Rbp(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"probe batch must broadcast:\n$plan")
  }

  test("q440 compaction plan: census + ONE ordered window exchange") {
    val plan = graft.operators.Pipeline
      .q440CompactionPlanner(spark, sf1)
      .queryExecution.executedPlan.toString
    val n = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(n <= 2, s"month census + window only, found $n:\n$plan")
  }

  test("q449 audit joins shuffle on their keys — the estimate prices " +
    "the plan that actually runs") {
    val plan = graft.operators.Pipeline
      .q449JoinCardinality(spark, sf1)
      .queryExecution.executedPlan.toString
    // at least one real (non-broadcast) join path exists in the audit
    assert(plan.contains("Join"), s"no join in the audited plan:\n$plan")
  }

  test("q452 Burrows Delta: everything after the token census rides " +
    "the 20-row pivot (pair fold adds no corpus rescan)") {
    val T = graft.operators.TextOps
    val df = T.q452BurrowsDelta(spark, sf1)
    // the pivot is localCheckpointed: the declared result's plan must
    // not scan the documents parquet again
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"pair fold rescans the corpus:\n$plan")
    assert(df.count() === 190L)
  }

  test("q454 payload RLE: the kind census never shuffles payload bytes") {
    val plan = graft.operators.Multimodal.q454PayloadRle(spark, sf1)
      .queryExecution.executedPlan.toString
    // plan text is top-down: operators ABOVE the exchange print before
    // it — payload may appear only below (the typed decode slot)
    val above = plan.substring(0, plan.indexOf("Exchange"))
    assert(!above.toLowerCase.contains("payload#"),
      s"payload column crossed the exchange:\n$plan")
    assert(plan.contains("MapPartitions"),
      "the typed codec slot is gone from the plan")
  }
}
