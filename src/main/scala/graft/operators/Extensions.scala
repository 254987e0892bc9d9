package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** North-star extension surface (SURVEY.md §2.3): the operators a
  * large-scale data pipeline needs beyond the reference's transcripts,
  * declared with the same contract (Spark impl + DuckDB oracle).
  *
  * Determinism rules (SURVEY.md §5.2): sums over money doubles are cast to
  * DECIMAL before aggregation in BOTH engines; orderings always tie-break;
  * float similarity scores are never exposed (ids only, double math on both
  * sides, identical fold order).
  */
object Extensions {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // q20 — hash aggregate with partial (map-side) + final aggregation, the
  // generalization of the reference's count() checks (README.md:596-597).
  // Money doubles go through DECIMAL(18,2) so the sum is order-independent;
  // the final value is surfaced as DOUBLE (a DECIMAL output column reaches
  // the driver's pandas compare as Decimal('x.x0') from Spark parquet but
  // float from DuckDB — exact-decimal→double rounds identically on both
  // engines while cents stay below 2^53, so DOUBLE is the portable carrier).
  def q20GroupbyAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  // q21 — ranking window: top-balance customer per nation (generalizes the
  // clustering-order semantics, README.md:909/913). Tie-break on c_custkey
  // makes the winner deterministic.
  def q21WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
  }

  // q22 — anti join: the rows the reference's inner joins silently drop.
  // Natural FKs in the testdata are fully covered, so the probe is
  // "customers with no P-status order" (non-empty at every sf).
  def q22SemiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val pOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    customer
      .join(pOrders, customer("c_custkey") === pOrders("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Semi-join twin of q22 (EXISTS); unit-tested complement:
    * |semi| + |anti| = |customer|. */
  def q22SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val pOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    customer
      .join(pOrders, customer("c_custkey") === pOrders("o_custkey"),
        "left_semi")
      .select("c_custkey", "c_name")
  }

  // q23 — exact dedup keeping the lowest doc_id per text (deterministic,
  // unlike bare dropDuplicates). At 100 TB this is a single hash shuffle on
  // the dedup key; rank-then-filter avoids a second pass to recover the
  // surviving full row.
  def q23DedupExact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    t(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars")
  }

  // q24 — text stats per language: counts and char/word-length aggregates,
  // integer-only output for engine portability.
  def q24TextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_words", size(split(col("text"), " ")).cast("bigint"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_words")).cast("bigint").as("sum_words"))

  // q25 — brute-force top-k cosine similarity vs probe vector vec_id=0.
  // Float arrays are cast to double BEFORE any arithmetic; the codegen'd
  // vec_dot expression is the same sequential left fold as DuckDB's
  // list_dot_product, so the oracle stays bit-exact. Output is ids only
  // (scores never exposed, SURVEY.md §5.2). The probe is a broadcast 1-row
  // cross join: at scale this is a map-only pass over the embeddings + a
  // TakeOrderedAndProject — no shuffle of the data itself.
  def q25TopkSimilarity(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{register, vec_dot}
    register(s)
    val emb = t(s, dir, "embeddings")
    val probe = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>").as("probe"))
    emb
      .crossJoin(broadcast(probe))
      .withColumn("e", col("embedding").cast("array<double>"))
      .withColumn("sim", vec_dot(col("e"), col("probe")) /
        (sqrt(vec_dot(col("e"), col("e"))) *
          sqrt(vec_dot(col("probe"), col("probe")))))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20)
      .select("vec_id")
  }

  // q26 — event-time tumbling 1-day windows (batch form; the streaming twin
  // lives in graft.streaming). DECIMAL-cast sum for order independence; the
  // window start is surfaced as a DATE so ns-vs-µs precision can't bite
  // (SURVEY.md §7.4 gotcha 4).
  // The aggregation object is shared with graft.streaming.EventStream —
  // stream-batch parity holds by construction (tested in StreamingSpec).
  def q26EventWindows(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.windowedAgg(t(s, dir, "events"))

  // q27 — JSON extraction from the events.props string column.
  def q27JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("bigint").as("k"))

  // q28 — set ops over projected key sets: custkeys partitioned into
  // has-orders (INTERSECT) and no-orders (EXCEPT), tagged and unioned.
  def q28Setops(s: SparkSession, dir: String): DataFrame = {
    val custKeys = t(s, dir, "customer").select(col("c_custkey").as("key"))
    val orderCust = t(s, dir, "orders").select(col("o_custkey").as("key"))
    custKeys.intersect(orderCust).withColumn("tag", lit("has_orders"))
      .unionByName(
        custKeys.except(orderCust).withColumn("tag", lit("no_orders")))
  }

  // q39 — hierarchical subtotals: ROLLUP over returnflag/linestatus (the
  // grouping-sets family; subtotal rows carry NULL keys). The corpus is
  // collapsed to the 6-cell (flag, status) census FIRST and the rollup
  // Expand runs over the census, not the corpus: a naive rollup Expands
  // every input row once per grouping set (×3 here, ×(d+1) generally) —
  // at 100 TB that triples the shuffle for subtotals the cell frame
  // already determines. Counts re-sum and DECIMAL sums re-sum exactly,
  // so the released values are bit-identical to the direct rollup.
  def q39Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n0"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("s0"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum(col("n0")).as("n"),
        sum(col("s0")).cast("double").as("sum_qty"))

  // q40 — full cross-dimensional subtotals: CUBE over status/priority.
  // Same census-first discipline as q39 (cube Expands ×4 per row).
  def q40Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n0"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sum(col("n0")).as("n"))

  // Shared z-score predicate text: identical on both engines so the
  // double arithmetic associates identically. Inputs are exact (integer
  // count; DECIMAL-accumulated sums surfaced as DOUBLE); sqrt is
  // IEEE-exactly-rounded (unlike log), so the threshold compare is
  // bit-deterministic cross-engine.
  // Threshold 1.5σ, not 2σ: c_acctbal is uniform, and a uniform
  // distribution's max deviation is √3·σ ≈ 1.73σ — a 2σ cut would match
  // zero rows at every scale factor, making the differential vacuous.
  // 1.5σ keeps ~13% of a uniform column, so the predicate is exercised
  // on real hits.
  private val zOutlierPred: String =
    "abs(c_acctbal - (s1 / n)) > " +
      "(1.5 * sqrt(((s2 - ((s1 * s1) / n)) / n)))"

  // q82 — per-group statistical outliers: customers beyond 1.5 population
  // standard deviations of their nation's balance. The moments come from
  // ONE aggregate pass (count + exact DECIMAL sum + exact DECIMAL sum of
  // squares — q56's trick at money precision), broadcast back, and the
  // predicate runs at scan speed: the two-pass mean-then-deviation
  // formulation this replaces would read the fact table twice at 100 TB.
  def q82ZscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val dec = col("c_acctbal").cast("decimal(18,2)")
    val stats = c.groupBy("c_nationkey").agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec).cast("double").as("s1"),
      sum((dec * dec).cast("decimal(38,4)")).cast("double").as("s2"))
    c.join(broadcast(stats), "c_nationkey")
      .filter(expr(zOutlierPred))
      .select("c_custkey", "c_nationkey")
  }

  private def q82OracleSql: String =
    s"""WITH stats AS (SELECT c_nationkey,
          CAST(count(*) AS DOUBLE) AS n,
          CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s1,
          CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) *
                        CAST(c_acctbal AS DECIMAL(18,2))
                   AS DECIMAL(38,4))) AS DOUBLE) AS s2
        FROM customer GROUP BY c_nationkey)
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c JOIN stats USING (c_nationkey)
        WHERE $zOutlierPred"""

  // q83 — fixed-width value histogram (distribution profiling): order
  // totals bucketed by floor division. One partial+final aggregate;
  // floor of an IEEE division is deterministic cross-engine. At scale
  // this is the profiling pass that sizes skew mitigations.
  def q83Histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000.0)
        .cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"))

  private def q83OracleSql: String =
    """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
       count(*) AS n
       FROM orders GROUP BY 1"""

  // q77 — correlated subqueries in their SQL form: EXISTS (semi-join
  // decorrelation) and a correlated scalar subquery (left-join +
  // aggregate decorrelation) in one statement. Catalyst rewrites both
  // to the joins q22/q44 declare through the DataFrame API — this
  // declares the SQL SURFACE, and the oracle runs the identical text.
  def q77CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey,
         (SELECT count(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey) AS n_orders
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderstatus = 'P')""")
  }

  // q78 — LATERAL join: per-nation top-2 customers by balance, the
  // correlated table subquery form of q21's rank window. Spark
  // decorrelates the LATERAL (ORDER BY ... LIMIT k) into a ranked
  // window under the hood — same plan family, declared at the SQL
  // surface both engines share.
  def q78Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT n.n_nationkey, t.c_custkey, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""")
  }

  /** Key packing for q92: second-floored epoch × 10^7 + event_id — one
    * BIGINT that orders identically to (ts, event_id), so "latest click"
    * is a plain max over a running window with NO struct-ordering
    * dependence between engines (event ids stay < 10^7 at every sf;
    * epoch·10^7 < 2^63). */
  val AttribKeyScale = 10000000L
  val AttribWindowSec = 3600L

  /** q92 — batch click→purchase ATTRIBUTION, the batch twin of the
    * streaming interval join (EventStream.clickPurchaseJoin): each
    * purchase attributes to the same user's latest click within the
    * preceding hour. One shuffle on user_id, then a running max over
    * the packed (ts, id) key — rows stream through the window in order,
    * state per user is one long. At 100 TB this is the shape that
    * replaces a range self-join (which would blow up on active users). */
  def q92ClickAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("k",
        col("sec") * AttribKeyScale + col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_click_k",
        max(when(col("event_type") === "click", col("k"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_click_k").isNotNull &&
        col("last_click_k") >=
          (col("sec") - AttribWindowSec) * AttribKeyScale)
      .select(
        col("event_id").as("purchase_id"),
        (col("last_click_k") % AttribKeyScale).as("click_id"),
        (col("sec") - expr(s"last_click_k div $AttribKeyScale"))
          .as("gap_s"))
  }

  private def q92OracleSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec,
          CAST(floor(epoch(ts)) AS BIGINT) * $AttribKeyScale + event_id
            AS k
        FROM events WHERE event_type IN ('click', 'purchase')),
        wnd AS (SELECT event_id, event_type, sec, k,
          max(CASE WHEN event_type = 'click' THEN k END) OVER (
            PARTITION BY user_id ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS last_click_k
        FROM e)
        SELECT event_id AS purchase_id,
               last_click_k % $AttribKeyScale AS click_id,
               sec - last_click_k // $AttribKeyScale AS gap_s
        FROM wnd
        WHERE event_type = 'purchase' AND last_click_k IS NOT NULL
          AND last_click_k >= (sec - $AttribWindowSec) * $AttribKeyScale"""

  /** q335 — LINEAR MULTI-TOUCH ATTRIBUTION (the credit model q92
    * deliberately avoids: last-touch hands the whole conversion to ONE
    * click, and every marketing-mix debate starts with "what if we
    * split it" — linear multi-touch divides each purchase equally over
    * ALL of the user's clicks in the preceding hour; this query
    * releases, per purchase, how many touches share the credit and the
    * per-touch share, the table a budget reallocation consumes). The
    * touch count is computed WITHOUT a range self-join (the q169
    * blowup): the user's merged stream carries each click as a +1 and
    * each purchase as TWO zero-weight probes — one at its own packed
    * key, one at the window's lower edge — and one running RANGE-framed
    * sum gives n_touch = cum(hi) − cum(lo). The RANGE frame (not ROWS)
    * makes same-key ties order-independent; the lo probe sits at
    * (sec−3600)·scale + (scale−1), which excludes clicks at exactly
    * t−3600 (the window is (t−3600, t], second granularity) because
    * real event ids stay under scale−1 (the q92 packing contract).
    *
    * Scale shape: one union + one user-partitioned running sum + a
    * self-join of the probe rows on purchase_id (both sides already
    * user-co-partitioned, probe volume = 2·purchases). Linear at any
    * corpus size; per-user state is one long. */
  def q335MultiTouch(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"),
        (col("sec") * AttribKeyScale + col("event_id")).as("k"),
        lit(1L).as("c"), lit(null).cast("long").as("pid"),
        lit(null).cast("string").as("tag"))
    val purch = e.filter(col("event_type") === "purchase")
    val hi = purch.select(col("user_id"),
      (col("sec") * AttribKeyScale + col("event_id")).as("k"),
      lit(0L).as("c"), col("event_id").as("pid"), lit("hi").as("tag"))
    val lo = purch.select(col("user_id"),
      ((col("sec") - AttribWindowSec) * AttribKeyScale
        + (AttribKeyScale - 1)).as("k"),
      lit(0L).as("c"), col("event_id").as("pid"), lit("lo").as("tag"))
    val w = Window.partitionBy("user_id").orderBy("k")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = clicks.unionByName(hi).unionByName(lo)
      .withColumn("cc", sum("c").over(w))
      .filter(col("pid").isNotNull)
    cum.filter(col("tag") === "hi")
      .select(col("pid").as("purchase_id"), col("cc").as("ch"))
      .join(cum.filter(col("tag") === "lo")
        .select(col("pid").as("purchase_id"), col("cc").as("cl")),
        "purchase_id")
      .select(col("purchase_id"),
        (col("ch") - col("cl")).as("n_touch"),
        expr("""CASE WHEN ch - cl = 0 THEN 0
                ELSE 1000000 div (ch - cl) END""").as("credit_each_ppm"))
  }

  private def q335OracleSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events WHERE event_type IN ('click', 'purchase')),
        merged AS (
          SELECT user_id, sec * $AttribKeyScale + event_id AS k,
            CAST(1 AS BIGINT) AS c, NULL AS pid, NULL AS tag
          FROM e WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, sec * $AttribKeyScale + event_id AS k,
            CAST(0 AS BIGINT) AS c, event_id AS pid, 'hi' AS tag
          FROM e WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id,
            (sec - $AttribWindowSec) * $AttribKeyScale
              + ($AttribKeyScale - 1) AS k,
            CAST(0 AS BIGINT) AS c, event_id AS pid, 'lo' AS tag
          FROM e WHERE event_type = 'purchase'),
        cum AS (SELECT user_id, k, pid, tag,
          CAST(sum(c) OVER (PARTITION BY user_id ORDER BY k
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cc
          FROM merged)
        SELECT h.pid AS purchase_id,
          h.cc - l.cc AS n_touch,
          CASE WHEN h.cc - l.cc = 0 THEN 0
            ELSE 1000000 // (h.cc - l.cc) END AS credit_each_ppm
        FROM cum h JOIN cum l ON h.pid = l.pid
        WHERE h.tag = 'hi' AND l.tag = 'lo'"""

  /** q93 — retention COHORTS, the standard engagement report: users
    * grouped by first-activity date, counted per day-offset of later
    * activity. Two aggregations: distinct (user, day) — partial-agg
    * reduces map-side — then cohort assignment via one user-keyed join
    * and an O(cohorts × days) final aggregate. Output is bounded by the
    * date range, not the event volume. */
  def q93RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val first = days.groupBy("user_id").agg(min("d").as("cohort"))
    days.join(first, "user_id")
      .groupBy(col("cohort"),
        datediff(col("d"), col("cohort")).cast("bigint").as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  private def q93OracleSql: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                     FROM events),
        first AS (SELECT user_id, min(d) AS cohort FROM days
                  GROUP BY user_id)
        SELECT cohort,
               CAST(datediff('day', cohort, d) AS BIGINT) AS day_offset,
               CAST(count(DISTINCT days.user_id) AS BIGINT) AS n_users
        FROM days JOIN first ON days.user_id = first.user_id
        GROUP BY cohort, datediff('day', cohort, d)"""

  /** q94 — MERGEABLE partial aggregates, the incremental-pipeline
    * discipline: per-nation stats computed over two disjoint "runs"
    * (even/odd custkey — think daily batches) and then MERGED by
    * re-aggregation, hash-checked against the oracle's single direct
    * pass. Green means the state design is associative — exactly what
    * lets a 100 TB pipeline maintain standing aggregates by folding in
    * each day's partial instead of rescanning history. Money goes
    * through exact DECIMAL cents (BIGINT), so merge order can't move
    * the result. */
  def q94MergeableStats(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      col("c_custkey"), col("c_nationkey"),
      (col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint").as("cents"))
    def run(pred: Column): DataFrame = c.filter(pred)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("cents").cast("bigint").as("sum_cents"))
    run(col("c_custkey") % 2 === 0)
      .unionByName(run(col("c_custkey") % 2 === 1))
      .groupBy("c_nationkey")
      .agg(sum("n").cast("bigint").as("n"),
        sum("sum_cents").cast("bigint").as("sum_cents"))
  }

  private def q94OracleSql: String =
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents
       FROM customer GROUP BY c_nationkey"""

  /** Bloom geometry for q88 is derived from an exact count over the
    * build side (one tiny aggregate job) at 10 bits/item → ~1% nominal
    * false-positive rate, so the 5% bound genuinely constrains the
    * filter AT ANY SCALE FACTOR — a hardcoded size saturates once the
    * build side outgrows it and the FPR bound flips false exactly where
    * the query claims to demonstrate scale. At 100 TB this is how you'd
    * size it too: count(*) over the selective side is negligible next
    * to the probe-side scan it saves. Floor keeps tiny SFs honest. */
  private def bloomGeometry(s: SparkSession): (Long, Long) = {
    val n = math.max(
      s.sql("SELECT count(*) FROM orders WHERE o_orderpriority = '1-URGENT'")
        .head().getLong(0),
      1024L)
    (n, n * 10L)
  }

  /** q88 — Bloom-filter join pruning, the standard 100 TB
    * shuffle-reduction move: build a compact bloom over the selective
    * build side (urgent orders), probe the fact table BEFORE the join
    * shuffle, and only candidates travel. Uses Spark's own
    * BloomFilterAggregate / BloomFilterMightContain (what
    * InjectRuntimeFilter inserts automatically when statistics allow) —
    * declared explicitly here because at 100 TB you size the filter
    * yourself for known build cardinalities. The bloom itself isn't
    * cross-engine comparable, so the declared output pins its
    * CONTRACT, q47/q66-style: the exact match count, zero false
    * negatives (bloom guarantee — a violated probe means a broken
    * filter), and the false-positive rate within 5% of non-matching
    * rows. */
  def q88BloomPrune(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    Tables.registerAll(s, dir)
    val (estItems, numBits) = bloomGeometry(s)
    s.sql(
      s"""WITH bf AS (SELECT bloom_agg(o_orderkey,
                        CAST($estItems AS BIGINT),
                        CAST($numBits AS BIGINT)) AS b
                      FROM orders WHERE o_orderpriority = '1-URGENT'),
          exact AS (SELECT l_orderkey FROM lineitem
                    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                         WHERE o_orderpriority = '1-URGENT')),
          cand AS (SELECT l_orderkey FROM lineitem
                   WHERE bloom_might_contain((SELECT b FROM bf),
                                             l_orderkey))
          SELECT
            (SELECT count(*) FROM exact) AS n_match,
            (SELECT count(*) FROM exact
             WHERE NOT bloom_might_contain((SELECT b FROM bf),
                                           l_orderkey)) = 0
              AS no_false_negatives,
            ((SELECT count(*) FROM cand)
             - (SELECT count(*) FROM exact)) * 20
              <= ((SELECT count(*) FROM lineitem)
                  - (SELECT count(*) FROM exact)) AS fpr_bounded""")
  }

  private def q88OracleSql: String =
    """SELECT (SELECT count(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                   WHERE o_orderpriority = '1-URGENT'))
              AS n_match,
            TRUE AS no_false_negatives,
            TRUE AS fpr_bounded"""

  // q74 — SLIDING event-time windows (q26 is tumbling): 2-day windows
  // every 1 day, so each event lands in exactly two windows. Spark's
  // window() emits both assignments from one scan (an Expand of factor
  // size/slide — the shuffle grows by that factor, the scan doesn't).
  // The oracle reproduces assignment-by-shift: a 2-day window starting
  // at day D contains events of D and D+1, i.e. each event belongs to
  // windows starting at day(ts) and day(ts)-1.
  def q74SlidingWindows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("sum_value"))
      .select(
        col("window.start").cast("date").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  // q73 — arg-extrema aggregates: the customer holding each nation's
  // max/min balance via max_by/min_by (one pass, no rank-window shuffle
  // + filter — the aggregate buffer carries the arg, so this is the
  // cheapest "top-1 per group" form; q21 keeps the window form for
  // general top-N). Ordered by the unique custkey so ties can't differ
  // across engines.
  def q73ArgMinMax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(
        max_by(col("c_name"), col("c_custkey")).as("newest_name"),
        min_by(col("c_name"), col("c_custkey")).as("oldest_name"),
        max(col("c_custkey")).as("max_key"))

  // q69 — distribution-rank window family: NTILE quartiles, percent_rank
  // and cume_dist per nation over (acctbal, custkey). The doubles are
  // exact rationals of row counts ((rank-1)/(n-1), rows<=cur/n) computed
  // identically on both engines, so they hash-compare safely. One
  // shuffle+sort per partition key, same as any rank window.
  def q69RankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).cast("bigint").as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  // q67 — explicit GROUPING SETS (the general form q39/q40 specialize):
  // per-returnflag, per-linestatus, and grand-total groups in ONE pass —
  // Catalyst expands the sets before the same partial/final aggregate
  // pipeline, so shuffle volume stays O(groups). grouping_id()
  // disambiguates which set a row belongs to (both engines put the first
  // grouping column in the most significant bit).
  def q67GroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))

  // q68 — map-typed column manipulation: props JSON parsed to a
  // MapType, then interrogated (size, sorted keys) and transformed
  // (transform_values) without leaving the map domain. At scale the
  // parse and every map op are codegen'd per-row transforms — no
  // shuffle, no UDF.
  def q68MapFuncs(s: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType))
    t(s, dir, "events")
      .withColumn("m", m)
      .select(
        col("event_id"),
        size(col("m")).cast("bigint").as("n_keys"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys"),
        element_at(col("m"), "k").as("k_val"),
        element_at(expr("transform_values(m, (mk, mv) -> mv * 2)"), "k")
          .as("k_doubled"))
  }

  // q41 — sessionization: 30-minute-gap session windows per user (the
  // built-in session_window operator; in streaming the same expression
  // runs with a watermark). Timestamps truncated to seconds on BOTH
  // engines so ns-vs-µs precision can't shift a boundary. Boundary
  // semantics (verified at sf0.1, where an exactly-30-min gap exists):
  // session_window MERGES an event at exactly prev+gap — the oracle's
  // new-session test is therefore strict `>`.
  def q41Sessionize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_s", date_trunc("second", col("ts")))
      .groupBy(session_window(col("ts_s"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts_s")).as("session_end"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_end"), col("n_events"))

  // q43 — scalar-function battery: string/date/math/conditional built-ins
  // in one projection (all codegen'd; no UDFs).
  def q43ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      upper(col("o_orderpriority")).as("prio_upper"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      length(col("o_orderstatus")).cast("bigint").as("status_len"),
      concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))
        .as("status_prio"),
      year(col("o_orderdate")).cast("bigint").as("o_year"),
      month(col("o_orderdate")).cast("bigint").as("o_month"),
      dayofmonth(col("o_orderdate")).cast("bigint").as("o_day"),
      (col("o_orderkey") % 7).as("key_mod"),
      abs(col("o_orderkey") - 1000L).as("key_absdiff"),
      col("o_totalprice").cast("decimal(18,2)").cast("double")
        .as("price_dec"),
      when(col("o_orderstatus") === "P", lit("pending"))
        .when(col("o_orderstatus") === "O", lit("open"))
        .otherwise(lit("done")).as("status_word"),
      coalesce(nullif(col("o_orderstatus"), lit("P")), lit("~"))
        .as("status_or_tilde"))

  // q44 — left outer join: every customer keeps a row even with no
  // P-status order (the unmatched side q22 isolates).
  def q44LeftOuter(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val pOrders = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "P")
      .select("o_orderkey", "o_custkey")
    customer.join(pOrders,
        customer("c_custkey") === pOrders("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"))
  }

  // q45 — full outer join over two partially-overlapping key sets.
  def q45FullOuter(s: SparkSession, dir: String): DataFrame = {
    val evens = t(s, dir, "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("even_key"))
    val thirds = t(s, dir, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("third_key"))
    evens.join(thirds, col("even_key") === col("third_key"), "full_outer")
  }

  // q46 — window frames beyond ranking: running sum, lag, lead over each
  // customer's orders (deterministic order: o_orderkey tie-break; money
  // through DECIMAL so the running fold is exact).
  def q46WindowFrames(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("price_dec"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_total"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
  }

  // q47 — HLL sketch aggregation: approx distinct custkeys per priority.
  // The sketch value itself isn't cross-engine comparable, but its
  // ACCURACY is: the query surfaces the exact count plus a boolean
  // "approx within 5% of exact", and the oracle asserts the same exact
  // count with TRUE — a hash-checkable bound on the estimator instead of
  // a weaker rows-only check. HLL merge is register-wise max, so the
  // estimate is deterministic regardless of partitioning/order.
  // The exact count is computed as a two-level aggregate joined back in,
  // NOT as countDistinct alongside the sketch: mixing a distinct agg with
  // a non-distinct one in a single groupBy makes Catalyst plan an Expand
  // (row duplication per agg family) — 2x the scan volume at 100 TB. Two
  // narrow agg passes + a 5-row join is strictly cheaper.
  def q47ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val approx = orders.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))
    val exact = orders.select("o_orderpriority", "o_custkey").distinct()
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("exact_custs"))
    approx.join(exact, "o_orderpriority")
      .select(
        col("o_orderpriority"),
        col("exact_custs"),
        (abs(col("approx_custs") - col("exact_custs")) <=
          col("exact_custs").cast("double") * 0.05).as("within_5pct"))
  }

  // q48 — column profiling: per-table data-quality stats (row count,
  // null counts, distinct counts, min/max) — the validation pass a
  // pipeline runs before/after every stage.
  def q48Profile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("null_name"),
      countDistinct(col("c_nationkey")).as("n_nations"),
      countDistinct(col("c_mktsegment")).as("n_segments"),
      min(col("c_custkey")).as("min_key"),
      max(col("c_custkey")).as("max_key"))

  // q49 — pivot: priority x status counts widened to one column per
  // status (fixed value list => stable schema; coalesce(0) because
  // Spark's pivot yields NULL for empty combinations while the
  // conditional-aggregation oracle yields 0).
  def q49Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("P", "O", "F"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("P"), lit(0L)).as("n_p"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("F"), lit(0L)).as("n_f"))

  // q50 — unpivot (melt): the q49 wide shape back to long form; zero
  // combos filtered so the result matches a plain GROUP BY at any sf.
  def q50Unpivot(s: SparkSession, dir: String): DataFrame =
    q49Pivot(s, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_p").as("P"), col("n_o").as("O"), col("n_f").as("F")),
        "o_orderstatus", "n")
      .filter(col("n") > 0)

  // q51 — generator/lateral family: explode words with position
  // (posexplode is 0-based; +1 to match SQL WITH ORDINALITY).
  def q51Explode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
      .select(col("doc_id"), (col("pos0") + 1).cast("bigint").as("pos"),
        col("word"))

  // q53 — date arithmetic family: shift, diff, boundary, truncation.
  def q53DateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      to_date(col("o_orderdate")).as("o_date"),
      date_add(to_date(col("o_orderdate")), 7).as("plus_week"),
      datediff(to_date(lit("2024-07-01")), to_date(col("o_orderdate")))
        .cast("bigint").as("days_to_jul"),
      last_day(col("o_orderdate")).as("month_end"),
      to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
      dayofweek(col("o_orderdate")).cast("bigint").as("dow"))

  // q54 — typed JSON parsing into a struct (vs q27's path extraction):
  // schema-checked at plan time, fields projected without re-parsing.
  def q54JsonStruct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("parsed", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .withColumn("pair", struct(col("event_type"), col("user_id")))
      .select(
        col("event_id"),
        col("parsed.k").as("k"),
        col("pair.event_type").as("etype"),
        (col("pair.user_id") % 100).as("user_mod"))

  // q55 — array/collection functions over grouped data: ordered
  // collect_list, slice, size, membership. The sliced prefix is surfaced
  // as a joined STRING, not an array: the driver's pandas compare can't
  // sort/hash ndarray cells (round-1 failure), and string is the portable
  // carrier for list-valued results.
  def q55ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .groupBy("label")
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .select(
        col("label"),
        array_join(transform(slice(col("ids"), 1, 5),
          _.cast("string")), ",").as("first5"),
        size(col("ids")).cast("bigint").as("n"),
        array_contains(col("ids"), 0L).as("has_probe"),
        element_at(col("ids"), -1).as("max_id"))

  // q56 — integer moments per group via the custom DeclarativeAggregate
  // (sum_squares stays fully inside codegen with map-side partials).
  // n²·variance = n·Σk² − (Σk)² is exact integer arithmetic, so group
  // variance becomes differential-safe where a floating stddev is not.
  // Released as var_floor = (n·Σk² − (Σk)²) div n² (re-declared round
  // 12): the raw n²-scaled numerator is ~10²¹ at sf10 — no int64
  // release survives it (the sf10 endurance run failed the original) —
  // while the variance itself is bounded by range²/4 and BIGINT-safe at
  // any SF; the division runs on decimal(38,0)/HUGEINT intermediates.
  // sum_k2's own int64 headroom (Σk² ≈ n³/75) runs out near sf30 — the
  // custom aggregate would need a decimal buffer past that (documented
  // trade; the aggregate demo is the point of this query).
  def q56Moments(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n"),
        sum(col("c_custkey")).as("sum_k"),
        expr("sum_squares(c_custkey)").as("sum_k2"))
      .withColumn("var_floor",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * sum_k2" +
          " - CAST(sum_k AS DECIMAL(38,0)) * sum_k)" +
          " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
  }

  // q57 — as-of join: each event matched to the latest order of the same
  // customer at-or-before the event time. Implemented by composition
  // (preference ladder tier (a)): tag both sides, union, and carry the
  // last order id forward per key with an ordered window — ONE shuffle on
  // the key, same as a sort-merge as-of operator would cost. Orders are
  // pre-deduped per (custkey, orderdate) so ties are deterministic; at
  // equal timestamps the order sorts before the event, giving >= (ASOF)
  // semantics. The oracle is DuckDB's NATIVE ASOF JOIN — two independent
  // implementations of the operator agreeing row-for-row.
  def q57AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("order_id"))
    val oTagged = orders.select(
      col("o_custkey").as("key"), col("o_orderdate").as("t"),
      col("order_id"), lit(1).as("is_order"),
      lit(null).cast("bigint").as("event_id"))
    val eTagged = t(s, dir, "events").select(
      col("user_id").as("key"), date_trunc("second", col("ts")).as("t"),
      lit(null).cast("bigint").as("order_id"), lit(0).as("is_order"),
      col("event_id"))
    val w = Window.partitionBy("key")
      .orderBy(col("t"), col("is_order").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    oTagged.unionByName(eTagged)
      .withColumn("asof_order",
        last(col("order_id"), ignoreNulls = true).over(w))
      .filter(col("event_id").isNotNull)
      .select(col("event_id"), col("asof_order").as("o_orderkey"))
  }

  // q58 — range (theta) join: assign each part to a price band via a
  // non-equi join against a derived 8-row band table. The band side is
  // broadcast, so the theta condition runs as a BroadcastNestedLoopJoin
  // over a tiny build side — the right plan for banding; an equi-join it
  // is not and Spark must not shuffle the fact for it.
  def q58RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(8).select(
      col("id").as("band"),
      (col("id") * 250.0).as("lo"),
      ((col("id") + 1) * 250.0).as("hi"))
    val part = t(s, dir, "part")
    part.join(broadcast(bands),
        part("p_retailprice") >= bands("lo") &&
          part("p_retailprice") < bands("hi"))
      .select(col("p_partkey"), col("band"))
  }

  // q60 — exact percentiles per group (sort-based, not sketch): Spark's
  // `percentile` and DuckDB's `quantile_cont` both linearly interpolate
  // a + (b-a)·frac over the sorted values; from integer inputs every
  // intermediate is exactly representable, so results are bit-equal.
  def q60Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(
        expr("percentile(c_custkey, 0.25)").as("p25"),
        expr("percentile(c_custkey, 0.5)").as("p50"),
        expr("percentile(c_custkey, 0.9)").as("p90"))

  // ---------------------------------------------------------------- q104

  /** q104 — partition ZONE-MAP construction (the data-skipping metadata
    * pass): per natural partition (order month), min/max of the sort
    * key and of the money column, row count, and null count — exactly
    * the per-file statistics a lakehouse table format keeps so that
    * point lookups and range scans prune partitions without reading
    * them. q83 profiles ONE column's value distribution; this builds
    * the multi-column PRUNING INDEX over the layout. Scale shape: one
    * partial+final aggregate, output O(partitions); at 100 TB this runs
    * once per ingest batch and pays for itself on the first pruned
    * scan. */
  def q104PartitionStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).cast("date")
          .as("p_month"),
        col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"),
        col("o_orderstatus"))
      .groupBy("p_month")
      .agg(count(lit(1)).as("n_rows"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
          .cast("bigint").as("n_null_status"))

  private def q104OracleSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS p_month,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
         min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS min_cents,
         max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS max_cents,
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_null_status
       FROM orders GROUP BY 1"""

  // ---------------------------------------------------------------- q106

  /** q106 — WINSORIZATION (percentile clipping), the feature-cleaning
    * pass that caps outliers before normalization: per nation, clip
    * customer balances to the exact [p05, p95] band
    * (percentile_disc semantics: the value at rank ceil(q·n), rank by
    * value — multiset-deterministic, no interpolation, no floats) and
    * report the clipped sum plus how many rows each side touched.
    * Scale shape: ONE shuffle on the group key, total — the rank
    * window, the [lo, hi] bounds (whole-partition window aggregates
    * over the SAME partitioning, so no bounds-join and no second pass
    * over the ranked frame), and the final re-aggregate all share that
    * single exchange (ScalePathSpec pins it). The group-local sort is
    * the honest cost of exact percentiles — the sketch alternative when
    * groups stop fitting is q66. All money in exact cents. */
  def q106Winsorize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy("cents")
    val whole = Window.partitionBy("c_nationkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // percentile_disc(q) = value at rank ceil(q*n): rn*20 >= n picks
    // ranks ≥ n/20 (q=0.05); min over them = the p05 value
    t(s, dir, "customer")
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("lo",
        min(when(col("rn") * 20 >= col("n"), col("cents"))).over(whole))
      .withColumn("hi",
        min(when(col("rn") * 20 >= col("n") * 19, col("cents"))).over(whole))
      .select(col("c_nationkey"),
        greatest(col("lo"), least(col("hi"), col("cents"))).as("clipped"),
        (col("cents") < col("lo")).cast("bigint").as("lo_hit"),
        (col("cents") > col("hi")).cast("bigint").as("hi_hit"))
      .groupBy("c_nationkey")
      .agg(sum("clipped").cast("bigint").as("sum_clipped_cents"),
        sum("lo_hit").cast("bigint").as("n_clipped_lo"),
        sum("hi_hit").cast("bigint").as("n_clipped_hi"))
  }

  private def q106OracleSql: String =
    """WITH c AS (SELECT c_nationkey,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM customer),
        r AS (SELECT c_nationkey, cents,
          row_number() OVER (PARTITION BY c_nationkey ORDER BY cents)
            AS rn,
          count(*) OVER (PARTITION BY c_nationkey) AS n
        FROM c),
        b AS (SELECT c_nationkey,
          min(CASE WHEN rn * 20 >= n THEN cents END) AS lo,
          min(CASE WHEN rn * 20 >= n * 19 THEN cents END) AS hi
        FROM r GROUP BY c_nationkey)
        SELECT r.c_nationkey,
          CAST(sum(greatest(b.lo, least(b.hi, r.cents))) AS BIGINT)
            AS sum_clipped_cents,
          CAST(sum(CASE WHEN r.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT)
            AS n_clipped_lo,
          CAST(sum(CASE WHEN r.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT)
            AS n_clipped_hi
        FROM r JOIN b ON r.c_nationkey = b.c_nationkey
        GROUP BY r.c_nationkey"""

  // ---------------------------------------------------------------- q107

  /** q107 — the classic analytics FLAGSHIP shape (TPC-H Q3 analog,
    * "shipping priority"): selective dimension filter → 3-way join →
    * hash aggregate → global top-10. One query exercising the whole
    * relational pipeline: segment filter pushed into the customer scan,
    * date filters pushed into both fact scans, customer broadcast,
    * orders⋈lineitem shuffled on the key they share, partial+final
    * aggregation, and TakeOrderedAndProject for the limit (k rows per
    * partition travel, never the full aggregate). Revenue in exact
    * cents via floor AFTER the double product — both engines run the
    * identical IEEE multiply then a bit-deterministic floor. */
  def q107ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
          .as("rev_cents"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date")
        .as("o_date"))
      .agg(sum("rev_cents").cast("bigint").as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q107OracleSql: String =
    """SELECT l.l_orderkey,
         CAST(o.o_orderdate AS DATE) AS o_date,
         CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                             * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
         AND l.l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
       ORDER BY revenue_cents DESC, l.l_orderkey
       LIMIT 10"""

  // ---------------------------------------------------------------- q116

  /** q116 — per-nation PARETO FRONT (skyline / dominance filtering):
    * the customers not dominated on (balance, order count) — another
    * customer dominates if ≥ on both dimensions and > on at least one.
    * The multi-objective selection pass curation pipelines run when two
    * quality axes trade off (e.g. doc quality vs length) and no scalar
    * weighting is trusted; ties on both axes are kept (neither
    * dominates). For the 2-D integer case the frontier falls out of TWO
    * window aggregates on one partitioning — no pairwise dominance
    * join: a row is dominated iff a strictly-higher-balance row has
    * n_orders ≥ it (running max over the strict-predecessor RANGE
    * frame) or an equal-balance row has n_orders > it (per-(nation,
    * balance) max). Scale shape: one groupBy shuffle for the order
    * counts, one broadcast-able dim join, one nation-keyed window
    * exchange — the frontier never requires comparing pairs, and the
    * window is per-nation, never a global sort. */
  def q116ParetoFront(s: SparkSession, dir: String): DataFrame = {
    val nOrders = t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val scored = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .join(nOrders, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_nationkey"), col("cents"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    // strict predecessors in the cents ordering: RANGE ... 1 PRECEDING
    // under DESC = rows with cents > current (integer domain)
    val wStrict = Window.partitionBy("c_nationkey")
      .orderBy(col("cents").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy("c_nationkey", "cents")
    scored
      .withColumn("mx_strict", max(col("n_orders")).over(wStrict))
      .withColumn("mx_eq", max(col("n_orders")).over(wEq))
      .filter((col("mx_strict").isNull ||
        col("mx_strict") < col("n_orders")) &&
        col("mx_eq") <= col("n_orders"))
      .select("c_nationkey", "c_custkey", "cents", "n_orders")
  }

  private def q116OracleSql: String =
    """WITH n AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY o_custkey),
        s AS (SELECT c.c_custkey, c.c_nationkey,
          CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents,
          COALESCE(n.n_orders, 0) AS n_orders
        FROM customer c LEFT JOIN n ON c.c_custkey = n.o_custkey),
        m AS (SELECT s.*,
          max(n_orders) OVER (PARTITION BY c_nationkey
            ORDER BY cents DESC
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS mx_strict,
          max(n_orders) OVER (PARTITION BY c_nationkey, cents) AS mx_eq
        FROM s)
        SELECT c_nationkey, c_custkey, cents, n_orders
        FROM m
        WHERE (mx_strict IS NULL OR mx_strict < n_orders)
          AND mx_eq <= n_orders"""

  // ---------------------------------------------------------------- q123

  /** q123 — the BUCKETED co-located fact⋈fact join as a declared query:
    * lineitem and orders are written once as catalog tables bucketed
    * (and per-bucket sorted) on the join key, then sort-merge-joined
    * with ZERO shuffle exchange — bucket i of one table joins bucket i
    * of the other in place. This is the strongest 100 TB join story in
    * the library (the exchange that dominates a petabyte SMJ simply
    * isn't in the plan — asserted in ScalePathSpec/SinkSpec) and was
    * scalatest-only until now; the differential pins its RESULT, not
    * just its shape. The `merge` hints keep the plan a sort-merge join
    * even where the size stats would pick broadcast, so the declared
    * plan is the one that matters at scale. Table (re)creation is
    * idempotent (overwrite) and the bucket write is itself the one-off
    * cost a production pipeline amortizes across every later join on
    * the same key. */
  def q123BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    graft.Sink.writeBucketedTable(
      t(s, dir, "lineitem").select("l_orderkey", "l_linenumber"),
      "l_orderkey", 16, "graft_b_lineitem")
    graft.Sink.writeBucketedTable(
      t(s, dir, "orders").select("o_orderkey", "o_custkey",
        "o_orderstatus"),
      "o_orderkey", 16, "graft_b_orders")
    s.table("graft_b_lineitem").hint("merge")
      .join(s.table("graft_b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("linenumber"),
        col("o_custkey"), col("o_orderstatus"))
  }

  private def q123OracleSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
       o_custkey, o_orderstatus
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""

  /** Bits per dimension of the q129 Morton curve (8 ⇒ 256 buckets per
    * dim, 65 536 z-tiles). */
  val ZBits = 8

  /** z-tiles per file: z div 256 fixes the top $ZBits/2 bits of BOTH
    * dims, so every file covers an exact 16×16 tile of bucket space. */
  val ZFileTiles = 256L

  private def mortonTerms(intDiv: String): String =
    (0 until ZBits).map { i =>
      s"(((bx $intDiv ${1L << i}) % 2) * ${1L << (2 * i)}) + " +
        s"(((by $intDiv ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** q129 — Z-ORDER layout planning: the multi-dimensional clustering
    * step behind data-skipping file layouts (Delta/Iceberg `OPTIMIZE
    * ZORDER BY`): rank-free value bucketing of two dims (l_partkey,
    * l_suppkey) to $ZBits bits each, bit-interleaved into a Morton
    * z-value, files cut every $ZFileTiles z-tiles. Declared output is
    * the per-file min/max stats table — exactly the row-group stats a
    * scan would prune on: because z div $ZFileTiles fixes the high
    * nibble of BOTH dims, every file spans ≤ 16 bucket values in EACH
    * dimension, so a point filter on either column touches ≤ 1/16 of
    * the files (vs everything under a single-column sort's stranger
    * dim).
    *
    * Scale shape: the z-value is one narrow in-row integer expression
    * (the global maxes it buckets against are a one-row broadcast); a
    * production writer would `repartitionByRange(z)` and write — here
    * the declared aggregate groups on the file id, one shuffle of
    * O(files) partial rows. All-integer arithmetic ⇒ bit-exact
    * differential. */
  def q129ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
    val mx = li.agg(max("l_partkey").as("mxp"), max("l_suppkey").as("mxs"))
    li.crossJoin(broadcast(mx))
      .withColumn("bx",
        expr(s"(l_partkey * ${1L << ZBits}) div (mxp + 1)"))
      .withColumn("by",
        expr(s"(l_suppkey * ${1L << ZBits}) div (mxs + 1)"))
      .withColumn("z", expr(mortonTerms("div")))
      .withColumn("file_id", expr(s"z div $ZFileTiles"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min("bx").as("min_x"), max("bx").as("max_x"),
        min("by").as("min_y"), max("by").as("max_y"))
  }

  private def q129OracleSql: String =
    s"""WITH mx AS (SELECT max(l_partkey) AS mxp, max(l_suppkey) AS mxs
          FROM lineitem),
        b AS (SELECT (l_partkey * ${1L << ZBits}) // (mxp + 1) AS bx,
                     (l_suppkey * ${1L << ZBits}) // (mxs + 1) AS by
              FROM lineitem, mx),
        z AS (SELECT bx, by, ${mortonTerms("//")} AS z FROM b)
        SELECT z // $ZFileTiles AS file_id, count(*) AS n,
               min(bx) AS min_x, max(bx) AS max_x,
               min(by) AS min_y, max(by) AS max_y
        FROM z GROUP BY file_id"""

  /** q132 — exact two-sample KOLMOGOROV–SMIRNOV drift statistic, the
    * distribution-shift detector a training pipeline runs between data
    * slices (old vs new crawl, source A vs source B): D = sup|F₁−F₂|
    * over returned-vs-delivered lineitem quantities. Kept entirely in
    * integers — the supremum is reported as max|c₁·n₂ − c₂·n₁| (the
    * KS numerator over the common denominator n₁·n₂) with the smallest
    * quantity attaining it — so the differential is bit-exact with no
    * float CDF anywhere.
    *
    * Scale shape: ONE corpus pass partial-aggregates (qty → c₁, c₂)
    * counts map-side; everything after — cumulative sums, totals, the
    * argmax — rides the DOMAIN-sized frame (≤ 50 rows here; always
    * |value domain|, never |corpus|), so the unpartitioned window is
    * deliberate and safe at any corpus size. */
  def q132KsDrift(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "N"))
      .groupBy(col("l_quantity").cast("bigint").as("qty"))
      .agg(
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("a"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy("qty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    counts
      .withColumn("c1", sum("a").over(w))
      .withColumn("c2", sum("b").over(w))
      .withColumn("n1", sum("a").over(all))
      .withColumn("n2", sum("b").over(all))
      .withColumn("d", abs(col("c1") * col("n2") - col("c2") * col("n1")))
      .orderBy(col("d").desc, col("qty"))
      .limit(1)
      .select("n1", "n2", "d", "qty")
  }

  private def q132OracleSql: String =
    """WITH counts AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
          CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
          CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
               AS BIGINT) AS b
        FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1),
        cum AS (SELECT qty,
          sum(a) OVER (ORDER BY qty
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
          sum(b) OVER (ORDER BY qty
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
          sum(a) OVER () AS n1, sum(b) OVER () AS n2
        FROM counts)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(abs(c1 * n2 - c2 * n1) AS BIGINT) AS d, qty
        FROM cum ORDER BY d DESC, qty LIMIT 1"""

  /** Rows per modeled file block in q158 — the granularity a table
    * format's per-file (or per-row-group) stats describe. */
  val ZoneBlockRows = 4096

  /** q158 — ZONE-MAP pruning stats (Iceberg/Delta file-skipping
    * analog, and the MEASUREMENT companion to q129's layout planner):
    * model the post-`OPTIMIZE` file layout by blocking the
    * shipdate-sorted row order into [[ZoneBlockRows]]-row files, keep
    * each block's (min, max) shipdate zone map, and score a TABLE of
    * predicate date ranges against it — blocks total, blocks pruned
    * (zone disjoint from the range), and the residual row-scan bound.
    * The point the numbers make: skipping is a property of LAYOUT —
    * the same stats on an unsorted layout prune nothing because every
    * block's zone spans the whole domain.
    *
    * Scale shape: the block id comes from a rank over the sort order —
    * in production that rank is free (it IS the file/row-group
    * ordinal of the sorted write, exactly q129's output); the stats
    * pass partial-aggregates to one row per block per partition, and
    * scoring is a broadcast of the O(1)-row predicate table against
    * the O(blocks) stats frame — the corpus itself is read once and
    * never shuffled wholesale (the rank's exchange models the
    * write-time range partition). */
  def q158ZoneMap(s: SparkSession, dir: String): DataFrame = {
    val blocks = t(s, dir, "lineitem")
      .select(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("blk", expr(
        s"""(row_number() OVER (ORDER BY l_shipdate, l_orderkey,
              l_linenumber) - 1) div $ZoneBlockRows"""))
      .groupBy("blk")
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"),
        count(lit(1)).as("n_rows"))
    val preds = s.sql(
      """SELECT * FROM VALUES
           (1, DATE'1995-01-01', DATE'1995-06-30'),
           (2, DATE'1997-01-01', DATE'1997-12-31'),
           (3, DATE'2000-06-01', DATE'2000-12-31'),
           (4, DATE'2001-11-01', DATE'2002-12-31')
         AS t(pred_id, plo, phi)""")
    blocks.crossJoin(broadcast(preds))
      .groupBy("pred_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("hi") < col("plo") || col("lo") > col("phi"), 1L)
          .otherwise(0L)).as("n_pruned"),
        sum(when(col("hi") < col("plo") || col("lo") > col("phi"), 0L)
          .otherwise(col("n_rows"))).as("rows_after_skip"))
  }

  private def q158OracleSql: String =
    s"""WITH ranked AS (SELECT l_shipdate,
          (row_number() OVER (ORDER BY l_shipdate, l_orderkey,
             l_linenumber) - 1) // $ZoneBlockRows AS blk
        FROM lineitem),
        blocks AS (SELECT blk, min(l_shipdate) AS lo,
              max(l_shipdate) AS hi, CAST(count(*) AS BIGINT) AS n_rows
            FROM ranked GROUP BY blk),
        preds(pred_id, plo, phi) AS (VALUES
            (1, DATE '1995-01-01', DATE '1995-06-30'),
            (2, DATE '1997-01-01', DATE '1997-12-31'),
            (3, DATE '2000-06-01', DATE '2000-12-31'),
            (4, DATE '2001-11-01', DATE '2002-12-31'))
        SELECT pred_id, CAST(count(*) AS BIGINT) AS n_blocks,
          CAST(sum(CASE WHEN hi < plo OR lo > phi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pruned,
          CAST(sum(CASE WHEN hi < plo OR lo > phi THEN 0 ELSE n_rows END)
               AS BIGINT) AS rows_after_skip
        FROM blocks, preds GROUP BY pred_id"""

  /** q160 — FORWARD FILL imputation (`LAST_VALUE IGNORE NULLS`): carry
    * each user's most recent purchase amount forward onto every later
    * event (gap-filling time series before feature extraction — the
    * imputation shape every sessionized feature pipeline needs).
    * Ordering rides the portable collision-free (event-time, event_id)
    * key (q92's convention); amounts quantize to DECIMAL(18,2) once so
    * both engines carry identical values; events before a user's first
    * purchase stay NULL — visible, not invented.
    *
    * Scale shape: ONE user-keyed exchange carries the whole window
    * pass (the q143 single-exchange discipline); the running
    * `last(ignoreNulls)` is O(1) state per row within a partition. */
  def q160ForwardFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        (unix_timestamp(col("ts")) * 10000000L + col("event_id"))
          .as("k"),
        when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)")).as("pv"))
      .withColumn("filled", last("pv", ignoreNulls = true).over(w))
      // exact DECIMAL carries the fill; surface as DOUBLE — a decimal
      // output column reaches the driver's pandas compare as
      // Decimal('16.81') from Spark parquet but float from DuckDB
      // (the q26 rule: never emit DECIMAL in a compared result)
      .select(col("event_id"), col("filled").cast("double").as("filled"))
  }

  private def q160OracleSql: String =
    """WITH e AS (SELECT event_id, user_id,
          epoch_ns(ts) // 1000000000 * 10000000 + event_id AS k,
          CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(18,2)) END AS pv
        FROM events)
        SELECT event_id,
          CAST(last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS filled
        FROM e"""

  /** q161 — AS-OF JOIN (point-in-time temporal join): each event joined
    * to the SAME user's most recent order at-or-before the event date —
    * the feature-extraction join every training pipeline runs against a
    * dimension that changes over time (price books, account states,
    * model registries). The dimension is deliberately incomplete (cust
    * keys ≡ 3 mod 7 withheld) so events before/without any snapshot row
    * surface as NULL — visible, not invented (q160's discipline).
    *
    * Implementation is the union-and-fill shape, not a per-row range
    * probe: both sides union into one frame ordered by (date, side,
    * tiebreak) with orders sorting BEFORE events on the same date
    * (at-or-before includes same-day rows) and same-day orders in key
    * order (so the fill carries the max orderkey — a deterministic
    * tie-break, where a native ASOF join leaves ties ambiguous); one
    * `last(ignoreNulls)` window per carried attribute reads the most
    * recent order row. The two fills come from the SAME row because
    * order attributes are null/non-null together.
    *
    * Scale shape: ONE user-keyed exchange carries the whole join — no
    * range-condition explosion (a naive `d1 <= d2` theta-join admits
    * O(events × orders) per user before picking the max), no per-row
    * subquery; O(1) fill state per row within a partition. */
  def q161AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_custkey") % 7 =!= 3)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("d"),
        lit(0).as("side"), col("o_orderkey").as("tb"),
        col("o_orderkey").as("ok"), col("o_orderdate").as("od"),
        lit(null).cast("bigint").as("event_id"))
    val e = t(s, dir, "events")
      .select(col("user_id").as("k"), col("ts").cast("date").as("d"),
        lit(1).as("side"), col("event_id").as("tb"),
        lit(null).cast("bigint").as("ok"),
        lit(null).cast("date").as("od"), col("event_id"))
    val w = Window.partitionBy("k").orderBy("d", "side", "tb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("asof_orderkey", last("ok", ignoreNulls = true).over(w))
      .withColumn("fod", last("od", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("asof_orderkey"),
        datediff(col("d"), col("fod")).cast("bigint").as("lag_days"))
  }

  private def q161OracleSql: String =
    """WITH u AS (
        SELECT o_custkey AS k, o_orderdate AS d, 0 AS side,
               o_orderkey AS tb, o_orderkey AS ok, o_orderdate AS od,
               CAST(NULL AS BIGINT) AS event_id
        FROM orders WHERE o_custkey % 7 <> 3
        UNION ALL
        SELECT user_id, CAST(ts AS DATE), 1, event_id, NULL, NULL,
               event_id
        FROM events),
        f AS (SELECT *,
          last_value(ok IGNORE NULLS) OVER (PARTITION BY k
            ORDER BY d, side, tb
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS asof_orderkey,
          last_value(od IGNORE NULLS) OVER (PARTITION BY k
            ORDER BY d, side, tb
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fod
        FROM u)
        SELECT event_id, asof_orderkey,
               CAST(date_diff('day', fod, d) AS BIGINT) AS lag_days
        FROM f WHERE side = 1"""

  /** q162 — ROBUST outlier detection via MAD (median absolute
    * deviation): q82's z-score cut is itself skewed by the outliers it
    * hunts (mean and sigma both move); the MAD cut is the robust
    * standard — per event type, lower-median of value cents, lower-
    * median of |x − med|, flag |x − med| > 3·MAD. All integer (cents,
    * rank positions, exact medians-by-rank) — no float quantile
    * interpolation to diverge cross-engine; the exponential-tailed
    * value column keeps the cut non-vacuous at every SF (~2.3% flagged,
    * where the same cut on uniform doc lengths matches nothing — the
    * q82 vacuity lesson applied).
    *
    * Scale shape: ONE event_type-keyed exchange carries both median
    * ranks (two Sorts, same partitioning — no second shuffle) and the
    * final rollup collapses in-partition. Medians-by-rank sort the
    * partition, not the cluster: at huge groups the two-pass histogram
    * threshold (q90's trick) computes the same rank element without a
    * full sort. */
  def q162MadOutliers(s: SparkSession, dir: String): DataFrame = {
    val wp = Window.partitionBy("event_type")
    val wr = wp.orderBy("cents", "event_id")
    val wd = wp.orderBy("dev", "event_id")
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .withColumn("rn", row_number().over(wr))
      .withColumn("cnt", count(lit(1)).over(wp))
      .withColumn("med",
        max(when(expr("rn = (cnt + 1) div 2"), col("cents"))).over(wp))
      .withColumn("dev", abs(col("cents") - col("med")))
      .withColumn("rn2", row_number().over(wd))
      .withColumn("mad",
        max(when(expr("rn2 = (cnt + 1) div 2"), col("dev"))).over(wp))
      .groupBy("event_type")
      .agg(max("med").as("med"), max("mad").as("mad"),
        sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L))
          .as("n_out"),
        coalesce(sum(when(col("dev") > lit(3) * col("mad"),
          col("event_id"))), lit(0L)).as("id_checksum"))
  }

  private def q162OracleSql: String =
    """WITH e AS (SELECT event_id, event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
        d AS (SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY cents, event_id) AS rn,
          count(*) OVER (PARTITION BY event_type) AS cnt FROM e),
        m AS (SELECT *, max(CASE WHEN rn = (cnt+1)//2 THEN cents END)
            OVER (PARTITION BY event_type) AS med FROM d),
        v AS (SELECT *, abs(cents - med) AS dev,
          row_number() OVER (PARTITION BY event_type
            ORDER BY abs(cents - med), event_id) AS rn2 FROM m),
        w AS (SELECT *, max(CASE WHEN rn2 = (cnt+1)//2 THEN dev END)
            OVER (PARTITION BY event_type) AS mad FROM v)
        SELECT event_type, max(med) AS med, max(mad) AS mad,
          CAST(sum(CASE WHEN dev > 3*mad THEN 1 ELSE 0 END) AS BIGINT)
            AS n_out,
          CAST(coalesce(sum(CASE WHEN dev > 3*mad THEN event_id END), 0)
            AS BIGINT) AS id_checksum
        FROM w GROUP BY event_type"""

  /** Salt fan-out for q163 — how many reducers a hot key is split
    * across. */
  val NumSalts = 8

  /** q163 — SKEW-SALTED equi-join, declared (previously scalatest-only
    * machinery): the lineitem fact side salted across [[NumSalts]]
    * splits, orders replicated per salt, joined on (key, salt), then
    * rolled up per order priority. The output is identical to the
    * unsalted join — which IS the DuckDB oracle, so the differential
    * itself proves salting is result-transparent.
    *
    * Scale shape: this is the plan-level answer when a known-hot key
    * (the null-ish "unknown" holding 30% of a 100 TB fact) must be
    * split BEFORE the shuffle — AQE skew-split handles sort-merge skew
    * at runtime, salting handles it by construction: the hot key's rows
    * land on [[NumSalts]] reducers instead of one, at the cost of
    * replicating the (much smaller) dim side's shuffle volume.
    * ScalePathSpec asserts the join really keys on (key, salt). */
  def q163SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    val dim = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    Skew.saltedEquiJoin(fact, dim, "l_orderkey", "o_orderkey", NumSalts)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast("double").as("sum_qty"))
  }

  private def q163OracleSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority"""

  /** q508's planted hot key: lineitem rows whose orderkey ends in 0, 1,
    * or 2 all collapse onto key 0 — ~30% of the fact on ONE join key,
    * the "unknown id" pathology AQE's skew split and q163's salt both
    * exist for. */
  val AqeHotMod = 10L
  val AqeHotLim = 3L

  private[graft] def aqeSkewSides(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val fact = t(s, dir, "lineitem")
      .select(
        when(col("l_orderkey") % AqeHotMod < AqeHotLim, 0L)
          .otherwise(col("l_orderkey")).as("k"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    val dim = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    (fact, dim)
  }

  /** q508 — AQE SKEW-SPLIT vs MANUAL SALT parity (the declared proof of
    * WHEN q65/q163's salting is no longer needed: since Spark 3, AQE
    * splits an oversized sort-merge partition at runtime into
    * threshold-sized slices and joins each against a replicated other
    * side — semantically exactly the salt-and-replicate rewrite, chosen
    * from MEASURED partition bytes instead of a hand-declared hot key).
    * Both paths run here over the same planted-skew join ([[AqeHotMod]]:
    * ~30% of lineitem collapsed onto key 0): path A a plain `merge`-
    * hinted sort-merge join — the shape AQE re-plans at scale (the hint
    * also keeps the dim from broadcasting at test SFs, where a broadcast
    * would dodge the skew entirely); path B [[Skew.saltedEquiJoin]] with
    * [[NumSalts]] splits. Released per priority: the rollup plus both
    * paths' counts and `paths_agree` — the differential hashes the
    * equality itself. SkewSpec additionally executes path A with the AQE
    * skew thresholds forced low and asserts the adaptive plan really
    * contains a skew=true sort-merge join with identical results: the
    * plan-level evidence, at test scale, of the runtime split.
    *
    * Scale rule this documents: prefer AQE's split (zero code, measured,
    * handles skew you didn't predict) and keep salting for the cases AQE
    * can't reach — aggregation hot keys before a shuffle, skew on the
    * BUILD side of a must-broadcast join, or engines/stages where the
    * runtime re-plan is unavailable (structured streaming state joins).
    *
    * Scale shape: path A is one exchange per side + SMJ (AQE splits the
    * hot partition at runtime); path B replicates the dim ×[[NumSalts]];
    * the parity join is a 5-row broadcast. */
  def q508AqeSkewParity(s: SparkSession, dir: String): DataFrame = {
    val (fact, dim) = aqeSkewSides(s, dir)
    val plain = fact.hint("merge")
      .join(dim, col("k") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_aqe"),
        sum(col("qty")).cast("double").as("sum_aqe"))
    val salted = Skew
      .saltedEquiJoin(fact, dim, "k", "o_orderkey", NumSalts)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_salted"),
        sum(col("qty")).cast("double").as("sum_salted"))
    plain.join(broadcast(salted), Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_aqe"), col("n_salted"),
        col("sum_aqe"),
        (col("n_aqe") === col("n_salted") &&
          col("sum_aqe") === col("sum_salted")).as("paths_agree"))
  }

  private def q508OracleSql: String =
    s"""WITH f AS (SELECT CASE WHEN l_orderkey % $AqeHotMod < $AqeHotLim
            THEN 0 ELSE l_orderkey END AS k,
          CAST(l_quantity AS DECIMAL(18,2)) AS qty FROM lineitem),
        g AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(qty) AS DOUBLE) AS sum_qty
          FROM f JOIN orders ON k = o_orderkey
          GROUP BY o_orderpriority)
        SELECT o_orderpriority, n AS n_aqe, n AS n_salted,
          sum_qty AS sum_aqe, TRUE AS paths_agree
        FROM g"""

  /** Rolling-window width for q164, in seconds. */
  val RollWindowSec = 86400L

  /** q164 — TIME-RANGE rolling aggregate (`RANGE BETWEEN <interval>
    * PRECEDING`): each event's trailing-24h per-user activity — count
    * and exact decimal sum of event values — the rolling-feature shape
    * (trailing spend, trailing request rate) that tumbling (q26) and
    * stepped-sliding (q74) windows can't express because every ROW
    * anchors its own window. A RANGE frame on the integer epoch-second
    * axis is also tie-robust: rows sharing a timestamp see the same
    * frame regardless of their relative order, so no tiebreak key is
    * even needed for determinism.
    *
    * Scale shape: ONE user-keyed exchange; the frame is maintained as a
    * sliding two-pointer over the sorted partition (O(1) amortized per
    * row), never re-scanned per row. */
  def q164RollingWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("k")
      .rangeBetween(-RollWindowSec, 0L)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("k"),
        col("value").cast("decimal(18,2)").as("v"))
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_win"),
        sum("v").over(w).cast("double").as("roll_sum"))
  }

  private def q164OracleSql: String =
    s"""WITH e AS (SELECT event_id, user_id,
          epoch_ns(ts) // 1000000000 AS k,
          CAST(value AS DECIMAL(18,2)) AS v FROM events)
        SELECT event_id, CAST(count(*) OVER w AS BIGINT) AS n_win,
               CAST(sum(v) OVER w AS DOUBLE) AS roll_sum
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY k
          RANGE BETWEEN $RollWindowSec PRECEDING AND CURRENT ROW)"""

  /** Anonymity threshold for q167 — classes smaller than this are
    * re-identification risks. */
  val KAnon = 5

  /** q167 — K-ANONYMITY audit (privacy governance for training data):
    * customers bucketed by quasi-identifier combination (nation,
    * market segment, account-balance band) — the attributes an
    * adversary could link from outside — and every equivalence class
    * smaller than [[KAnon]] flagged as a re-identification risk. Output
    * per nation: row/class counts, risky-row count, and a checksum
    * pinning exactly WHICH rows are risky (the set a suppression or
    * generalization pass must treat).
    *
    * Scale shape: class sizes come from a partial-aggregated groupBy
    * on the QI key (map-side combine to ≤ |classes| rows per
    * partition — the corpus never crosses the wire row-by-row, unlike
    * a window-over-rows formulation), and the per-nation rollup runs
    * over the |classes|-sized frame. */
  def q167KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val classes = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment").as("seg"),
        expr("""CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                div 100000""").as("band"))
      .groupBy("c_nationkey", "seg", "band")
      .agg(count(lit(1)).as("cls"), sum("c_custkey").as("cks"))
    classes.groupBy("c_nationkey")
      .agg(sum("cls").as("n_rows"), count(lit(1)).as("n_classes"),
        sum(when(col("cls") < KAnon, col("cls")).otherwise(0L))
          .as("n_risky_rows"),
        coalesce(sum(when(col("cls") < KAnon, col("cks"))), lit(0L))
          .as("risky_checksum"))
  }

  private def q167OracleSql: String =
    s"""WITH q AS (SELECT c_custkey, c_nationkey, c_mktsegment AS seg,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            // 100000 AS band
        FROM customer),
        cls AS (SELECT c_nationkey, seg, band,
            CAST(count(*) AS BIGINT) AS cls,
            CAST(sum(c_custkey) AS BIGINT) AS cks
          FROM q GROUP BY c_nationkey, seg, band)
        SELECT c_nationkey, CAST(sum(cls) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_classes,
          CAST(sum(CASE WHEN cls < $KAnon THEN cls ELSE 0 END) AS BIGINT)
            AS n_risky_rows,
          CAST(coalesce(sum(CASE WHEN cls < $KAnon THEN cks END), 0)
            AS BIGINT) AS risky_checksum
        FROM cls GROUP BY c_nationkey"""

  /** Diversity threshold for q217 — classes whose sensitive attribute
    * takes fewer than this many distinct values are homogeneity-risky. */
  val LDiv = 3L

  /** q217 — L-DIVERSITY audit (Machanavajjhala et al., "l-Diversity:
    * Privacy Beyond k-Anonymity", 2007): q167's k-anonymity counts how
    * SMALL a quasi-identifier class is, but a large class is still a
    * disclosure if every member shares one sensitive value — the
    * homogeneity attack. Here the QI is (nation, balance band), the
    * sensitive attribute is the market segment, and each class reports
    * its distinct-sensitive-value count l; per nation the audit
    * declares class/row counts, the worst (minimum) l, and how many
    * classes/rows sit below l = [[LDiv]]. Together q167 + q217 are the
    * standard pre-release privacy gate pair for tabular training data.
    *
    * Scale shape: one class census with a count-distinct (plans as the
    * standard two-phase expand, both phases partial-aggregated) + one
    * nation-keyed rollup of the class-sized frame — linear, nothing
    * corpus-sized after the first aggregate. */
  def q217LDiversity(s: SparkSession, dir: String): DataFrame = {
    val classes = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment").as("seg"),
        expr("""CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                div 100000""").as("band"))
      .groupBy("c_nationkey", "band")
      .agg(count(lit(1)).as("cls"), countDistinct("seg").as("l"))
    classes.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_classes"), sum("cls").as("n_rows"),
        min("l").as("min_l"),
        sum(when(col("l") < LDiv, 1L).otherwise(0L))
          .as("n_low_div_classes"),
        sum(when(col("l") < LDiv, col("cls")).otherwise(0L))
          .as("n_rows_at_risk"))
  }

  private def q217OracleSql: String =
    s"""WITH q AS (SELECT c_custkey, c_nationkey, c_mktsegment AS seg,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            // 100000 AS band
        FROM customer),
        cls AS (SELECT c_nationkey, band,
            CAST(count(*) AS BIGINT) AS cls,
            CAST(count(DISTINCT seg) AS BIGINT) AS l
          FROM q GROUP BY c_nationkey, band)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_classes,
          CAST(sum(cls) AS BIGINT) AS n_rows,
          CAST(min(l) AS BIGINT) AS min_l,
          CAST(sum(CASE WHEN l < $LDiv THEN 1 ELSE 0 END) AS BIGINT)
            AS n_low_div_classes,
          CAST(sum(CASE WHEN l < $LDiv THEN cls ELSE 0 END) AS BIGINT)
            AS n_rows_at_risk
        FROM cls GROUP BY c_nationkey"""

  /** Trailing window (hours) and burst threshold (ppm of the trailing
    * hourly average) for q219. 1.5× is deliberately tight enough to
    * fire on this Poisson-ish corpus at every SF — the operator's
    * mechanics, not an alert tuning, are what's declared. */
  val BurstWindowH = 24
  val BurstThresholdPpm = 1500000L

  /** q219 — RATE-BURST DETECTION per event type (the ops-monitoring
    * twin of q198's CUSUM level-shift detector: CUSUM finds sustained
    * changes in a DAILY value series, this flags individual HOURS whose
    * event rate exceeds the trailing-24h hourly average by the
    * threshold — bot spikes, replay storms, flash events). All-integer:
    * the ratio is c·24·10⁶ div trail (cross-multiplied, no float
    * rates); hours with an incomplete trailing window (the first 24 per
    * type) are excluded from evaluation. Declared per type: evaluated
    * hours, burst count, and the worst ratio in ppm.
    *
    * Scale shape: ONE (type, hour) census shuffle over the corpus
    * (partial-aggregated); the trailing RANGE window, the per-type min,
    * and the final rollup all ride the domain-sized census frame
    * (types × hours) on one type-keyed exchange. Zero-count hours are
    * absent rows and contribute 0 to the RANGE sum exactly. */
  def q219BurstDetection(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "events")
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("c"))
    val wt = Window.partitionBy("event_type").orderBy("h")
      .rangeBetween(-BurstWindowH, -1)
    val wm = Window.partitionBy("event_type")
    census
      .withColumn("trail", coalesce(sum("c").over(wt), lit(0L)))
      .withColumn("hmin", min("h").over(wm))
      .filter(col("h") >= col("hmin") + BurstWindowH)
      .withColumn("ratio_ppm",
        expr(s"(c * $BurstWindowH * 1000000) div greatest(trail, 1)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_eval_hours"),
        sum(when(col("ratio_ppm") > BurstThresholdPpm, 1L).otherwise(0L))
          .as("n_bursts"),
        max("ratio_ppm").as("max_ratio_ppm"))
  }

  private def q219OracleSql: String =
    s"""WITH k AS (SELECT event_type,
          ((epoch_ns(ts) // 1000000000) // 3600) AS h FROM events),
        c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
              FROM k GROUP BY 1, 2),
        t AS (SELECT *, COALESCE(sum(c) OVER (PARTITION BY event_type
              ORDER BY h RANGE BETWEEN $BurstWindowH PRECEDING
                AND 1 PRECEDING), 0) AS trail,
            min(h) OVER (PARTITION BY event_type) AS hmin FROM c),
        e AS (SELECT *, (c * $BurstWindowH * 1000000)
              // greatest(trail, 1) AS ratio_ppm
            FROM t WHERE h >= hmin + $BurstWindowH)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval_hours,
          CAST(sum(CASE WHEN ratio_ppm > $BurstThresholdPpm
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
          CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm
        FROM e GROUP BY event_type"""

  /** q168 — EQUI-DEPTH HISTOGRAM construction (the ANALYZE-statistics
    * op behind CBO selectivity estimates and range-partition planning,
    * the value-domain complement of q83's equi-WIDTH histogram): per
    * return flag, extended-price cents split into 10 equal-count
    * buckets by exact rank, each bucket reporting its upper boundary
    * and row count. The boundaries are what a range partitioner or
    * optimizer consumes; exact integer ranks make them
    * engine-portable where sampled/interpolated quantiles are not.
    *
    * Scale shape: ONE flag-keyed exchange carries the rank sort; the
    * bucket rollup groups by (flag, bucket) — a superset of the
    * window's partitioning key, so Catalyst reuses the exchange. At
    * production scale the q90 histogram-threshold pass replaces the
    * full sort: a value census + cumsum over distinct values yields
    * the same boundaries. */
  def q168EquidepthHistogram(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("flag")
    t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT)""").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(
        w.orderBy("cents", "l_orderkey", "l_linenumber")))
      .withColumn("cnt", count(lit(1)).over(w))
      .groupBy(col("flag"),
        expr("((rn - 1) * 10) div cnt").as("bucket"))
      .agg(max("cents").as("hi_cents"), count(lit(1)).as("n_rows"))
  }

  private def q168OracleSql: String =
    """WITH d AS (SELECT l_returnflag AS flag,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents, l_orderkey, l_linenumber
        FROM lineitem),
        r AS (SELECT *, row_number() OVER (PARTITION BY flag
            ORDER BY cents, l_orderkey, l_linenumber) AS rn,
          count(*) OVER (PARTITION BY flag) AS cnt FROM d)
        SELECT flag, ((rn - 1) * 10) // cnt AS bucket,
          CAST(max(cents) AS BIGINT) AS hi_cents,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM r GROUP BY flag, bucket"""

  /** Bucket width for q169's interval binning, in q92-key units
    * (one hour of event time). */
  val IntervalBucket: Long = 3600L * AttribKeyScale

  /** Endpoint record for q169's sweep. `probe`=0 is an interval-start
    * MARKER (carries cnt=1 and the interval's checksum key in `w`);
    * `probe`=1 is a census PROBE at pos=f (sign −1) or pos=t (sign +1)
    * carrying the key in `w`. Markers sort before probes at equal
    * (state, pos) so an interval's own start is inside both of its
    * probe reads and cancels. */
  private[graft] case class IntervalEp(
      state: String, pos: Long, probe: Int, cnt: Long, w: Long, sign: Long)

  /** q169 — INTERVAL OVERLAP JOIN at scale: q143's per-user state runs
    * joined against each other for cross-user pairs of OVERLAPPING
    * same-type intervals (concurrent same-activity detection — the
    * interval-intersection shape behind co-occurrence, conflict, and
    * capacity analysis). Declared output is the per-type pair census +
    * an id checksum over the exact pair set.
    *
    * Scale shape — rewritten in round 8 after the scaling harness
    * (SCALING.md) measured the previous hour-bucket equi-join at
    * exponent ~1.9: the events TIME SPAN is fixed while users grow, so
    * per-(type, hour) cell population grows ∝ corpus and Σ|cell|² is
    * QUADRATIC (measured 273k → 23.9M candidates for a 10× step — and
    * the true pair set is itself quadratic, 47.6k → 4.68M). Since the
    * DECLARED output is only the per-type census, the scalable
    * algorithm is the classic ENDPOINT SWEEP, enumerating no pairs:
    * pairs(type) = Σᵢ [C(tᵢ) − C(fᵢ)] and checksum(type) =
    * Σᵢ [(S(tᵢ) + keyᵢ·C(tᵢ)) − (S(fᵢ) + keyᵢ·C(fᵢ))], where C(x)/S(x)
    * are the running count/key-sum of interval STARTS at pos ≤ x —
    * each unordered pair is counted exactly once, at its later-starting
    * member (positions are globally unique event keys, so no ties;
    * same-user same-type runs are disjoint by construction, so the
    * u1<u2 exclusion is automatic). Distributed as a two-pass
    * range-partitioned prefix sum: ONE range exchange on
    * (state, pos, probe) + in-partition sort; pass 1 collects
    * O(partitions × types) per-(partition, type) marker totals to the
    * driver (bounded like q88's one-row head, documented); pass 2
    * streams each sorted partition once with running (C, S) seeded from
    * the broadcast offsets, probes emitting their signed census reads;
    * a types-sized aggregate finishes. O(n log n) total work, O(n)
    * shuffle volume, no join anywhere — this is the mapPartitions
    * escape hatch used for what it's genuinely for (per-partition
    * sequential scan state). Checksum bound: intermediate signed terms
    * stay under ~4·n²·max_key, documented-long-safe through ~10⁷
    * intervals; beyond that the DECLARED checksum value itself
    * outgrows BIGINT, an output-contract bound, not an algorithm one.
    * The oracle still states the SEMANTIC — a plain theta join —
    * keeping the declared contract implementation-free; an in-engine
    * test pins sweep ≡ direct theta join, and PropertySpec pins
    * partitioning-invariance. */
  def q169IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("k")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"))
      .withColumn("newrun",
        when(lag("event_type", 1).over(w) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("seq", sum("newrun").over(cum))
      .groupBy("user_id", "seq")
      .agg(max("event_type").as("state"),
        min("k").as("f"), max("k").as("t"))
      // the pair-checksum weight: each pair contributes key_a + key_b
      .withColumn("key", col("user_id") + col("seq"))
    val marks = iv.select(col("state"), col("f").as("pos"),
      lit(0).as("probe"), lit(1L).as("cnt"), col("key").as("w"),
      lit(0L).as("sign"))
    val probes = iv.select(col("state"), col("f").as("pos"),
        lit(1).as("probe"), lit(0L).as("cnt"), col("key").as("w"),
        lit(-1L).as("sign"))
      .unionByName(iv.select(col("state"), col("t").as("pos"),
        lit(1).as("probe"), lit(0L).as("cnt"), col("key").as("w"),
        lit(1L).as("sign")))
    val parts = s.sessionState.conf.numShufflePartitions
    val eps = marks.unionByName(probes).as[IntervalEp]
      .repartitionByRange(parts, col("state"), col("pos"), col("probe"))
      .sortWithinPartitions("state", "pos", "probe")
      // eager materialization: the offset pass and the emit pass both
      // scan this frame; checkpoint keeps it one sort, race-free
      .localCheckpoint(true)
    // pass 1: per-(partition, state) marker totals — tiny, collected to
    // build exclusive prefix offsets (the canonical distributed-scan
    // offset exchange; O(partitions × types) rows by construction)
    val partials = eps.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val acc =
        scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      rows.foreach { e =>
        if (e.probe == 0) {
          val (c0, s0) = acc.getOrElse(e.state, (0L, 0L))
          acc(e.state) = (c0 + e.cnt, s0 + e.w)
        }
      }
      acc.iterator.map { case (st, (c, sw)) => (pid, st, c, sw) }
    }.collect()
    val offsets: Map[(Int, String), (Long, Long)] =
      partials.groupBy(_._2).flatMap { case (st, arr) =>
        var c = 0L; var sw = 0L
        arr.sortBy(_._1).map { case (pid, _, dc, dsw) =>
          val r = ((pid, st), (c, sw)); c += dc; sw += dsw; r
        }
      }
    val bc = s.sparkContext.broadcast(offsets)
    // pass 2: stream each sorted partition once; probes emit signed reads
    val contrib = eps.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cur: String = null
      var c = 0L
      var sw = 0L
      rows.flatMap { e =>
        if (e.state != cur) {
          cur = e.state
          val (c0, s0) = bc.value.getOrElse((pid, cur), (0L, 0L))
          c = c0; sw = s0
        }
        if (e.probe == 0) { c += e.cnt; sw += e.w; Iterator.empty }
        else Iterator.single((e.state, e.sign * c, e.sign * (sw + e.w * c)))
      }
    }.toDF("state", "dp", "ds")
    contrib.groupBy("state")
      .agg(sum("dp").as("n_pairs"), sum("ds").as("checksum"))
      // the theta-join semantic has no row for a pairless type
      .filter(col("n_pairs") > 0)
  }

  private def q169OracleSql: String =
    s"""WITH keyed AS (SELECT user_id, event_type,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k
        FROM events),
        marked AS (SELECT *, CASE WHEN lag(event_type)
            OVER (PARTITION BY user_id ORDER BY k) = event_type
            THEN 0 ELSE 1 END AS newrun FROM keyed),
        runs AS (SELECT *, sum(newrun) OVER (PARTITION BY user_id
            ORDER BY k ROWS UNBOUNDED PRECEDING) AS seq FROM marked),
        iv AS (SELECT user_id, seq, max(event_type) AS state,
            min(k) AS f, max(k) AS t
          FROM runs GROUP BY user_id, seq)
        SELECT a.state, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(a.user_id + b.user_id + a.seq + b.seq) AS BIGINT)
            AS checksum
        FROM iv a JOIN iv b
          ON a.state = b.state AND a.user_id < b.user_id
          AND a.f <= b.t AND b.f <= a.t
        GROUP BY a.state"""

  /** q170 — LINEAR INTERPOLATION of a sparse time series (the gap-fill
    * imputation q160's forward-fill can't do when the metric trends:
    * forward-fill holds the LAST value flat; interpolation draws the
    * line between the surrounding observations). Each user's purchase
    * values are the known points on the q92 collision-free event
    * clock; every other event gets
    * `pv + (nv-pv)·(k-pk)/(nk-pk)` from its known neighbors, rows with
    * only one neighbor (series head/tail) are left out — imputing them
    * needs extrapolation policy, which is a different operator.
    *
    * Determinism: the known values are exact parquet DOUBLEs, the
    * clock deltas exact BIGINTs small enough to convert to double
    * losslessly, and `-`, `*`, `/` are IEEE exactly-rounded — with the
    * identical association on both engines the interpolated double is
    * bit-identical (same discipline as q82's z predicate; no `ln`).
    *
    * Scale shape: ONE user-keyed exchange carries all four neighbor
    * windows (same partition spec + sort), so the plan is scan →
    * exchange → one Window node → filter/project. Running frames are
    * O(1) state per row (`last`/`first` over growing frames keep one
    * value, Spark's UnboundedPreceding fast path); nothing is
    * per-user-collected. */
  def q170LinearInterp(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("k")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("user_id"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"),
        when(col("event_type") === "purchase", col("value")).as("v"))
      .withColumn("pv", last("v", ignoreNulls = true).over(before))
      .withColumn("pk",
        last(when(col("v").isNotNull, col("k")), ignoreNulls = true)
          .over(before))
      .withColumn("nv", first("v", ignoreNulls = true).over(after))
      .withColumn("nk",
        first(when(col("v").isNotNull, col("k")), ignoreNulls = true)
          .over(after))
      .filter(col("v").isNull && col("pv").isNotNull &&
        col("nv").isNotNull)
      .select(col("user_id"), col("k"),
        (col("pv") +
          ((col("nv") - col("pv")) * (col("k") - col("pk"))) /
            (col("nk") - col("pk"))).as("v_interp"))
  }

  private def q170OracleSql: String =
    s"""WITH keyed AS (SELECT user_id,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k,
          CASE WHEN event_type = 'purchase' THEN value END AS v
        FROM events),
        nb AS (SELECT user_id, k, v,
          last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN k END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pk,
          first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY k
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN k END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY k
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nk
        FROM keyed)
        SELECT user_id, k,
          pv + ((nv - pv) * (k - pk)) / (nk - pk) AS v_interp
        FROM nb
        WHERE v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL"""

  /** Suppression threshold for q171 — groups smaller than this are not
    * released at all (the q167 k-anonymity floor applied to releases). */
  val DpSuppress = 10

  /** q171 — NOISED AGGREGATE RELEASE (differential-privacy-shaped
    * publishing, the release step after q167's k-anonymity audit):
    * per-(nation, segment) customer counts with small integer noise
    * added before release, groups under [[DpSuppress]] suppressed
    * entirely. The noise here is DETERMINISTIC — an LCG draw seeded by
    * the group's portable hash — because the differential oracle must
    * reproduce it; a production release swaps the seed for a secret
    * per-release nonce (two-sided geometric noise from a keyed PRF is
    * the standard mechanism), and the pipeline shape is unchanged.
    *
    * Scale shape: partial-aggregated groupBy collapses the corpus to
    * |groups| rows before any per-group work; the char fold and LCG
    * run once per RELEASED group, not per row. */
  def q171DpCounts(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    t(s, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= DpSuppress)
      .withColumn("seed",
        expr(s"(${PortableHash.sparkCharFold("c_mktsegment")} * 31" +
          s" + c_nationkey) % ${PortableHash.Mod}"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("n + ((seed * 1103515245 + 12345) % 2147483647) % 7 - 3")
          .as("released_n"))
  }

  private def q171OracleSql: String = {
    import graft.functions.PortableHash
    s"""WITH grp AS (SELECT c_nationkey, c_mktsegment,
          CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2),
        seeded AS (SELECT c_nationkey, c_mktsegment, n,
          (${PortableHash.duckCharFold("c_mktsegment")} * 31
           + c_nationkey) % ${PortableHash.Mod} AS seed
        FROM grp WHERE n >= $DpSuppress)
        SELECT c_nationkey, c_mktsegment,
          n + ((seed * 1103515245 + 12345) % 2147483647) % 7 - 3
            AS released_n
        FROM seeded"""
  }

  /** q173 — BITMAP-INDEX segment intersection (the columnar-engine
    * audience-segmentation primitive: per-attribute order bitmaps,
    * AND-ed word-wise to count orders in both segments without
    * re-touching the fact table). Each (attribute value, 63-key
    * bucket) holds one BIGINT word with bit i set iff order
    * `bucket*63+i` has a lineitem with that value; the co-occurrence
    * count of (returnflag f, linestatus st) is `Σ popcount(w_f & w_s)`
    * joined on bucket. 63-bit words, not 64: DuckDB's `<<` raises on
    * shift 63 (sign-bit overflow), and one spare bit costs 1.6%
    * density. Matches `count(DISTINCT orderkey)` of the two-sided
    * semi-join by construction (bit_or is idempotent under the data's
    * duplicate (orderkey, linenumber) pairs — TESTDATA quirk).
    *
    * Scale shape: the bitmaps build with ONE partial-aggregated
    * groupBy each (map-side bit_or makes per-partition words, the
    * exchange carries |values|·|buckets| words ≈ rows/63·|values| —
    * a 63× wire compression vs shipping keys); the intersection joins
    * word frames only. At 100 TB this is the difference between an
    * 800 GB key shuffle and a 13 GB word shuffle per attribute. */
  def q173BitmapIndex(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def words(attr: String, alias: String): DataFrame =
      li.select(col(attr).as(alias),
          expr("l_orderkey div 63").as("bkt"),
          expr("shiftleft(CAST(1 AS BIGINT)," +
            " CAST(l_orderkey % 63 AS INT))").as("b"))
        .groupBy(alias, "bkt")
        .agg(expr("bit_or(b)").as(s"w_$alias"))
    words("l_returnflag", "f")
      .join(words("l_linestatus", "st"), "bkt")
      .groupBy("f", "st")
      .agg(sum(expr("bit_count(w_f & w_st)")).as("n_orders"))
  }

  private def q173OracleSql: String =
    """WITH fw AS (SELECT l_returnflag AS f, l_orderkey // 63 AS bkt,
          bit_or(CAST(1 AS BIGINT) << CAST(l_orderkey % 63 AS INTEGER))
            AS w
        FROM lineitem GROUP BY 1, 2),
        sw AS (SELECT l_linestatus AS st, l_orderkey // 63 AS bkt,
          bit_or(CAST(1 AS BIGINT) << CAST(l_orderkey % 63 AS INTEGER))
            AS w
        FROM lineitem GROUP BY 1, 2)
        SELECT fw.f, sw.st,
          CAST(sum(bit_count(fw.w & sw.w)) AS BIGINT) AS n_orders
        FROM fw JOIN sw ON fw.bkt = sw.bkt GROUP BY 1, 2"""

  /** Conversion threshold for q174 — a purchase above this value marks
    * the user converted (~5% per purchase on the synthetic
    * exponential-ish values, so arms differ by sampling noise only). */
  val AbConvValue = 150

  /** q174 — A/B LIFT with a pooled two-proportion z² (the experiment
    * readout every event pipeline ends in): users deterministically
    * split into two arms by an LCG of user_id (the portable stand-in
    * for a salted assignment hash — same draw every session, the
    * property assignment hashing exists for), conversion = any
    * purchase above [[AbConvValue]], and one release row with both
    * arms' (n, x), the rate lift, and z² = (p₁-p₂)²/(p̄(1-p̄)(1/n₁+1/n₂))
    * — compare to χ²₁ critical values. z² avoids sqrt entirely; the
    * remaining double arithmetic is exactly-rounded ops over exact
    * integers in identical association on both engines (q82
    * discipline), so the statistic is bit-deterministic.
    *
    * Scale shape: per-user conversion is a partial-aggregated groupBy
    * on user_id; arm totals partial-aggregate to 2 rows; the pivot to
    * one row is a 2-row final aggregate. One user-keyed exchange
    * total. */
  def q174AbLift(s: SparkSession, dir: String): DataFrame = {
    val conv = t(s, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
          col("value") > AbConvValue, 1L).otherwise(0L)).as("c"))
      .withColumn("arm",
        expr("((user_id * 1103515245 + 12345) % 2147483647) % 2"))
    val agg = conv.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("c").as("x"))
    agg.agg(
        max(when(col("arm") === 0, col("n"))).as("n1"),
        max(when(col("arm") === 0, col("x"))).as("x1"),
        max(when(col("arm") === 1, col("n"))).as("n2"),
        max(when(col("arm") === 1, col("x"))).as("x2"))
      .select(col("n1"), col("x1"), col("n2"), col("x2"),
        expr("(CAST(x1 AS DOUBLE) / n1) - (CAST(x2 AS DOUBLE) / n2)")
          .as("lift"),
        expr("""(((CAST(x1 AS DOUBLE) / n1) - (CAST(x2 AS DOUBLE) / n2))
             * ((CAST(x1 AS DOUBLE) / n1) - (CAST(x2 AS DOUBLE) / n2)))
            / (((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                * (1 - (CAST(x1 + x2 AS DOUBLE) / (n1 + n2))))
               * ((CAST(1 AS DOUBLE) / n1) + (CAST(1 AS DOUBLE) / n2)))""")
          .as("z2"))
  }

  private def q174OracleSql: String =
    s"""WITH conv AS (SELECT user_id,
          max(CASE WHEN event_type = 'purchase' AND value > $AbConvValue
              THEN 1 ELSE 0 END) AS c
        FROM events GROUP BY 1),
        arms AS (SELECT
          ((user_id * 1103515245 + 12345) % 2147483647) % 2 AS arm, c
        FROM conv),
        agg AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(c) AS BIGINT) AS x
          FROM arms GROUP BY arm),
        ab AS (SELECT
          max(CASE WHEN arm = 0 THEN n END) AS n1,
          max(CASE WHEN arm = 0 THEN x END) AS x1,
          max(CASE WHEN arm = 1 THEN n END) AS n2,
          max(CASE WHEN arm = 1 THEN x END) AS x2
        FROM agg)
        SELECT n1, x1, n2, x2,
          (CAST(x1 AS DOUBLE) / n1) - (CAST(x2 AS DOUBLE) / n2) AS lift,
          (((CAST(x1 AS DOUBLE) / n1) - (CAST(x2 AS DOUBLE) / n2))
             * ((CAST(x1 AS DOUBLE) / n1) - (CAST(x2 AS DOUBLE) / n2)))
            / (((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                * (1 - (CAST(x1 + x2 AS DOUBLE) / (n1 + n2))))
               * ((CAST(1 AS DOUBLE) / n1) + (CAST(1 AS DOUBLE) / n2)))
            AS z2
        FROM ab"""

  /** q175 — GINI CONCENTRATION index per order priority (the inequality
    * /concentration readout over spend: how unevenly order value is
    * distributed — the skew SIGNAL that motivates q163's salted join and
    * AQE skew splitting, measured as a released statistic). Gini over
    * exact price cents: with values sorted ascending and 1-based ranks,
    * `G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx)`.
    *
    * Determinism: every term up to the final division is exact — rank
    * sums over a tied run are closed-form (`w·cumlo + w(w+1)/2`), so tie
    * order cannot matter — and the release is an exact integer division
    * (gini ×10⁹, floored), no float fold anywhere.
    *
    * Scale shape: the corpus collapses map-side to a (priority, cents)
    * census BEFORE any ranked work (partial-aggregated groupBy); the
    * cumulative window and the Σi·x closed form run on census rows, so
    * no per-row global sort ever happens — the oracle states the
    * row_number formulation as the implementation-free contract, and
    * the census algebra reproduces its integers bit-for-bit.
    * Headroom: the Σi·x accumulation is decimal(38,0)/HUGEINT — the
    * round-12 sf10 endurance run caught the original BIGINT form
    * overflowing exactly where its own doc said it would (2Σi·x ≈
    * 2·10²⁰ at 15M orders vs the 9.2·10¹⁸ int64 ceiling); the ratio
    * released after division is ≤ 10⁹ and BIGINT-safe at any SF. */
  def q175Gini(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * lit(100)).as("x"))
      .groupBy("prio", "x").agg(count(lit(1)).as("w"))
    val before = Window.partitionBy("prio").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("cumlo", coalesce(sum("w").over(before), lit(0L)))
      .groupBy("prio")
      .agg(sum("w").as("n"), sum(expr("x * w")).as("sum_cents"),
        sum(expr("CAST(x AS DECIMAL(38,0))" +
          " * (2 * w * cumlo + w * (w + 1))")).as("two_ix"))
      .select(col("prio"), col("n"), col("sum_cents"),
        expr("""CAST((two_ix - (CAST(n AS DECIMAL(38,0)) + 1)
               * sum_cents) * 1000000000
             div (CAST(n AS DECIMAL(38,0)) * sum_cents) AS BIGINT)""")
          .as("gini_ppb"))
  }

  private def q175OracleSql: String =
    """WITH cents AS (SELECT o_orderpriority AS prio,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS x FROM orders),
        ranked AS (SELECT prio, x,
          row_number() OVER (PARTITION BY prio ORDER BY x) AS i
        FROM cents),
        g AS (SELECT prio, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sum_cents,
          CAST(2 * sum(CAST(i AS HUGEINT) * x)
            - CAST(count(*) + 1 AS HUGEINT) * sum(x) AS HUGEINT) AS gnum
        FROM ranked GROUP BY prio)
        SELECT prio, n, sum_cents,
          CAST(gnum * 1000000000 // (CAST(n AS HUGEINT) * sum_cents)
            AS BIGINT) AS gini_ppb
        FROM g"""

  /** q176 — WEIGHTED MEDIAN per return flag: the extended-price cents
    * value at which cumulative QUANTITY crosses half the total — the
    * robust center the plain median misses when rows carry different
    * weights (a 50-unit line should pull the center 50× harder than a
    * 1-unit line). Smallest value v with `2·cumw(v) ≥ totw`, all
    * integer.
    *
    * Scale shape: q90/q168 census discipline — the corpus collapses
    * map-side to a (flag, cents) weight census before the cumulative
    * window; both window frames share the flag partitioning so ONE
    * exchange carries them; the crossing filter + min runs on census
    * rows. No raw-row sort anywhere. */
  def q176WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * lit(100)).as("cents"),
        col("l_quantity").cast("long").as("q"))
      .groupBy("flag", "cents").agg(sum("q").as("w"))
    val byFlag = Window.partitionBy("flag")
    census
      .withColumn("cw", sum("w").over(byFlag.orderBy("cents")))
      .withColumn("tw", sum("w").over(byFlag))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("flag")
      .agg(min("cents").as("median_cents"), min("tw").as("total_weight"))
  }

  private def q176OracleSql: String =
    """WITH census AS (SELECT l_returnflag AS flag,
          CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2),
        cum AS (SELECT flag, cents, w,
          sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cw,
          sum(w) OVER (PARTITION BY flag) AS tw FROM census)
        SELECT flag, CAST(min(cents) AS BIGINT) AS median_cents,
          CAST(min(tw) AS BIGINT) AS total_weight
        FROM cum WHERE cw * 2 >= tw GROUP BY flag"""

  /** Minimum relative support for q177: a brand pair is released only if
    * it co-occurs in ≥ 1/50 (2%) of baskets — relative, so the rule set
    * is stable across scale factors where an absolute count is not. */
  val AssocMinSupportDenom = 50L

  /** q177 — ASSOCIATION RULES over order baskets (market-basket mining,
    * the co-purchase complement of q142's text co-occurrence): baskets
    * are orders, items are part BRANDS (via the part dim), and each
    * released rule carries exact support counts plus confidence
    * `n12/n1` and lift `n12·N/(n1·n2)` recomputable from the released
    * integers (both single exactly-rounded double expressions with
    * identical association on both engines).
    *
    * Scale shape: the brand lookup broadcasts the part dim, so ONE
    * basket-keyed exchange (the collect_set groupBy) is the only
    * corpus-scale shuffle; pairs are generated IN-ROW from each
    * basket's sorted item set (q142 discipline — never a basket
    * self-join, which would re-exchange the corpus twice), bounded by
    * the max basket size (13 items ⇒ ≤ 78 pairs/basket), never
    * |items|². The basket frame is materialized ONCE via an eager
    * `localCheckpoint` before its three consumers (item counts, pair
    * counts, basket census) are planned — `cache()` is not enough here:
    * two of the consumers are broadcast builds whose jobs launch
    * concurrently and RACE to populate the cache, computing the basket
    * groupBy twice (measured 2.1–2.4× the per-query baseline; the
    * checkpoint restores it). Supports prune BEFORE the dim joins. */
  def q177AssocRules(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand").as("b"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("ok").agg(sort_array(collect_set("b")).as("bs"))
      .localCheckpoint(true)
    val item = baskets.select(explode(col("bs")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    baskets
      .select(explode(expr("flatten(transform(bs, (x, i) -> " +
        "transform(slice(bs, i + 2, size(bs)), " +
        "y -> struct(x AS b1, y AS b2))))")).as("p"))
      .select(col("p.b1"), col("p.b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("n12"))
      .crossJoin(broadcast(nb))
      .filter(col("n12") * AssocMinSupportDenom >= col("n_baskets"))
      .join(broadcast(item.toDF("b1", "n1")), "b1")
      .join(broadcast(item.toDF("b2", "n2")), "b2")
      .select(col("b1"), col("b2"), col("n12"), col("n1"), col("n2"),
        expr("CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE)").as("conf"),
        expr("(CAST(n12 AS DOUBLE) * CAST(n_baskets AS DOUBLE))" +
          " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))").as("lift"))
  }

  private def q177OracleSql: String =
    s"""WITH bi AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
          FROM bi),
        item AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bi
          GROUP BY b),
        pair AS (SELECT x.b AS b1, y.b AS b2,
            CAST(count(*) AS BIGINT) AS n12
          FROM bi x JOIN bi y ON x.ok = y.ok AND x.b < y.b GROUP BY 1, 2),
        r AS (SELECT b1, b2, n12, i1.n AS n1, i2.n AS n2, nb.n_baskets
          FROM pair JOIN item i1 ON b1 = i1.b JOIN item i2 ON b2 = i2.b
          CROSS JOIN nb
          WHERE n12 * $AssocMinSupportDenom >= n_baskets)
        SELECT b1, b2, n12, n1, n2,
          CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE) AS conf,
          (CAST(n12 AS DOUBLE) * CAST(n_baskets AS DOUBLE))
            / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS lift
        FROM r"""

  /** q178 — TIME-WEIGHTED AVERAGE value per user (TWAP: each observed
    * value holds until the next observation, so its weight is the
    * seconds it was in force — the time-series mean q164's count/range
    * windows don't compute). Released as exact BIGINT numerator
    * (Σ value-cents × seconds-held) and denominator (Σ seconds), plus
    * their one exactly-rounded double quotient; a user's last event has
    * no holding period and tail users with zero total duration are not
    * released.
    *
    * Determinism: value cents via `floor(value·100)` (exactly-rounded
    * multiply, exact floor); durations from second-floored epochs;
    * ordering on the q92 packed collision-free clock, so same-second
    * events hold for 0 s on both engines identically.
    *
    * Scale shape: ONE user-keyed exchange carries the lead window AND
    * the per-user aggregate (grouping key ⊇ partition key ⇒ exchange
    * reuse, q168 discipline); lead(1) is O(1) state per row. */
  def q178Twap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("k")
    t(s, dir, "events")
      .select(col("user_id"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"),
        unix_timestamp(col("ts")).as("sec"),
        floor(col("value") * lit(100)).as("vc"))
      .withColumn("dt", lead("sec", 1).over(w) - col("sec"))
      .filter(col("dt").isNotNull)
      .groupBy("user_id")
      .agg(sum(expr("vc * dt")).as("num"), sum("dt").as("den"))
      .filter(col("den") > 0)
      .select(col("user_id"), col("num"), col("den"),
        expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)").as("twap"))
  }

  private def q178OracleSql: String =
    s"""WITH keyed AS (SELECT user_id,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k,
          (epoch_ns(ts) // 1000000000) AS sec,
          CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
        seg AS (SELECT user_id, vc,
          lead(sec) OVER (PARTITION BY user_id ORDER BY k) - sec AS dt
        FROM keyed),
        agg AS (SELECT user_id, CAST(sum(vc * dt) AS BIGINT) AS num,
          CAST(sum(dt) AS BIGINT) AS den
        FROM seg WHERE dt IS NOT NULL GROUP BY user_id)
        SELECT user_id, num, den,
          CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS twap
        FROM agg WHERE den > 0"""

  /** q179 — INTERPOLATED PERCENTILES (ANSI PERCENTILE_CONT semantics,
    * the continuous complement of q168's exact-rank bucket boundaries):
    * per return flag, p50 and p95 of extended-price cents as
    * `x⌊h⌋ + frac·(x⌊h⌋₊₁ − x⌊h⌋)` with `h = (n−1)·p`. Rank geometry is
    * all integer (`h·100` stays a BIGINT; frac is the two-digit
    * remainder over 100, one exactly-rounded division), and the final
    * interpolation is written with identical association on both
    * engines, so the released doubles are bit-identical.
    *
    * Scale shape: same census+cumsum discipline as q176 — the window
    * runs over (flag, cents) census rows, the 6-row percentile/target
    * frame broadcasts onto the census for the rank-containment probes,
    * and each probe reduces with a min. Neither engine materializes a
    * per-row global sort. */
  def q179PercentileInterp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val census = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * lit(100)).as("cents"))
      .groupBy("flag", "cents").agg(count(lit(1)).as("c"))
    val cum = census
      .withColumn("hi",
        sum("c").over(Window.partitionBy("flag").orderBy("cents")))
      .withColumn("lo", col("hi") - col("c"))
    val tgt = census.groupBy("flag").agg(sum("c").as("n"))
      .crossJoin(Seq(50L, 95L).toDF("pp"))
      .withColumn("r_lo", expr("((n - 1) * pp) div 100 + 1"))
      .withColumn("r_hi", least(col("r_lo") + 1, col("n")))
      .withColumn("frac",
        expr("CAST(((n - 1) * pp) % 100 AS DOUBLE) / 100"))
    def probe(rank: String, out: String) =
      cum.join(broadcast(tgt), Seq("flag"))
        .filter(col(rank) > col("lo") && col(rank) <= col("hi"))
        .groupBy("flag", "pp").agg(min("cents").as(out))
    tgt.join(probe("r_lo", "x_lo"), Seq("flag", "pp"))
      .join(probe("r_hi", "x_hi"), Seq("flag", "pp"))
      .select(col("flag"), col("pp"), col("n"),
        expr("CAST(x_lo AS DOUBLE)" +
          " + frac * (CAST(x_hi AS DOUBLE) - CAST(x_lo AS DOUBLE))")
          .as("pct_cents"))
  }

  private def q179OracleSql: String =
    """WITH census AS (SELECT l_returnflag AS flag,
          CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
          CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2),
        cum AS (SELECT flag, cents, c,
          sum(c) OVER (PARTITION BY flag ORDER BY cents) AS hi,
          sum(c) OVER (PARTITION BY flag ORDER BY cents) - c AS lo,
          sum(c) OVER (PARTITION BY flag) AS n FROM census),
        pct AS (SELECT CAST(pp AS BIGINT) AS pp
          FROM (VALUES (50), (95)) v(pp)),
        tgt AS (SELECT flag, pp, n,
          ((n - 1) * pp) // 100 + 1 AS r_lo,
          least(((n - 1) * pp) // 100 + 2, n) AS r_hi,
          CAST(((n - 1) * pp) % 100 AS DOUBLE) / 100 AS frac
          FROM (SELECT DISTINCT flag, n FROM cum) CROSS JOIN pct),
        xlo AS (SELECT t.flag, t.pp, min(c.cents) AS x_lo FROM tgt t
          JOIN cum c ON c.flag = t.flag AND t.r_lo > c.lo
            AND t.r_lo <= c.hi
          GROUP BY 1, 2),
        xhi AS (SELECT t.flag, t.pp, min(c.cents) AS x_hi FROM tgt t
          JOIN cum c ON c.flag = t.flag AND t.r_hi > c.lo
            AND t.r_hi <= c.hi
          GROUP BY 1, 2)
        SELECT t.flag, t.pp, CAST(t.n AS BIGINT) AS n,
          CAST(x_lo AS DOUBLE)
            + t.frac * (CAST(x_hi AS DOUBLE) - CAST(x_lo AS DOUBLE))
            AS pct_cents
        FROM tgt t JOIN xlo ON t.flag = xlo.flag AND t.pp = xlo.pp
          JOIN xhi ON t.flag = xhi.flag AND t.pp = xhi.pp"""

  /** q156 — CATEGORICAL drift via per-category share divergence (the
    * discrete complement of q132's numeric KS: KS needs an ordered
    * domain; event-type mixes, language mixes, source mixes don't have
    * one). The event-type distribution of the month's first half
    * (day ≤ 15) vs its second, as exact ppm shares and their absolute
    * gap — the per-category terms whose half-sum is the total-variation
    * distance, kept per category because the DRIFTING category is what
    * an operator acts on. All integer arithmetic (counts, ppm floors),
    * so both engines agree bit-for-bit where a float χ² would drift.
    *
    * Scale shape: ONE corpus pass partial-aggregating to ≤ |types| rows
    * per partition, one |types|-row shuffle, and a window over the
    * |types|-row frame for the totals — the corpus never shuffles. */
  def q156CategoricalDrift(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        sum(when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L))
          .as("n_a"),
        sum(when(dayofmonth(col("ts")) > 15, 1L).otherwise(0L))
          .as("n_b"))
    val all = Window.partitionBy(lit(1))
    c.withColumn("ta", sum("n_a").over(all))
      .withColumn("tb", sum("n_b").over(all))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("(n_a * 1000000) div ta").as("pa_ppm"),
        expr("(n_b * 1000000) div tb").as("pb_ppm"),
        expr("abs((n_a * 1000000) div ta - (n_b * 1000000) div tb)")
          .as("gap_ppm"))
  }

  private def q156OracleSql: String =
    """WITH c AS (SELECT event_type,
          CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_a,
          CAST(sum(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_b
        FROM events GROUP BY event_type),
        tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                       CAST(sum(n_b) AS BIGINT) AS tb FROM c)
        SELECT event_type, n_a, n_b,
          (n_a * 1000000) // ta AS pa_ppm,
          (n_b * 1000000) // tb AS pb_ppm,
          abs((n_a * 1000000) // ta - (n_b * 1000000) // tb) AS gap_ppm
        FROM c, tot"""

  /** q134 — ordered FUNNEL analysis (view → click → purchase): per
    * user, the earliest view, the earliest click strictly AFTER that
    * view, the earliest purchase strictly after that click; declared
    * output is users-per-step — the product-analytics sequence query
    * (and the event-ordering shape training pipelines run to mine
    * interaction trajectories). Step events are ordered on the same
    * collision-free integer key as q92 (epoch second × 10⁷ + event_id)
    * so "strictly after" is a total order both engines agree on — no
    * sub-second timestamp-precision hazard.
    *
    * Scale shape: three filtered partial-aggregated min-aggs, chained
    * by user-keyed equi-joins with a range residual — each stage's
    * frame shrinks (only users who survived the previous step), and
    * nothing is windowed over the raw event stream. The 3-row output
    * unions three one-row counts. */
  def q134Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("k").as("k1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("k") > col("k1"))
      .groupBy("user_id").agg(min("k").as("k2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("k") > col("k2"))
      .groupBy("user_id").agg(min("k").as("k3"))
    v.agg(count(lit(1)).as("users")).select(lit("1_view").as("step"),
        col("users"))
      .unionByName(c.agg(count(lit(1)).as("users"))
        .select(lit("2_click").as("step"), col("users")))
      .unionByName(p.agg(count(lit(1)).as("users"))
        .select(lit("3_purchase").as("step"), col("users")))
  }

  private def q134OracleSql: String =
    s"""WITH ev AS (SELECT user_id, event_type,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')),
        v AS (SELECT user_id, min(k) AS k1 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT ev.user_id, min(ev.k) AS k2 FROM ev
              JOIN v ON ev.user_id = v.user_id AND ev.k > v.k1
              WHERE ev.event_type = 'click' GROUP BY ev.user_id),
        p AS (SELECT ev.user_id, min(ev.k) AS k3 FROM ev
              JOIN c ON ev.user_id = c.user_id AND ev.k > c.k2
              WHERE ev.event_type = 'purchase' GROUP BY ev.user_id)
        SELECT '1_view' AS step, count(*) AS users FROM v
        UNION ALL SELECT '2_click', count(*) FROM c
        UNION ALL SELECT '3_purchase', count(*) FROM p"""

  /** q143 — STATE-RUN INTERVALS (SCD2 / run-length temporal modeling):
    * each user's event log collapsed into maximal runs of consecutive
    * equal event_types, each run a validity row (user, seq, state,
    * from_k, n_events) ordered on q92's collision-free integer key —
    * the change-log → slowly-changing-dimension build, and the
    * run-length compression trajectory mining applies before pattern
    * matching. Gaps-and-islands (the q137 fusion machinery, applied
    * temporally): run boundary where the type differs from its
    * predecessor, run id by cumulative sum, one aggregate per run.
    *
    * Scale shape: ONE user-keyed shuffle feeds both windows (lag and
    * the cumulative sum share the (user_id, k) sort), and the run
    * aggregate re-uses the same partitioning — Catalyst plans a single
    * exchange. Output is run-count-sized (≤ events, typically ≪). */
  def q143StateIntervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("k")
    val cum = Window.partitionBy("user_id").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"))
      .withColumn("newrun",
        when(lag("event_type", 1).over(w) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("seq", sum("newrun").over(cum))
      .groupBy("user_id", "seq")
      .agg(min("k").as("from_k"), count(lit(1)).as("n_events"),
        max("event_type").as("state"))
  }

  private def q143OracleSql: String =
    s"""WITH keyed AS (SELECT user_id, event_type,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k
        FROM events),
        marked AS (SELECT user_id, event_type, k,
          CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY k)
               = event_type THEN 0 ELSE 1 END AS newrun
        FROM keyed),
        runs AS (SELECT user_id, event_type, k,
          CAST(sum(newrun) OVER (PARTITION BY user_id ORDER BY k
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
        FROM marked)
        SELECT user_id, seq, min(k) AS from_k,
               count(*) AS n_events, max(event_type) AS state
        FROM runs GROUP BY user_id, seq"""

  /** q150 — MARKOV TRANSITION census over per-user event sequences
    * (behavior-sequence modeling prep: the transition matrix a
    * next-event model or synthetic-session generator trains on; the
    * pattern layer ABOVE q143's state runs, which compress repeats but
    * don't count transitions): every consecutive (prev → next) pair in
    * each user's q92-keyed event order, counted corpus-wide, with each
    * transition's share of its source state's outgoing mass in ppm —
    * the empirical Markov kernel's exact integer numerators.
    *
    * Scale shape: ONE user-keyed exchange carries the lag window; the
    * pair census partial-aggregates map-side to ≤ |types|² rows per
    * partition; the per-source normalization joins only the
    * |types|-row outgoing totals (broadcast). Same gaps-and-islands
    * key discipline as q143 — collision-free portable event order. */
  def q150MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("k")
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val outMass = pairs.groupBy("prev_type")
      .agg(sum("n").as("out_n"))
    pairs.join(broadcast(outMass), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div out_n").as("share_ppm"))
  }

  private def q150OracleSql: String =
    s"""WITH keyed AS (SELECT user_id, event_type,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k
        FROM events),
        seq AS (SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY k)
            AS prev_type
        FROM keyed),
        pairs AS (SELECT prev_type, event_type AS next_type,
            CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, event_type),
        mass AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_n
          FROM pairs GROUP BY prev_type)
        SELECT p.prev_type, p.next_type, p.n,
               p.n * 1000000 // m.out_n AS share_ppm
        FROM pairs p JOIN mass m ON p.prev_type = m.prev_type"""

  // ------------------------------------------------------------ q226

  /** q226 — JOIN-CARDINALITY PRE-ESTIMATE (the skew diagnostic a
    * planner runs BEFORE committing a join): for an equi-join the exact
    * output size is Σ_k nL(k)·nR(k), computable from the two key
    * censuses alone — here for the canonical blowup case, the lineitem
    * self-join on l_partkey (co-ordered-parts analysis), where one hot
    * part inflates output quadratically. Declared: the top-10 offender
    * keys with row count, predicted pair volume, and each key's exact
    * ppm share of the total predicted output — the decision input for
    * AQE skew thresholds, salting (q65/q163), and go/no-go on the join
    * itself. Predicting the blowup costs one census; RUNNING the
    * blowup at 100 TB costs the cluster.
    *
    * Determinism: pure integer counts; the share's total widened to
    * decimal(38,0) (HUGEINT oracle) — Σn² over a 100 TB key census
    * overflows BIGINT long before the join is even attempted.
    *
    * Scale shape: one map-side-combined key census (domain-sized), a
    * 1-row broadcast total, one top-k — the corpus is scanned once and
    * never joined. */
  def q226JoinBlowup(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
    val tot = census.agg(
      sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("tp"))
    census
      .withColumn("predicted_pairs", expr("n * n"))
      .crossJoin(broadcast(tot))
      .select(col("l_partkey"), col("n").as("n_rows"),
        col("predicted_pairs"),
        expr("""CAST(CAST(predicted_pairs AS DECIMAL(38,0)) * 1000000
                div tp AS BIGINT)""").as("share_ppm"))
      .orderBy(col("predicted_pairs").desc, col("l_partkey"))
      .limit(10)
  }

  private def q226OracleSql: String =
    """WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY l_partkey),
        tt AS (SELECT sum(CAST(n AS HUGEINT) * n) AS tp FROM c)
       SELECT l_partkey, n AS n_rows, n * n AS predicted_pairs,
         CAST(CAST(n AS HUGEINT) * n * 1000000 // tp AS BIGINT)
           AS share_ppm
       FROM c, tt
       ORDER BY predicted_pairs DESC, l_partkey LIMIT 10"""

  /** Width of q229's value bands (same 10-unit bins as q195). */
  val TvBand = 10

  /** q229 — TOTAL-VARIATION DISTANCE between the first and second half
    * of the event stream, per event type (drift family: q132's KS is a
    * CDF sup-norm over continuous values, q156's χ² weights rare
    * categories up — TV is the L1 "what fraction of probability mass
    * moved" number, the one with the direct operational reading:
    * rejection-sampling cost, mixture re-weighting delta). Exactly
    * integer: TV·10⁶ = Σ_bands |c₁·N₂ − c₂·N₁| · 10⁶ div (2·N₁·N₂) —
    * no per-band float division, one exact division at the end (q210
    * decimal-widening; a 100 TB band count squares past BIGINT).
    * Period split: event-days [min, min+span/2) vs the rest, from a
    * broadcast 1-row bounds aggregate.
    *
    * Scale shape: ONE (type, band) census shuffle with both period
    * counts as conditional sums in the same pass (no second scan, no
    * period key in the shuffle); per-type totals and the |Δ| rollup
    * ride the census-sized frame. */
  def q229TvDistance(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"),
        expr(s"CAST(floor(value / $TvBand) AS BIGINT)").as("band"),
        expr("unix_timestamp(ts) div 86400").as("d"))
    val bounds = ev.agg(min("d").as("dmin"),
      expr("(max(d) - min(d) + 1) div 2").as("halfspan"))
    val census = ev.crossJoin(broadcast(bounds))
      .withColumn("p2",
        (col("d") - col("dmin") >= col("halfspan")).cast("int"))
      .groupBy("event_type", "band")
      .agg(sum(when(col("p2") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("p2") === 1, 1L).otherwise(0L)).as("c2"))
    val totals = census.groupBy("event_type")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
    census.join(totals, "event_type")
      .groupBy(col("event_type"), col("n1"), col("n2"))
      .agg(sum(expr("""abs(CAST(c1 AS DECIMAL(38,0)) * n2
                       - CAST(c2 AS DECIMAL(38,0)) * n1)""")).as("num"))
      .select(col("event_type"), col("n1").as("n_first"),
        col("n2").as("n_second"),
        expr("""CAST(num * 1000000 div (2 * CAST(greatest(n1, 1)
                AS DECIMAL(38,0)) * greatest(n2, 1)) AS BIGINT)""")
          .as("tv_ppm"))
  }

  private def q229OracleSql: String =
    s"""WITH ev AS (SELECT event_type,
          CAST(floor(value / $TvBand) AS BIGINT) AS band,
          (epoch_ns(ts) // 1000000000) // 86400 AS d FROM events),
        bounds AS (SELECT min(d) AS dmin,
          (max(d) - min(d) + 1) // 2 AS halfspan FROM ev),
        census AS (SELECT event_type, band,
            CAST(sum(CASE WHEN d - dmin < halfspan THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
            CAST(sum(CASE WHEN d - dmin >= halfspan THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
          FROM ev, bounds GROUP BY event_type, band),
        totals AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
            CAST(sum(c2) AS BIGINT) AS n2
          FROM census GROUP BY event_type)
        SELECT c.event_type, t.n1 AS n_first, t.n2 AS n_second,
          CAST(sum(abs(CAST(c.c1 AS HUGEINT) * t.n2
                 - CAST(c.c2 AS HUGEINT) * t.n1)) * 1000000
            // (2 * CAST(greatest(t.n1, 1) AS HUGEINT)
               * greatest(t.n2, 1)) AS BIGINT) AS tv_ppm
        FROM census c JOIN totals t ON c.event_type = t.event_type
        GROUP BY c.event_type, t.n1, t.n2"""

  // ------------------------------------------------------------ q232

  /** Ingest lanes for q232's replay model (Kafka-partition analog). */
  val LatenessLanes = 4

  /** q232 — EVENT-TIME LATENESS AUDIT (the batch query that CONFIGURES
    * streaming): a `withWatermark` delay is a guess unless measured —
    * too tight drops late events, too loose holds state. The replay
    * models the multi-partition ingest that CREATES lateness: each
    * event rides one of 4 lanes (user_id mod 4 — the Kafka-partition
    * analog; the raw event_id sequence is time-sorted in this dataset
    * and would audit an idealized single-lane collector), each lane
    * delivers in event-time order, and the collector merges lanes by
    * lane-local sequence number — so a slow lane's old events land
    * after a fast lane's new ones, exactly the cross-partition skew
    * watermarks exist for. Per event, lateness = the merged stream's
    * event-time high-water mark at its arrival minus its own event
    * time. Declared per type: event count, late count, late share in
    * exact ppm, max lateness in seconds — the number `withWatermark`
    * needs (the streaming shapes q109/q117/q126 consume this bound).
    *
    * Scale shape: two type-keyed exchanges — one (type, lane) window
    * for lane sequence numbers, one (type) window for the merged
    * high-water mark (each type's stream is what gets watermarked;
    * there is no global arrival window anywhere); the rollup groups by
    * the second window's partition key, so Catalyst reuses that
    * exchange. Integer seconds throughout. */
  def q232LatenessAudit(s: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy("event_type", "lane")
      .orderBy("es", "event_id")
    val wArr = Window.partitionBy("event_type").orderBy("seq", "lane")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        (col("user_id") % LatenessLanes).as("lane"),
        expr("unix_timestamp(ts)").as("es"))
      .withColumn("seq", row_number().over(wSeq))
      .withColumn("late_s", max("es").over(wArr) - col("es"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
        max("late_s").as("max_lateness_s"))
      .withColumn("late_share_ppm",
        expr("n_late * 1000000 div n_events"))
  }

  private def q232OracleSql: String =
    s"""WITH ev AS (SELECT event_type, event_id,
          user_id % $LatenessLanes AS lane,
          epoch_ns(ts) // 1000000000 AS es FROM events),
        sq AS (SELECT *, row_number() OVER (PARTITION BY event_type,
            lane ORDER BY es, event_id) AS seq FROM ev),
        lt AS (SELECT event_type,
            max(es) OVER (PARTITION BY event_type ORDER BY seq, lane
              ROWS UNBOUNDED PRECEDING) - es AS late_s
          FROM sq)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_late,
          CAST(max(late_s) AS BIGINT) AS max_lateness_s,
          CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS late_share_ppm
        FROM lt GROUP BY event_type"""

  // ------------------------------------------------------------ q233

  /** t-closeness threshold: a class fails when its sensitive-value
    * distribution sits further than 0.25 TV from the global one. */
  val TClosePpm = 250000L

  /** q233 — T-CLOSENESS audit (Li et al. 2007; the release gate that
    * completes the privacy trio: k-anonymity q167 bounds class SIZE,
    * l-diversity q217 bounds sensitive CARDINALITY — both pass a class
    * whose sensitive DISTRIBUTION still leaks, e.g. 95% one segment
    * where the population is 20%; t-closeness bounds the distribution
    * DISTANCE itself). Same quasi-identifier classes as q217
    * ((nation, balance band)), sensitive attribute = market segment;
    * distance = total variation (the categorical EMD with unit ground
    * distance — q229's exact-integer arithmetic at class level:
    * Σ_seg |c·N − g·n|·10⁶ div (2·n·N), absent segments contributing
    * |0·N − g·n|). Declared per nation: classes, rows, worst t, and
    * the classes/rows failing t ≤ 0.25.
    *
    * Scale shape: one (nation, band, seg) census shuffle; class
    * totals, the 5-row global segment frame (broadcast), the per-class
    * TV and the nation rollup all ride census-sized frames. */
  def q233TCloseness(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment").as("seg"),
        expr("""CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                div 100000""").as("band"))
    val cs = q.groupBy("c_nationkey", "band", "seg")
      .agg(count(lit(1)).as("c"))
    val cls = cs.groupBy("c_nationkey", "band").agg(sum("c").as("n"))
    val glob = cs.groupBy("seg").agg(sum("c").as("g"))
    val tot = glob.agg(sum("g").as("ntot"))
    val perClass = cls
      .crossJoin(broadcast(glob))
      .join(cs, Seq("c_nationkey", "band", "seg"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
      .groupBy(col("c_nationkey"), col("band"), col("n"), col("ntot"))
      .agg(sum(expr("""abs(CAST(c0 AS DECIMAL(38,0)) * ntot
                       - CAST(g AS DECIMAL(38,0)) * n)""")).as("num"))
      .withColumn("t_ppm",
        expr("""CAST(num * 1000000 div (2 * CAST(n AS DECIMAL(38,0))
                * ntot) AS BIGINT)"""))
    perClass.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_classes"), sum("n").as("n_rows"),
        max("t_ppm").as("max_t_ppm"),
        sum(when(col("t_ppm") > TClosePpm, 1L).otherwise(0L))
          .as("n_far_classes"),
        sum(when(col("t_ppm") > TClosePpm, col("n")).otherwise(0L))
          .as("n_rows_at_risk"))
  }

  private def q233OracleSql: String =
    s"""WITH q AS (SELECT c_nationkey, c_mktsegment AS seg,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            // 100000 AS band
        FROM customer),
        cs AS (SELECT c_nationkey, band, seg,
            CAST(count(*) AS BIGINT) AS c
          FROM q GROUP BY c_nationkey, band, seg),
        cls AS (SELECT c_nationkey, band, CAST(sum(c) AS BIGINT) AS n
          FROM cs GROUP BY c_nationkey, band),
        gseg AS (SELECT seg, CAST(sum(c) AS BIGINT) AS g
          FROM cs GROUP BY seg),
        tot AS (SELECT CAST(sum(g) AS BIGINT) AS ntot FROM gseg),
        pc AS (SELECT cls.c_nationkey, cls.band, cls.n, tot.ntot,
            CAST(sum(abs(CAST(coalesce(cs.c, 0) AS HUGEINT) * tot.ntot
              - CAST(gseg.g AS HUGEINT) * cls.n)) * 1000000
              // (2 * CAST(cls.n AS HUGEINT) * tot.ntot) AS BIGINT)
              AS t_ppm
          FROM cls CROSS JOIN gseg CROSS JOIN tot
          LEFT JOIN cs ON cs.c_nationkey = cls.c_nationkey
            AND cs.band = cls.band AND cs.seg = gseg.seg
          GROUP BY cls.c_nationkey, cls.band, cls.n, tot.ntot)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_classes,
          CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(max(t_ppm) AS BIGINT) AS max_t_ppm,
          CAST(sum(CASE WHEN t_ppm > $TClosePpm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_far_classes,
          CAST(sum(CASE WHEN t_ppm > $TClosePpm THEN n ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk
        FROM pc GROUP BY c_nationkey"""

  // ------------------------------------------------------------ q245

  /** q245 — PEAK INTERVAL CONCURRENCY (capacity analysis: the maximum
    * number of same-type user-state runs active at once, and when — the
    * number a connection pool, rate limiter, or state-store capacity
    * plan is sized against): q143's state runs swept as ±1 endpoint
    * markers at hour resolution. Concurrency only increases at interval
    * starts, so the exact peak is attained at some start hour — the
    * hour-bucketed sweep is EXACT, not sampled (q169's census-sweep
    * insight applied to the max instead of the pair census). Declared
    * per state: run count, peak concurrency, earliest peak hour.
    *
    * Scale shape: runs come from q143's one user-keyed exchange; the
    * ±1 markers are an in-row ×2 explode into a (state, hour) census
    * (map-side combinable); the running sum, max, and argmax all ride
    * the domain-sized census on ONE state-keyed exchange — no
    * interval-to-interval join anywhere (the q169 lesson: never
    * enumerate what a sweep can count). */
  def q245PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("k")
    val cum = Window.partitionBy("user_id").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        (unix_timestamp(col("ts")) * AttribKeyScale + col("event_id"))
          .as("k"))
      .withColumn("newrun",
        when(lag("event_type", 1).over(w) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("seq", sum("newrun").over(cum))
      .groupBy("user_id", "seq")
      .agg(min("k").as("from_k"), max("k").as("to_k"),
        max("event_type").as("state"))
    val hscale = 3600L * AttribKeyScale
    val census = runs
      .select(col("state"), explode(expr(
        s"""array(struct(from_k div $hscale AS h, 1L AS st, 0L AS en),
                  struct(to_k div $hscale AS h, 0L AS st, 1L AS en))"""))
        .as("m"))
      .groupBy(col("state"), col("m.h").as("h"))
      .agg(sum("m.st").as("st"), sum("m.en").as("en"))
    val wc = Window.partitionBy("state").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy("state")
      .orderBy(col("active").desc, col("h"))
    census
      .withColumn("cs", sum("st").over(wc))
      .withColumn("ce", sum("en").over(wc))
      .withColumn("active", col("cs") - (col("ce") - col("en")))
      .withColumn("ni", sum("st").over(Window.partitionBy("state")))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col("state"), col("ni").as("n_intervals"),
        col("active").as("peak_concurrency"), col("h").as("peak_hour"))
  }

  private def q245OracleSql: String =
    s"""WITH keyed AS (SELECT user_id, event_type,
          (epoch_ns(ts) // 1000000000) * $AttribKeyScale + event_id AS k
        FROM events),
        marked AS (SELECT user_id, event_type, k,
          CASE WHEN lag(event_type) OVER (PARTITION BY user_id
            ORDER BY k) = event_type THEN 0 ELSE 1 END AS newrun
        FROM keyed),
        runs0 AS (SELECT user_id, event_type, k,
          CAST(sum(newrun) OVER (PARTITION BY user_id ORDER BY k
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
        FROM marked),
        runs AS (SELECT user_id, seq, min(k) AS from_k, max(k) AS to_k,
            max(event_type) AS state
          FROM runs0 GROUP BY user_id, seq),
        mk AS (SELECT state, from_k // ${3600L * AttribKeyScale} AS h,
            CAST(1 AS BIGINT) AS st, CAST(0 AS BIGINT) AS en FROM runs
          UNION ALL
          SELECT state, to_k // ${3600L * AttribKeyScale} AS h,
            CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM runs),
        census AS (SELECT state, h, CAST(sum(st) AS BIGINT) AS st,
            CAST(sum(en) AS BIGINT) AS en
          FROM mk GROUP BY state, h),
        sw AS (SELECT state, h, st, en,
            CAST(sum(st) OVER (PARTITION BY state ORDER BY h
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
            CAST(sum(en) OVER (PARTITION BY state ORDER BY h
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ce,
            CAST(sum(st) OVER (PARTITION BY state) AS BIGINT) AS ni
          FROM census),
        act AS (SELECT state, h, ni, cs - (ce - en) AS active,
            row_number() OVER (PARTITION BY state
              ORDER BY cs - (ce - en) DESC, h) AS rn
          FROM sw)
        SELECT state, ni AS n_intervals,
          CAST(active AS BIGINT) AS peak_concurrency, h AS peak_hour
        FROM act WHERE rn = 1"""

  /** q275 attribution windows swept, in seconds. */
  val AttrWindowsS: Seq[Long] = Seq(3600L, 21600L, 86400L)

  /** q275 — ATTRIBUTION-WINDOW SENSITIVITY SWEEP (the robustness
    * check behind q92's single-window attribution: a conversion rate
    * that doubles when the window goes 1 h → 1 d isn't measuring
    * causation, it's measuring the window — the sweep IS the
    * analysis, same pattern as q269's geometry table): per window in
    * {1 h, 6 h, 1 d}, the count and exact ppm share of clicks with at
    * least one same-user purchase inside the window. Computed from
    * ONE pair join: per click the MINIMUM positive click→purchase
    * delay (exact epoch-second integers), then every window reads off
    * the same min-delay frame — the sweep costs one extra 3-row
    * broadcast, not three joins.
    *
    * Scale shape: one user-keyed click×purchase join (per-user volume
    * bounded by activity²), min-agg to one row per click, then a
    * 3-row literal domain cross join and a map-side census. */
  def q275AttributionSweep(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("ts_s"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_s").as("tc"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts_s").as("tp"))
    val minDelay = clicks
      .join(purchases, col("user_id") === col("pu") &&
        col("tp") > col("tc"), "left")
      .groupBy("click_id")
      .agg(min(col("tp") - col("tc")).as("min_delay"))
    val nClicks = clicks.agg(count(lit(1)).as("n_clicks"))
    val windows = AttrWindowsS
      .map(w => s"SELECT ${w}L AS window_s")
      .mkString(" UNION ALL ")
    minDelay.crossJoin(broadcast(s.sql(windows)))
      .groupBy("window_s")
      .agg(sum(when(col("min_delay") <= col("window_s"), 1L)
        .otherwise(0L)).as("n_converted"))
      .crossJoin(broadcast(nClicks))
      .select(col("window_s"), col("n_clicks"), col("n_converted"),
        expr("n_converted * 1000000 div n_clicks").as("rate_ppm"))
  }

  private def q275OracleSql: String = {
    val values = AttrWindowsS.map(w => s"($w)").mkString(", ")
    s"""WITH ev AS (SELECT user_id, event_type, event_id,
          epoch_us(ts) // 1000000 AS ts_s FROM events),
        clicks AS (SELECT user_id, event_id AS click_id, ts_s AS tc
          FROM ev WHERE event_type = 'click'),
        purchases AS (SELECT user_id AS pu, ts_s AS tp
          FROM ev WHERE event_type = 'purchase'),
        md AS (SELECT c.click_id, min(p.tp - c.tc) AS min_delay
          FROM clicks c LEFT JOIN purchases p
            ON c.user_id = p.pu AND p.tp > c.tc
          GROUP BY c.click_id),
        nc AS (SELECT CAST(count(*) AS BIGINT) AS n_clicks
          FROM clicks),
        w(window_s) AS (VALUES $values)
        SELECT CAST(w.window_s AS BIGINT) AS window_s, nc.n_clicks,
          CAST(sum(CASE WHEN md.min_delay <= w.window_s THEN 1 ELSE 0
            END) AS BIGINT) AS n_converted,
          CAST(sum(CASE WHEN md.min_delay <= w.window_s THEN 1 ELSE 0
            END) * 1000000 // nc.n_clicks AS BIGINT) AS rate_ppm
        FROM md CROSS JOIN w CROSS JOIN nc
        GROUP BY w.window_s, nc.n_clicks"""
  }

  /** q278 — LAYOUT PRUNING EVAL, single-column sort vs z-order (the
    * measurement behind q129's prose claim: under a linear (bx) file
    * layout a point filter on the SORT column prunes perfectly and a
    * filter on the OTHER column reads everything — z-order trades a
    * little of the first for most of the second; this query turns
    * that from folklore into two comparable integer rows): both
    * layout MODELS cut the same 256-bucket space into 256 files —
    * linear: file = bx (x fixed per file, y unconstrained); z-order:
    * q129's Morton tiles — and per layout the zone-map width sums
    * Σ(max−min+1) over files for BOTH dimensions are released:
    * sum_width_d div 256 IS the expected file count a uniform point
    * filter on dimension d touches. Same bucketing, same file count,
    * all-integer — the two rows differ only in the property being
    * measured.
    *
    * Scale shape: bucket values are in-row (global maxes broadcast);
    * each layout is one O(files) partial-agg groupBy; no global sort
    * is performed — the layouts are modeled by key arithmetic, which
    * is exactly how the production writer assigns files
    * (repartitionByRange on the layout key). */
  def q278LayoutPruningEval(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
    val mx = li.agg(max("l_partkey").as("mxp"),
      max("l_suppkey").as("mxs"))
    val b = li.crossJoin(broadcast(mx))
      .withColumn("bx",
        expr(s"(l_partkey * ${1L << ZBits}) div (mxp + 1)"))
      .withColumn("by",
        expr(s"(l_suppkey * ${1L << ZBits}) div (mxs + 1)"))
      .withColumn("z", expr(mortonTerms("div")))
    def widths(df: DataFrame, fileCol: String, nm: String): DataFrame =
      df.groupBy(expr(fileCol).as("file_id"))
        .agg(count(lit(1)).as("n"),
          min("bx").as("ix"), max("bx").as("ax"),
          min("by").as("iy"), max("by").as("ay"))
        .agg(count(lit(1)).as("n_files"), sum("n").as("n_rows"),
          sum(expr("ax - ix + 1")).as("sum_width_x"),
          sum(expr("ay - iy + 1")).as("sum_width_y"))
        .select(lit(nm).as("layout"), col("n_files"), col("n_rows"),
          col("sum_width_x"), col("sum_width_y"))
    widths(b, "bx", "linear_x")
      .unionByName(widths(b, s"z div $ZFileTiles", "zorder"))
  }

  private def q278OracleSql: String =
    s"""WITH mx AS (SELECT max(l_partkey) AS mxp, max(l_suppkey) AS mxs
          FROM lineitem),
        b AS (SELECT (l_partkey * ${1L << ZBits}) // (mxp + 1) AS bx,
                     (l_suppkey * ${1L << ZBits}) // (mxs + 1) AS by
              FROM lineitem, mx),
        z AS (SELECT bx, by, ${mortonTerms("//")} AS z FROM b),
        lin AS (SELECT bx AS file_id, count(*) AS n,
            min(bx) AS ix, max(bx) AS ax, min(by) AS iy, max(by) AS ay
          FROM z GROUP BY 1),
        zf AS (SELECT z // $ZFileTiles AS file_id, count(*) AS n,
            min(bx) AS ix, max(bx) AS ax, min(by) AS iy, max(by) AS ay
          FROM z GROUP BY 1)
        SELECT 'linear_x' AS layout, CAST(count(*) AS BIGINT)
            AS n_files, CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(sum(ax - ix + 1) AS BIGINT) AS sum_width_x,
          CAST(sum(ay - iy + 1) AS BIGINT) AS sum_width_y
        FROM lin
        UNION ALL
        SELECT 'zorder', CAST(count(*) AS BIGINT),
          CAST(sum(n) AS BIGINT), CAST(sum(ax - ix + 1) AS BIGINT),
          CAST(sum(ay - iy + 1) AS BIGINT)
        FROM zf"""

  /** q288 SLA bound in days. */
  val SlaDays = 90L

  /** q288 — SHIPPING-SLA CONFORMANCE AUDIT (the operational
    * order-to-ship readout q107 ranks revenue by but never measures:
    * per priority class, how long fulfilment actually takes and how
    * much of it blows the 90-day bound — the census-quantile +
    * breach-share shape every SLA dashboard is made of): delay =
    * whole days order → line ship date (calendar-date difference,
    * identical on both engines), per priority the line count, the
    * census p50 and p95 (q253's discrete convention), and the breach
    * share in exact ppm.
    *
    * Scale shape: one fact-fact join on the order key the tables
    * already share + a map-side (priority, delay) census; quantiles
    * ride the census cumsum window (q132 discipline). */
  def q288ShippingSla(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(t(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("bigint").as("delay"))
      .groupBy("priority", "delay").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("priority").orderBy("delay")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("priority")
    census
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(tot))
      .groupBy("priority")
      .agg(max("n").as("n"),
        min(when(expr("cum * 100 >= n * 50"), col("delay")))
          .as("p50_days"),
        min(when(expr("cum * 100 >= n * 95"), col("delay")))
          .as("p95_days"),
        expr(s"""CAST(sum(CASE WHEN delay > $SlaDays THEN c ELSE 0
             END) * 1000000 div max(n) AS BIGINT)""")
          .as("breach_ppm"))
  }

  private def q288OracleSql: String =
    s"""WITH census AS (SELECT o_orderpriority AS priority,
          CAST(date_diff('day', CAST(o_orderdate AS DATE),
            CAST(l_shipdate AS DATE)) AS BIGINT) AS delay,
          CAST(count(*) AS BIGINT) AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
        cum AS (SELECT priority, delay, c,
            CAST(sum(c) OVER (PARTITION BY priority ORDER BY delay
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
            CAST(sum(c) OVER (PARTITION BY priority) AS BIGINT) AS n
          FROM census)
        SELECT priority, CAST(max(n) AS BIGINT) AS n,
          min(CASE WHEN cum * 100 >= n * 50 THEN delay END)
            AS p50_days,
          min(CASE WHEN cum * 100 >= n * 95 THEN delay END)
            AS p95_days,
          CAST(sum(CASE WHEN delay > $SlaDays THEN c ELSE 0 END)
            * 1000000 // max(n) AS BIGINT) AS breach_ppm
        FROM cum GROUP BY priority"""

  /** q290 session-length cap for the band axis. */
  val SessConvCap = 10L

  /** q290 — SESSION-LENGTH → CONVERSION CURVE (the engagement-to-
    * outcome readout product analytics lives on: do longer sessions
    * convert more, and where does the curve saturate — the number
    * that decides whether "time on site" is worth optimizing): q41's
    * 30-minute-gap sessionization (same second-truncated boundaries),
    * each session banded by its event count (capped at 10), per band
    * the session count, converting-session count (≥1 purchase), and
    * the conversion share in exact ppm.
    *
    * Scale shape: one user-keyed exchange for the session window
    * (the sessionizer's own shuffle), then a map-side (band) census;
    * the curve is a ≤10-row frame. */
  def q290SessionConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 1000000").as("ts_s"))
    val w = Window.partitionBy("user_id").orderBy("ts_s")
    val sess = ev
      .withColumn("brk",
        when(col("ts_s") - lag("ts_s", 1).over(w) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purch"))
    sess
      .select(expr(s"least(n_events, $SessConvCap)").as("len_band"),
        (col("n_purch") > 0L).as("conv"))
      .groupBy("len_band")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("conv"), 1L).otherwise(0L)).as("n_converted"))
      .withColumn("rate_ppm",
        expr("n_converted * 1000000 div n_sessions"))
  }

  private def q290OracleSql: String =
    s"""WITH e AS (SELECT user_id, event_type,
          epoch_us(ts) // 1000000 AS ts_s FROM events),
        x AS (SELECT user_id, event_type, ts_s,
            CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id
              ORDER BY ts_s) > 1800 THEN 1 ELSE 0 END AS brk
          FROM e),
        y AS (SELECT user_id, event_type,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
        sess AS (SELECT user_id, sid,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS n_purch
          FROM y GROUP BY user_id, sid),
        b AS (SELECT least(n_events, $SessConvCap) AS len_band,
            n_purch > 0 AS conv
          FROM sess)
        SELECT len_band, CAST(count(*) AS BIGINT) AS n_sessions,
          CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
            AS n_converted,
          CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS rate_ppm
        FROM b GROUP BY len_band"""

  // ------------------------------------------------------------ q410

  /** q410's per-encoding byte formulas over the exact census scalars
    * {n, ndv, runs, plain (Σ lengths), maxlen}: PLAIN = Σ lengths;
    * DICT = dictionary (Σ distinct lengths) + (n·bits + 7) div 8 with
    * bits = max(⌈log2 ndv⌉, 1) (log2 on an exact int; exact at the
    * powers of two where the ceiling could flip); RLE = runs ·
    * (maxlen + 4) — value padded to the column max plus a 4-byte run
    * length. Shared text on both engines. */
  private def encBytes(col: String): Seq[String] = Seq(
    s"CAST(plain_$col AS BIGINT) AS plain_bytes",
    s"""CAST(dlen_$col + (n * greatest(CAST(ceil(log2(ndv_$col))
        AS BIGINT), 1) + 7) DIV 8 AS BIGINT) AS dict_bytes""",
    s"CAST(runs_$col * (maxlen_$col + 4) AS BIGINT) AS rle_bytes")

  /** q410 — COLUMNAR ENCODING ADVISOR over the order status/priority
    * columns (the storage-layout decision every columnar writer makes
    * per column chunk — Parquet/ORC pick between plain, dictionary,
    * and run-length encodings from exactly these statistics; at 100 TB
    * the advisor's byte estimates ARE the storage bill, and the runs
    * statistic is why sort order matters to layout: q129's Z-order and
    * q15's clustering change `runs`, not `ndv`): per column the EXACT
    * {n, ndv, runs (counted by the DISTRIBUTED key-shift self-join on
    * the dense orderkey — no total-order window), plain/dict/rle bytes
    * through [[encBytes]]}, and the winning encoding by the fixed
    * dict < rle < plain tie order. Two declared rows, one per column.
    *
    * PRECONDITION — dense keys: the a.k = b.k + 1 run counter is
    * exact ONLY because this generator emits gapless orderkeys from
    * spark.range (max(k) = count(*), asserted in ExtensionsSpec). On
    * a sparse key domain (real TPC-H leaves orderkey gaps) each gap
    * silently swallows a run boundary — and the oracle shares the
    * self-join, so the differential would stay green while both are
    * wrong. Sparse inputs need a row_number() densification pass
    * first (one extra exchange), which this declared query omits by
    * documented contract with its generator.
    *
    * Scale shape: one scan for the census aggregates; ONE shuffle
    * equi-join (key vs key+1) counts run boundaries for both columns
    * simultaneously — the scalable runs counter (a lag window over a
    * global order would single-partition at 100 TB); everything else
    * rides broadcast scalars. */
  def q410EncodingAdvisor(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
    val runs = base.alias("a")
      .join(base.alias("b"), expr("a.k = b.k + 1"))
      .agg((sum(when(expr("a.st <> b.st"), 1L).otherwise(0L)) + 1L)
          .as("runs_st"),
        (sum(when(expr("a.pr <> b.pr"), 1L).otherwise(0L)) + 1L)
          .as("runs_pr"))
    val dicts = base.select(col("st").as("v")).distinct()
      .agg(count(lit(1)).as("ndv_st"), sum(length(col("v")))
        .as("dlen_st"))
      .crossJoin(base.select(col("pr").as("v")).distinct()
        .agg(count(lit(1)).as("ndv_pr"), sum(length(col("v")))
          .as("dlen_pr")))
    val census = base.agg(count(lit(1)).as("n"),
      sum(length(col("st"))).as("plain_st"),
      max(length(col("st"))).cast("bigint").as("maxlen_st"),
      sum(length(col("pr"))).as("plain_pr"),
      max(length(col("pr"))).cast("bigint").as("maxlen_pr"))
    val all = census.crossJoin(broadcast(runs)).crossJoin(broadcast(dicts))
    val stRow = all.select(Seq(lit("o_orderstatus").as("column_name"),
      col("n"), col("ndv_st").as("ndv"), col("runs_st").as("runs")) ++
      encBytes("st").map(expr): _*)
    val prRow = all.select(Seq(lit("o_orderpriority").as("column_name"),
      col("n"), col("ndv_pr").as("ndv"), col("runs_pr").as("runs")) ++
      encBytes("pr").map(expr): _*)
    stRow.unionByName(prRow)
      .withColumn("best", expr(
        """CASE WHEN dict_bytes <= rle_bytes
            AND dict_bytes <= plain_bytes THEN 'dict'
          WHEN rle_bytes <= plain_bytes THEN 'rle'
          ELSE 'plain' END"""))
  }

  private def q410OracleSql: String =
    s"""WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
          o_orderpriority AS pr FROM orders),
        runs AS (SELECT
          CAST(sum(CASE WHEN a.st <> b.st THEN 1 ELSE 0 END) + 1
            AS BIGINT) AS runs_st,
          CAST(sum(CASE WHEN a.pr <> b.pr THEN 1 ELSE 0 END) + 1
            AS BIGINT) AS runs_pr
        FROM base a JOIN base b ON a.k = b.k + 1),
        dict_st AS (SELECT CAST(count(*) AS BIGINT) AS ndv_st,
          CAST(sum(length(v)) AS BIGINT) AS dlen_st
          FROM (SELECT DISTINCT st AS v FROM base) d),
        dict_pr AS (SELECT CAST(count(*) AS BIGINT) AS ndv_pr,
          CAST(sum(length(v)) AS BIGINT) AS dlen_pr
          FROM (SELECT DISTINCT pr AS v FROM base) d),
        census AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(st)) AS BIGINT) AS plain_st,
          CAST(max(length(st)) AS BIGINT) AS maxlen_st,
          CAST(sum(length(pr)) AS BIGINT) AS plain_pr,
          CAST(max(length(pr)) AS BIGINT) AS maxlen_pr
        FROM base),
        allc AS (SELECT * FROM census, runs, dict_st, dict_pr),
        rows_ AS (
          SELECT 'o_orderstatus' AS column_name, n, ndv_st AS ndv,
            runs_st AS runs, ${oracleEnc("st")}
          FROM allc
          UNION ALL
          SELECT 'o_orderpriority', n, ndv_pr, runs_pr,
            ${oracleEnc("pr")}
          FROM allc)
        SELECT column_name, n, ndv, runs, plain_bytes, dict_bytes,
          rle_bytes,
          CASE WHEN dict_bytes <= rle_bytes
              AND dict_bytes <= plain_bytes THEN 'dict'
            WHEN rle_bytes <= plain_bytes THEN 'rle'
            ELSE 'plain' END AS best
        FROM rows_"""

  /** DuckDB spelling of [[encBytes]] (`//` for DIV). */
  private def oracleEnc(col: String): String =
    s"""CAST(plain_$col AS BIGINT) AS plain_bytes,
        CAST(dlen_$col + (n * greatest(CAST(ceil(log2(ndv_$col))
            AS BIGINT), 1) + 7) // 8 AS BIGINT) AS dict_bytes,
        CAST(runs_$col * (maxlen_$col + 4) AS BIGINT) AS rle_bytes"""

  // ------------------------------------------------------------ q417

  /** q417's frame-of-reference sizing over the exact column census
    * {n, mn, mx}: bits = max(⌈log2(mx − mn + 1)⌉, 1), packed =
    * (n·bits + 7) div 8 + 8 (the 8-byte frame base), plain = 8n.
    * log2 on an exact integer; exact at the powers of two where the
    * ceiling could flip. */
  private def forBytes(divOp: String): String =
    s"""greatest(CAST(ceil(log2(CAST(mx - mn + 1 AS DOUBLE)))
        AS BIGINT), 1) AS bits,
      CAST((n * greatest(CAST(ceil(log2(CAST(mx - mn + 1 AS DOUBLE)))
        AS BIGINT), 1) + 7) $divOp 8 + 8 AS BIGINT) AS packed_bytes,
      CAST(n * 8 AS BIGINT) AS plain_bytes"""

  /** q417 — FRAME-OF-REFERENCE (FOR) ENCODING SIZING of the integer
    * fact columns (q410's NUMERIC twin and the other half of the
    * columnar layout bill: int64 key/measure columns bit-pack
    * against their [min, max] frame — Parquet's DELTA_BINARY_PACKED
    * and every OLAP engine's FOR variant; the bits-per-value number
    * falls out of exactly this census, and a 10⁴-part key packing
    * into 14 bits instead of 64 is a 4.5× scan-rate win at 100 TB):
    * per column the EXACT {n, mn, mx, bits, packed_bytes,
    * plain_bytes, savings_ppm}, three declared rows (l_partkey,
    * l_suppkey, floor(l_quantity)).
    *
    * Scale shape: ONE corpus scan map-side combined to three
    * min/max/count triples; the sizing arithmetic rides a 1-row
    * frame per column. */
  def q417ForEncoding(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("mn_p"), max("l_partkey").as("mx_p"),
        min("l_suppkey").as("mn_s"), max("l_suppkey").as("mx_s"),
        min("qty").as("mn_q"), max("qty").as("mx_q"))
    def row(name: String, suffix: String) =
      census.select(lit(name).as("column_name"), col("n"),
          col(s"mn_$suffix").as("mn"), col(s"mx_$suffix").as("mx"))
        .select(Seq(col("column_name"), col("n"), col("mn"),
          col("mx")) :+ expr(s"struct(${forBytes("DIV")})").as("z"): _*)
        .select(col("column_name"), col("n"), col("mn"), col("mx"),
          col("z.bits"), col("z.packed_bytes"), col("z.plain_bytes"))
    row("l_partkey", "p")
      .unionByName(row("l_suppkey", "s"))
      .unionByName(row("qty", "q"))
      .withColumn("savings_ppm", expr(
        """CAST((plain_bytes - packed_bytes) * 1000000
           DIV plain_bytes AS BIGINT)"""))
  }

  private def q417OracleSql: String =
    s"""WITH census AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(min(l_partkey) AS BIGINT) AS mn_p,
          CAST(max(l_partkey) AS BIGINT) AS mx_p,
          CAST(min(l_suppkey) AS BIGINT) AS mn_s,
          CAST(max(l_suppkey) AS BIGINT) AS mx_s,
          CAST(min(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
            AS mn_q,
          CAST(max(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
            AS mx_q
        FROM lineitem),
        rows_ AS (
          SELECT 'l_partkey' AS column_name, n, mn_p AS mn, mx_p AS mx
          FROM census
          UNION ALL
          SELECT 'l_suppkey', n, mn_s, mx_s FROM census
          UNION ALL
          SELECT 'qty', n, mn_q, mx_q FROM census),
        sized AS (SELECT column_name, n, mn, mx, ${forBytes("//")}
          FROM rows_)
        SELECT column_name, n, mn, mx, bits, packed_bytes, plain_bytes,
          CAST((plain_bytes - packed_bytes) * 1000000 // plain_bytes
            AS BIGINT) AS savings_ppm
        FROM sized"""

  // ------------------------------------------------------------ q465

  /** q465's per-column audit set: (table, string column). */
  val DictCols: Seq[(String, String)] = Seq(
    ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
    ("part", "p_brand"), ("part", "p_type"),
    ("customer", "c_mktsegment"), ("documents", "source"))

  /** q465 — DICTIONARY-ENCODING SIZE ADVISOR for the string columns
    * (the BYTE-level completion of q410's run/dict/plain pick: q410
    * chooses an encoding class from run structure, this prices the
    * dictionary decision the way a columnar writer does — dict bytes =
    * Σ distinct-value lengths + n·⌈log₂ ndv⌉/8 index bits vs plain =
    * Σ value lengths — and the win ratio decides whether the column
    * page carries a dictionary at all). Exact integers: ⌈log₂ ndv⌉ by
    * an integer CASE ladder (no engine-side log), win_ppm =
    * 10⁶·dict div plain.
    *
    * Scale shape: per column, one scan map-side combined to a
    * \|values\|-bounded distinct census; the 6-row advisory is
    * independent aggregates unioned. */
  def q465DictEncodingAdvisor(s: SparkSession, dir: String): DataFrame = {
    val bitsLadder = (1 to 40).map(b =>
      s"WHEN ndv <= ${1L << b} THEN $b").mkString(
      "CASE WHEN ndv <= 1 THEN 1 ", " ", " ELSE 63 END")
    DictCols.map { case (tab, c) =>
      val stats = t(s, dir, tab)
        .agg(count(lit(1)).as("n"),
          sum(length(col(c)).cast("bigint")).as("plain_bytes"),
          countDistinct(col(c)).as("ndv"))
      val dict = t(s, dir, tab).select(col(c).as("v")).distinct()
        .agg(sum(length(col("v")).cast("bigint")).as("dict_entry_bytes"))
      stats.crossJoin(dict)
        .select(lit(s"$tab.$c").as("column_name"), col("n"),
          col("ndv"), col("plain_bytes"),
          expr(s"""dict_entry_bytes
               + (n * ($bitsLadder) + 7) div 8""").as("dict_bytes"),
          expr(s"""(dict_entry_bytes
               + (n * ($bitsLadder) + 7) div 8) * 1000000
               div plain_bytes""").as("win_ppm"))
    }.reduce(_ unionByName _)
  }

  private def q465OracleSql: String = {
    val bitsLadder = (1 to 40).map(b =>
      s"WHEN ndv <= ${1L << b} THEN $b").mkString(
      "CASE WHEN ndv <= 1 THEN 1 ", " ", " ELSE 63 END")
    DictCols.map { case (tab, c) =>
      s"""SELECT '$tab.$c' AS column_name,
          CAST(count(*) AS BIGINT) AS n,
          CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
          CAST(sum(strlen($c)) AS BIGINT) AS plain_bytes,
          (SELECT CAST(sum(strlen(v)) AS BIGINT)
             FROM (SELECT DISTINCT $c AS v FROM $tab) z)
            + (CAST(count(*) AS BIGINT)
               * (SELECT $bitsLadder FROM (SELECT
                    CAST(count(DISTINCT $c) AS BIGINT) AS ndv
                  FROM $tab) w) + 7) // 8 AS dict_bytes,
          ((SELECT CAST(sum(strlen(v)) AS BIGINT)
             FROM (SELECT DISTINCT $c AS v FROM $tab) z)
            + (CAST(count(*) AS BIGINT)
               * (SELECT $bitsLadder FROM (SELECT
                    CAST(count(DISTINCT $c) AS BIGINT) AS ndv
                  FROM $tab) w) + 7) // 8) * 1000000
            // CAST(sum(strlen($c)) AS BIGINT) AS win_ppm
        FROM $tab"""
    }.mkString("\n        UNION ALL\n        ")
  }

  // ------------------------------------------------------------ q466

  /** q466's audited date axes: (table, date column). */
  val GapCols: Seq[(String, String)] = Seq(
    ("orders", "o_orderdate"), ("lineitem", "l_shipdate"),
    ("events", "ts"))

  /** q466 — CALENDAR COMPLETENESS AUDIT over the date axes (the
    * data-quality screen every ingest dashboard runs before any
    * time-series query is trusted: q304/q432/q444 silently bridge
    * missing days — this measures HOW MANY are missing and the
    * longest silent stretch, the "did the pipeline skip a day"
    * alarm). Per axis: exact {n_days observed, span_days, missing =
    * span − observed, max_gap = longest day gap − 1} off a distinct-
    * day census and ONE ordered lag window.
    *
    * Scale shape: per axis one scan map-side combined to the distinct-
    * day census; the gap scan is a window over ≤ span rows. */
  def q466DateGapAudit(s: SparkSession, dir: String): DataFrame =
    GapCols.map { case (tab, c) =>
      val days = t(s, dir, tab)
        .select(to_date(col(c)).as("day")).distinct()
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      val gaps = days
        .withColumn("gap",
          expr("datediff(day, lag(day, 1) OVER (ORDER BY day))"))
      gaps.agg(count(lit(1)).as("n_days"),
          (datediff(max("day"), min("day")) + 1).cast("bigint")
            .as("span_days"),
          coalesce(max("gap"), lit(1)).cast("bigint").as("maxstep"))
        .select(lit(s"$tab.$c").as("axis"), col("n_days"),
          col("span_days"),
          (col("span_days") - col("n_days")).as("missing_days"),
          (col("maxstep") - 1L).as("max_gap_days"))
    }.reduce(_ unionByName _)

  private def q466OracleSql: String =
    GapCols.map { case (tab, c) =>
      s"""SELECT '$tab.$c' AS axis,
          CAST(count(*) AS BIGINT) AS n_days,
          CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
          CAST(max(day) - min(day) + 1 AS BIGINT)
            - CAST(count(*) AS BIGINT) AS missing_days,
          CAST(coalesce(max(gap), 1) - 1 AS BIGINT) AS max_gap_days
        FROM (SELECT day, day - lag(day) OVER (ORDER BY day) AS gap
              FROM (SELECT DISTINCT CAST($c AS DATE) AS day
                    FROM $tab) d) g"""
    }.mkString("\n        UNION ALL\n        ")

  // ------------------------------------------------------------ q468

  /** q468's geometry: histogram buckets and the probe predicates
    * (range selectivities a planner would actually ask for). */
  val HistAdvBuckets = 10L
  val HistAdvProbes: Seq[(Long, Long)] =
    Seq((0L, 5L), (5L, 10L), (10L, 15L), (15L, 20L), (20L, 25L),
      (25L, 30L), (30L, 35L), (35L, 40L), (40L, 45L), (45L, 51L))

  /** q468 — HISTOGRAM ERROR ADVISOR: equi-width vs equi-depth
    * selectivity error on l_quantity (the estimation-quality
    * face-off behind every planner's histogram choice — q83 builds
    * equi-width, q168 equi-depth; a cost model needs to know WHICH
    * answers range predicates better on this column, measured as
    * estimation error against exact truth over a probe workload).
    * For each probe range [lo, hi): truth = exact count; equi-width
    * estimate assumes uniform-within-bucket (integer interpolation);
    * equi-depth estimate likewise over its quantile bounds. Released
    * per histogram type: {htype, mean_abs_err_ppm, max_err_ppm} —
    * exact integers (errors in ppm of n, interpolation by integer
    * division, both declared).
    *
    * Scale shape: one scan to the value census (l_quantity has ≤ 50
    * distinct values — domain-bounded); both histograms and all probe
    * evaluations ride that census. */
  def q468HistogramErrorAdvisor(s: SparkSession, dir: String)
      : DataFrame = {
    val census = t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_quantity) AS BIGINT)").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val n = census.agg(sum("c").as("n"), min("v").as("vmin"),
      (max("v") + 1).as("vmax")).localCheckpoint(true)
    // truth per probe
    val truth = HistAdvProbes.map { case (lo, hi) =>
      census.filter(col("v") >= lo && col("v") < hi)
        .agg(coalesce(sum("c"), lit(0L)).as("truth"))
        .select(lit(lo).as("lo"), lit(hi).as("hi"), col("truth"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    // equi-width: bucket b of [vmin, vmax) split in 10; est for
    // [lo,hi) = sum over buckets of overlap_fraction * bucket_count
    // (integer: count * overlap_width div bucket_width)
    val ewBuckets = census.crossJoin(broadcast(n))
      .withColumn("b",
        expr(s"least(($HistAdvBuckets * (v - vmin)) div (vmax - vmin), ${HistAdvBuckets - 1})"))
      .groupBy("b").agg(sum("c").as("bc"))
      .crossJoin(broadcast(n))
      .select(col("b"), col("bc"),
        expr(s"vmin + (b * (vmax - vmin)) div $HistAdvBuckets").as("blo"),
        expr(s"vmin + ((b + 1) * (vmax - vmin)) div $HistAdvBuckets")
          .as("bhi"))
      .localCheckpoint(true)
    val ewEst = truth.crossJoin(ewBuckets)
      .select(col("lo"), col("hi"), col("truth"),
        expr("""CASE WHEN bhi <= lo OR blo >= hi THEN CAST(0 AS BIGINT)
             ELSE bc * (least(hi, bhi) - greatest(lo, blo))
               div (bhi - blo) END""").as("part"))
      .groupBy("lo", "hi", "truth").agg(sum("part").as("est"))
    // equi-depth: bucket bounds at n*k/10 positions of the cum census
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = census.select(col("v"), col("c"),
      sum("c").over(w).as("cumc")).crossJoin(broadcast(n))
    val edBounds = cum
      .withColumn("bket",
        expr(s"least(($HistAdvBuckets * (cumc - 1)) div n, ${HistAdvBuckets - 1})"))
      .groupBy("bket").agg(min("v").as("blo"), (max("v") + 1).as("bhi"),
        sum("c").as("bc"))
      .localCheckpoint(true)
    val edEst = truth.crossJoin(edBounds)
      .select(col("lo"), col("hi"), col("truth"),
        expr("""CASE WHEN bhi <= lo OR blo >= hi THEN CAST(0 AS BIGINT)
             ELSE bc * (least(hi, bhi) - greatest(lo, blo))
               div (bhi - blo) END""").as("part"))
      .groupBy("lo", "hi", "truth").agg(sum("part").as("est"))
    Seq(("equi_width", ewEst), ("equi_depth", edEst)).map {
      case (nm, est) =>
        est.crossJoin(broadcast(n.select(col("n"))))
          .select(expr("abs(est - truth) * 1000000 div n").as("err"))
          .agg(sum("err").as("serr"), max("err").as("maxe"),
            count(lit(1)).as("np"))
          .select(lit(nm).as("htype"),
            expr("serr div np").as("mean_abs_err_ppm"),
            col("maxe").as("max_err_ppm"))
    }.reduce(_ unionByName _)
  }

  private def q468OracleSql: String = {
    val probes = HistAdvProbes.map { case (lo, hi) =>
      s"SELECT CAST($lo AS BIGINT) AS lo, CAST($hi AS BIGINT) AS hi" }
      .mkString("\n          UNION ALL ")
    s"""WITH census AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
          CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
        n AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          CAST(min(v) AS BIGINT) AS vmin,
          CAST(max(v) + 1 AS BIGINT) AS vmax FROM census),
        probes AS ($probes),
        truth AS (SELECT p.lo, p.hi,
            CAST(coalesce(sum(CASE WHEN c2.v >= p.lo AND c2.v < p.hi
              THEN c2.c END), 0) AS BIGINT) AS truth
          FROM probes p LEFT JOIN census c2 ON TRUE
          GROUP BY p.lo, p.hi),
        ew AS (SELECT b, CAST(sum(c) AS BIGINT) AS bc,
            CAST(max(vmin + (b * (vmax - vmin)) // $HistAdvBuckets)
              AS BIGINT) AS blo,
            CAST(max(vmin + ((b + 1) * (vmax - vmin))
              // $HistAdvBuckets) AS BIGINT) AS bhi
          FROM (SELECT v, c, vmin, vmax,
                least(($HistAdvBuckets * (v - vmin)) // (vmax - vmin),
                  ${HistAdvBuckets - 1}) AS b
                FROM census CROSS JOIN n) z
          GROUP BY b),
        ewest AS (SELECT t.lo, t.hi, t.truth,
            CAST(sum(CASE WHEN e.bhi <= t.lo OR e.blo >= t.hi THEN 0
              ELSE e.bc * (least(t.hi, e.bhi) - greatest(t.lo, e.blo))
                // (e.bhi - e.blo) END) AS BIGINT) AS est
          FROM truth t CROSS JOIN ew e GROUP BY 1, 2, 3),
        cum AS (SELECT v, c,
            CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumc
          FROM census),
        ed AS (SELECT bket, CAST(min(v) AS BIGINT) AS blo,
            CAST(max(v) + 1 AS BIGINT) AS bhi,
            CAST(sum(c) AS BIGINT) AS bc
          FROM (SELECT v, c,
                least(($HistAdvBuckets * (cumc - 1)) // n,
                  ${HistAdvBuckets - 1}) AS bket
                FROM cum CROSS JOIN n) z
          GROUP BY bket),
        edest AS (SELECT t.lo, t.hi, t.truth,
            CAST(sum(CASE WHEN e.bhi <= t.lo OR e.blo >= t.hi THEN 0
              ELSE e.bc * (least(t.hi, e.bhi) - greatest(t.lo, e.blo))
                // (e.bhi - e.blo) END) AS BIGINT) AS est
          FROM truth t CROSS JOIN ed e GROUP BY 1, 2, 3)
        SELECT 'equi_width' AS htype,
          CAST(sum(abs(est - truth) * 1000000 // n) // count(*)
            AS BIGINT) AS mean_abs_err_ppm,
          CAST(max(abs(est - truth) * 1000000 // n) AS BIGINT)
            AS max_err_ppm
        FROM ewest CROSS JOIN n
        UNION ALL
        SELECT 'equi_depth' AS htype,
          CAST(sum(abs(est - truth) * 1000000 // n) // count(*)
            AS BIGINT) AS mean_abs_err_ppm,
          CAST(max(abs(est - truth) * 1000000 // n) AS BIGINT)
            AS max_err_ppm
        FROM edest CROSS JOIN n"""
  }

  // ------------------------------------------------------------ q482

  /** q482's swept gaps (seconds). */
  val SessionGapsS: Seq[Long] = Seq(900L, 1800L, 3600L)

  /** q482 — SESSION GAP SENSITIVITY SWEEP (the calibration pass behind
    * q41's 30-minute constant — the eternal sessionization question
    * is WHICH gap, and the defensible answer is this curve: session
    * count and mean length as a function of the threshold, read for
    * the knee). The identity that makes it one pass:
    * sessions(G) = users + #(per-user inter-event gaps > G) — so all
    * three thresholds fold over ONE lag frame as conditional counts,
    * no per-gap re-sessionization. Exact integers: {gap_s,
    * n_sessions, mean_events_milli}.
    *
    * Scale shape: one corpus scan → ONE user-keyed lag window; the
    * sweep is three conditional sums on that frame; 3-row output. */
  def q482SessionGapSweep(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tse", "event_id")
    val lagged = t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("CAST(date_trunc('second', ts) AS LONG)").as("tse"))
      .withColumn("gap", col("tse") - lag("tse", 1).over(w))
    val aggs = SessionGapsS.map(g =>
      sum(when(col("gap") > g, 1L).otherwise(0L)).as(s"brk_$g"))
    val gagg = lagged.agg(countDistinct("user_id").as("nu"),
      (count(lit(1)).as("ne") +: aggs): _*)
    SessionGapsS.map { g =>
      gagg.select(lit(g).as("gap_s"),
        (col("nu") + col(s"brk_$g")).as("n_sessions"),
        expr(s"1000 * ne div (nu + brk_$g)").as("mean_events_milli"))
    }.reduce(_ unionByName _)
  }

  private def q482OracleSql: String = {
    val brkCols = SessionGapsS.map(g =>
      s"""CAST(sum(CASE WHEN gap > $g THEN 1 ELSE 0 END) AS BIGINT)
          AS brk_$g""").mkString(", ")
    val rows = SessionGapsS.map(g =>
      s"""SELECT CAST($g AS BIGINT) AS gap_s,
          nu + brk_$g AS n_sessions,
          1000 * ne // (nu + brk_$g) AS mean_events_milli
        FROM g""").mkString("\n        UNION ALL\n        ")
    s"""WITH lagged AS (SELECT user_id,
          CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tse,
          CAST(epoch(date_trunc('second', ts)) AS BIGINT)
            - lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
              OVER (PARTITION BY user_id
                ORDER BY date_trunc('second', ts), event_id) AS gap
          FROM events),
        g AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
          CAST(count(*) AS BIGINT) AS ne, $brkCols
          FROM lagged)
        $rows"""
  }

  // ------------------------------------------------------------ q490

  /** q490 — JSON PROPS PROFILE with parse audit (the semi-structured
    * source-profiling step q27's extraction assumes away: before a
    * pipeline trusts `props.k` it needs the PARSE ledger — how many
    * rows yield a value at all, the value range and spread, how many
    * carry garbage; a silent null from get_json_object is
    * indistinguishable from real absence unless someone counted).
    * One pass: k = get_json_object(props, '$.k') cast to long;
    * released one row {n, n_valid, n_invalid, k_min, k_max,
    * k_mean_milli, k_distinct} — exact integers.
    *
    * Scale shape: one corpus scan, codegen'd JSON path + cast,
    * map-side combined to one row (the distinct count is the one
    * key-domain-bounded shuffle). */
  def q490JsonPropsProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
        .as("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_invalid"),
        min("k").as("k_min"), max("k").as("k_max"),
        sum(coalesce(col("k"), lit(0L))).as("k_sum"),
        countDistinct("k").as("k_distinct"))
      .select(col("n"), col("n_valid"), col("n_invalid"),
        col("k_min"), col("k_max"),
        expr("""CASE WHEN n_valid = 0 THEN NULL
             ELSE 1000 * k_sum div n_valid END""").as("k_mean_milli"),
        col("k_distinct"))

  private def q490OracleSql: String =
    """WITH p AS (SELECT TRY_CAST(json_extract_string(props, '$.k')
          AS BIGINT) AS k FROM events)
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_valid,
          CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_invalid,
          CAST(min(k) AS BIGINT) AS k_min,
          CAST(max(k) AS BIGINT) AS k_max,
          CASE WHEN sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) = 0
            THEN NULL
            ELSE 1000 * CAST(sum(coalesce(k, 0)) AS BIGINT)
              // CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) END AS k_mean_milli,
          CAST(count(DISTINCT k) AS BIGINT) AS k_distinct
        FROM p"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q482_session_gap_sweep" -> (q482SessionGapSweep _),
    "q490_json_props_profile" -> (q490JsonPropsProfile _),
    "q468_histogram_error_advisor" -> (q468HistogramErrorAdvisor _),
    "q465_dict_encoding_advisor" -> (q465DictEncodingAdvisor _),
    "q466_date_gap_audit" -> (q466DateGapAudit _),
    "q417_for_encoding" -> (q417ForEncoding _),
    "q410_encoding_advisor" -> (q410EncodingAdvisor _),
    "q290_session_conversion" -> (q290SessionConversion _),
    "q288_shipping_sla" -> (q288ShippingSla _),
    "q278_layout_pruning_eval" -> (q278LayoutPruningEval _),
    "q275_attribution_sweep" -> (q275AttributionSweep _),
    "q245_peak_concurrency" -> (q245PeakConcurrency _),
    "q232_lateness_audit" -> (q232LatenessAudit _),
    "q233_t_closeness" -> (q233TCloseness _),
    "q229_tv_distance" -> (q229TvDistance _),
    "q226_join_blowup" -> (q226JoinBlowup _),
    "q150_markov_transitions" -> (q150MarkovTransitions _),
    "q123_bucketed_join" -> (q123BucketedJoin _),
    "q129_zorder_layout" -> (q129ZorderLayout _),
    "q132_ks_drift" -> (q132KsDrift _),
    "q156_categorical_drift" -> (q156CategoricalDrift _),
    "q158_zone_map" -> (q158ZoneMap _),
    "q160_forward_fill" -> (q160ForwardFill _),
    "q161_asof_join" -> (q161AsofJoin _),
    "q162_mad_outliers" -> (q162MadOutliers _),
    "q163_salted_join" -> (q163SaltedJoin _),
    "q508_aqe_skew_parity" -> (q508AqeSkewParity _),
    "q164_rolling_window" -> (q164RollingWindow _),
    "q167_k_anonymity" -> (q167KAnonymity _),
    "q217_l_diversity" -> (q217LDiversity _),
    "q219_burst_detection" -> (q219BurstDetection _),
    "q168_equidepth_histogram" -> (q168EquidepthHistogram _),
    "q169_interval_join" -> (q169IntervalJoin _),
    "q170_linear_interp" -> (q170LinearInterp _),
    "q171_dp_counts" -> (q171DpCounts _),
    "q173_bitmap_index" -> (q173BitmapIndex _),
    "q174_ab_lift" -> (q174AbLift _),
    "q175_gini" -> (q175Gini _),
    "q176_weighted_median" -> (q176WeightedMedian _),
    "q177_assoc_rules" -> (q177AssocRules _),
    "q178_twap" -> (q178Twap _),
    "q179_percentile_interp" -> (q179PercentileInterp _),
    "q134_funnel" -> (q134Funnel _),
    "q143_state_intervals" -> (q143StateIntervals _),
    "q116_pareto_front" -> (q116ParetoFront _),
    "q104_partition_stats" -> (q104PartitionStats _),
    "q106_winsorize" -> (q106Winsorize _),
    "q107_shipping_priority" -> (q107ShippingPriority _),
    "q20_groupby_agg" -> (q20GroupbyAgg _),
    "q21_window_rank" -> (q21WindowRank _),
    "q22_semi_anti_join" -> (q22SemiAntiJoin _),
    "q23_dedup_exact" -> (q23DedupExact _),
    "q24_text_stats" -> (q24TextStats _),
    "q25_topk_similarity" -> (q25TopkSimilarity _),
    "q26_event_windows" -> (q26EventWindows _),
    "q27_json_extract" -> (q27JsonExtract _),
    "q28_setops" -> (q28Setops _),
    "q39_rollup" -> (q39Rollup _),
    "q40_cube" -> (q40Cube _),
    "q41_sessionize" -> (q41Sessionize _),
    "q67_grouping_sets" -> (q67GroupingSets _),
    "q68_map_funcs" -> (q68MapFuncs _),
    "q69_rank_family" -> (q69RankFamily _),
    "q73_argminmax" -> (q73ArgMinMax _),
    "q74_sliding_windows" -> (q74SlidingWindows _),
    "q77_correlated_subquery" -> (q77CorrelatedSubquery _),
    "q78_lateral" -> (q78Lateral _),
    "q82_zscore_outliers" -> (q82ZscoreOutliers _),
    "q83_histogram" -> (q83Histogram _),
    "q88_bloom_prune" -> (q88BloomPrune _),
    "q92_click_attribution" -> (q92ClickAttribution _),
    "q335_multi_touch" -> (q335MultiTouch _),
    "q93_retention_cohorts" -> (q93RetentionCohorts _),
    "q94_mergeable_stats" -> (q94MergeableStats _),
    "q43_scalar_funcs" -> (q43ScalarFuncs _),
    "q44_left_outer" -> (q44LeftOuter _),
    "q45_full_outer" -> (q45FullOuter _),
    "q46_window_frames" -> (q46WindowFrames _),
    "q47_approx_distinct" -> (q47ApproxDistinct _),
    "q48_profile" -> (q48Profile _),
    "q49_pivot" -> (q49Pivot _),
    "q50_unpivot" -> (q50Unpivot _),
    "q51_explode" -> (q51Explode _),
    "q53_date_funcs" -> (q53DateFuncs _),
    "q54_json_struct" -> (q54JsonStruct _),
    "q55_array_funcs" -> (q55ArrayFuncs _),
    "q56_moments" -> (q56Moments _),
    "q57_asof_join" -> (q57AsofJoin _),
    "q58_range_join" -> (q58RangeJoin _),
    "q60_percentiles" -> (q60Percentiles _))

  val oracleSql: Map[String, String] = Map(
    "q482_session_gap_sweep" -> q482OracleSql,
    "q490_json_props_profile" -> q490OracleSql,
    "q468_histogram_error_advisor" -> q468OracleSql,
    "q465_dict_encoding_advisor" -> q465OracleSql,
    "q466_date_gap_audit" -> q466OracleSql,
    "q417_for_encoding" -> q417OracleSql,
    "q410_encoding_advisor" -> q410OracleSql,
    "q290_session_conversion" -> q290OracleSql,
    "q288_shipping_sla" -> q288OracleSql,
    "q278_layout_pruning_eval" -> q278OracleSql,
    "q275_attribution_sweep" -> q275OracleSql,
    "q245_peak_concurrency" -> q245OracleSql,
    "q232_lateness_audit" -> q232OracleSql,
    "q233_t_closeness" -> q233OracleSql,
    "q229_tv_distance" -> q229OracleSql,
    "q226_join_blowup" -> q226OracleSql,
    "q150_markov_transitions" -> q150OracleSql,
    "q116_pareto_front" -> q116OracleSql,
    "q129_zorder_layout" -> q129OracleSql,
    "q132_ks_drift" -> q132OracleSql,
    "q156_categorical_drift" -> q156OracleSql,
    "q158_zone_map" -> q158OracleSql,
    "q160_forward_fill" -> q160OracleSql,
    "q161_asof_join" -> q161OracleSql,
    "q162_mad_outliers" -> q162OracleSql,
    "q163_salted_join" -> q163OracleSql,
    "q508_aqe_skew_parity" -> q508OracleSql,
    "q164_rolling_window" -> q164OracleSql,
    "q167_k_anonymity" -> q167OracleSql,
    "q217_l_diversity" -> q217OracleSql,
    "q219_burst_detection" -> q219OracleSql,
    "q168_equidepth_histogram" -> q168OracleSql,
    "q169_interval_join" -> q169OracleSql,
    "q170_linear_interp" -> q170OracleSql,
    "q171_dp_counts" -> q171OracleSql,
    "q173_bitmap_index" -> q173OracleSql,
    "q174_ab_lift" -> q174OracleSql,
    "q175_gini" -> q175OracleSql,
    "q176_weighted_median" -> q176OracleSql,
    "q177_assoc_rules" -> q177OracleSql,
    "q178_twap" -> q178OracleSql,
    "q179_percentile_interp" -> q179OracleSql,
    "q134_funnel" -> q134OracleSql,
    "q143_state_intervals" -> q143OracleSql,
    "q104_partition_stats" -> q104OracleSql,
    "q106_winsorize" -> q106OracleSql,
    "q107_shipping_priority" -> q107OracleSql,
    "q20_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price,
         min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q21_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_name, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) WHERE rn = 1""",
    "q22_semi_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderstatus = 'P')""",
    "q23_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
           SELECT doc_id, lang, source, n_chars,
                  row_number() OVER (PARTITION BY text ORDER BY doc_id)
                    AS rn
           FROM documents) WHERE rn = 1""",
    "q24_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words
         FROM documents GROUP BY lang""",
    "q25_topk_similarity" ->
      """WITH p AS (SELECT CAST(embedding AS DOUBLE[]) AS pv
                    FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id FROM embeddings e, p
         ORDER BY
           list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pv) /
           (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(p.pv, p.pv))) DESC,
           e.vec_id
         LIMIT 20""",
    "q26_event_windows" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_value
         FROM events GROUP BY 1, 2""",
    "q27_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT)
         AS k FROM events""",
    "q28_setops" ->
      """SELECT key, 'has_orders' AS tag FROM (
           SELECT c_custkey AS key FROM customer
           INTERSECT SELECT o_custkey FROM orders)
         UNION ALL
         SELECT key, 'no_orders' AS tag FROM (
           SELECT c_custkey AS key FROM customer
           EXCEPT SELECT o_custkey FROM orders)""",
    "q39_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q40_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q67_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q68_map_funcs" ->
      """SELECT event_id,
         CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
         array_to_string(list_sort(json_keys(props)), ',') AS keys,
         CAST(props->>'k' AS BIGINT) AS k_val,
         CAST(props->>'k' AS BIGINT) * 2 AS k_doubled
         FROM events""",
    "q69_rank_family" ->
      """SELECT c_custkey, c_nationkey,
         CAST(ntile(4) OVER w AS BIGINT) AS tile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey
                      ORDER BY c_acctbal, c_custkey)""",
    "q73_argminmax" ->
      """SELECT c_nationkey,
         arg_max(c_name, c_custkey) AS newest_name,
         arg_min(c_name, c_custkey) AS oldest_name,
         max(c_custkey) AS max_key
         FROM customer GROUP BY c_nationkey""",
    "q82_zscore_outliers" -> q82OracleSql,
    "q83_histogram" -> q83OracleSql,
    "q88_bloom_prune" -> q88OracleSql,
    "q92_click_attribution" -> q92OracleSql,
    "q335_multi_touch" -> q335OracleSql,
    "q93_retention_cohorts" -> q93OracleSql,
    "q123_bucketed_join" -> q123OracleSql,
    "q94_mergeable_stats" -> q94OracleSql,
    "q77_correlated_subquery" ->
      """SELECT c_custkey,
         (SELECT count(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey) AS n_orders
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderstatus = 'P')""",
    "q78_lateral" ->
      """SELECT n.n_nationkey, t.c_custkey, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""",
    "q74_sliding_windows" ->
      """WITH assigned AS (
           SELECT CAST(date_trunc('day', ts) AS DATE) AS win_start,
                  event_type, value FROM events
           UNION ALL
           SELECT CAST(date_trunc('day', ts) AS DATE) - 1 AS win_start,
                  event_type, value FROM events)
         SELECT win_start, event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_value
         FROM assigned GROUP BY win_start, event_type""",
    "q41_sessionize" ->
      """WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts_s
                    FROM events),
         o AS (SELECT user_id, ts_s,
                 CASE WHEN lag(ts_s) OVER w IS NULL
                        OR ts_s - lag(ts_s) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)),
         s2 AS (SELECT user_id, ts_s,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS sid
                FROM o)
         SELECT user_id, min(ts_s) AS session_start,
                max(ts_s) AS session_end, count(*) AS n_events
         FROM s2 GROUP BY user_id, sid""",
    "q43_scalar_funcs" ->
      """SELECT o_orderkey,
         upper(o_orderpriority) AS prio_upper,
         substring(o_orderpriority, 1, 1) AS prio_code,
         CAST(length(o_orderstatus) AS BIGINT) AS status_len,
         concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         CAST(day(o_orderdate) AS BIGINT) AS o_day,
         o_orderkey % 7 AS key_mod,
         abs(o_orderkey - 1000) AS key_absdiff,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
         CASE WHEN o_orderstatus = 'P' THEN 'pending'
              WHEN o_orderstatus = 'O' THEN 'open'
              ELSE 'done' END AS status_word,
         coalesce(nullif(o_orderstatus, 'P'), '~') AS status_or_tilde
         FROM orders""",
    "q44_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey
         FROM customer LEFT JOIN
           (SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderstatus = 'P') p
         ON c_custkey = p.o_custkey""",
    "q45_full_outer" ->
      """SELECT e.even_key, t.third_key FROM
           (SELECT c_custkey AS even_key FROM customer
            WHERE c_custkey % 2 = 0) e
         FULL OUTER JOIN
           (SELECT c_custkey AS third_key FROM customer
            WHERE c_custkey % 3 = 0) t
         ON e.even_key = t.third_key""",
    "q46_window_frames" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS running_total,
         lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_order,
         lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_order
         FROM orders""",
    "q47_approx_distinct" ->
      """SELECT o_orderpriority,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
         TRUE AS within_5pct
         FROM orders GROUP BY o_orderpriority""",
    "q48_profile" ->
      """SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_name,
         CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
         min(c_custkey) AS min_key, max(c_custkey) AS max_key
         FROM customer""",
    "q49_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_p,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_f
         FROM orders GROUP BY o_orderpriority""",
    "q50_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
         FROM orders GROUP BY o_orderpriority, o_orderstatus""",
    "q51_explode" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wl
                    FROM documents)
         SELECT doc_id,
                CAST(unnest(range(1, len(wl) + 1)) AS BIGINT) AS pos,
                unnest(wl) AS word
         FROM w""",
    "q53_date_funcs" ->
      """SELECT o_orderkey,
         CAST(o_orderdate AS DATE) AS o_date,
         CAST(o_orderdate AS DATE) + 7 AS plus_week,
         CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-07-01')
           AS BIGINT) AS days_to_jul,
         last_day(CAST(o_orderdate AS DATE)) AS month_end,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow
         FROM orders""",
    "q54_json_struct" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         event_type AS etype,
         user_id % 100 AS user_mod
         FROM events""",
    "q55_array_funcs" ->
      """WITH g AS (SELECT label, list_sort(list(vec_id)) AS ids
                    FROM embeddings GROUP BY label)
         SELECT label,
                array_to_string(list_slice(ids, 1, 5), ',') AS first5,
                CAST(len(ids) AS BIGINT) AS n,
                list_contains(ids, 0) AS has_probe,
                ids[-1] AS max_id
         FROM g""",
    "q56_moments" ->
      """SELECT c_nationkey, count(*) AS n,
         CAST(sum(c_custkey) AS BIGINT) AS sum_k,
         CAST(sum(c_custkey * c_custkey) AS BIGINT) AS sum_k2,
         CAST((CAST(count(*) AS HUGEINT) * sum(c_custkey * c_custkey)
              - CAST(sum(c_custkey) AS HUGEINT) * sum(c_custkey))
              // (CAST(count(*) AS HUGEINT) * count(*)) AS BIGINT)
           AS var_floor
         FROM customer GROUP BY c_nationkey""",
    "q57_asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
                    max(o_orderkey) AS o_orderkey
                    FROM orders GROUP BY o_custkey, o_orderdate)
         SELECT e.event_id, o.o_orderkey
         FROM events e
         ASOF LEFT JOIN o ON e.user_id = o.o_custkey
           AND date_trunc('second', e.ts) >= o.o_orderdate""",
    "q58_range_join" ->
      """WITH bands AS (
           SELECT CAST(band AS BIGINT) AS band,
                  band * 250.0 AS lo, (band + 1) * 250.0 AS hi
           FROM (SELECT unnest(range(0, 8)) AS band))
         SELECT p_partkey, band FROM part JOIN bands
         ON p_retailprice >= lo AND p_retailprice < hi""",
    "q60_percentiles" ->
      """SELECT c_nationkey,
         quantile_cont(c_custkey, 0.25) AS p25,
         quantile_cont(c_custkey, 0.5) AS p50,
         quantile_cont(c_custkey, 0.9) AS p90
         FROM customer GROUP BY c_nationkey""")
}
