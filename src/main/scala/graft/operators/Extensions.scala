package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  // Money doubles go through DECIMAL(18,2) so the sum is order-independent.
  def q20GroupbyAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("sum_price"),
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
  // grouping-sets family; one shuffle, subtotal rows carry NULL keys).
  def q39Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("sum_qty"))

  // q40 — full cross-dimensional subtotals: CUBE over status/priority.
  def q40Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q41_sessionize" -> (q41Sessionize _))

  val oracleSql: Map[String, String] = Map(
    "q20_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
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
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
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
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q40_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
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
         FROM s2 GROUP BY user_id, sid""")
}
