package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-7 analytics surface: statistical profiling (correlation matrix),
  * mergeable cardinality sketches (KMV), sequence-pattern mining, graph
  * link prediction, curriculum ordering, and grid-bucketed spatial joins —
  * declared with the same contract as [[Extensions]] (Spark impl + DuckDB
  * oracle, deterministic multiset output, integer/decimal-exact arithmetic
  * wherever a float fold would diverge across engines).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact decimal(38,0) sum — the order-independent carrier for sums of
    * integer products that overflow BIGINT (price-cents² sums reach ~6e19
    * at sf0.1; DuckDB's sum(BIGINT) widens to int128 natively, Spark gets
    * the same exactness from decimal). */
  private def s38(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** q180 — PEARSON CORRELATION MATRIX over the lineitem measures
    * (quantity, price-cents, discount-cents, tax-cents): every pairwise
    * corr from ONE corpus pass of exact integer sums — the feature-drift
    * and redundancy screen a feature pipeline runs before training, and
    * the textbook case for sufficient statistics: corr needs only
    * {n, Σx, Σx², Σxy}, all associative/commutative.
    *
    * Determinism: inputs are scaled to exact integers (cents via the
    * repo's floor(x·100) convention — identical double multiply then
    * floor on both engines); every sum is EXACT (decimal(38,0) here,
    * int128 in DuckDB), so the final corr is one double expression over
    * identical integers — no float fold order anywhere.
    *
    * Scale shape: one map-side-combined aggregate (15 sums) → a single
    * row; the 6-pair matrix is unpivoted from that row with `stack`.
    * Zero joins, zero windows; at 100 TB this is a single scan with a
    * 15-number partial per task — the cheapest possible full-corpus
    * statistic. Degenerate (zero-variance) columns would yield corr NULL
    * via 0/0 — none exist in these measures, and the differential pins
    * the live behavior. */
  def q180CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "lineitem").select(
      col("l_quantity").cast("bigint").as("q"),
      floor(col("l_extendedprice") * 100).as("p"),
      floor(col("l_discount") * 100).as("d"),
      floor(col("l_tax") * 100).as("tx"))
    val agg = m.agg(
      count(lit(1)).as("n"),
      s38(col("q")).as("sq"), s38(col("p")).as("sp"),
      s38(col("d")).as("sd"), s38(col("tx")).as("st"),
      s38(col("q") * col("q")).as("sqq"),
      s38(col("p") * col("p")).as("spp"),
      s38(col("d") * col("d")).as("sdd"),
      s38(col("tx") * col("tx")).as("stt"),
      s38(col("q") * col("p")).as("sqp"),
      s38(col("q") * col("d")).as("sqd"),
      s38(col("q") * col("tx")).as("sqt"),
      s38(col("p") * col("d")).as("spd"),
      s38(col("p") * col("tx")).as("spt"),
      s38(col("d") * col("tx")).as("sdt"))
    agg.selectExpr("n",
      """stack(6,
        'quantity', 'price',    n*sqp - sq*sp, n*sqq - sq*sq, n*spp - sp*sp,
        'quantity', 'discount', n*sqd - sq*sd, n*sqq - sq*sq, n*sdd - sd*sd,
        'quantity', 'tax',      n*sqt - sq*st, n*sqq - sq*sq, n*stt - st*st,
        'price', 'discount',    n*spd - sp*sd, n*spp - sp*sp, n*sdd - sd*sd,
        'price', 'tax',         n*spt - sp*st, n*spp - sp*sp, n*stt - st*st,
        'discount', 'tax',      n*sdt - sd*st, n*sdd - sd*sd, n*stt - st*st)
        AS (x_col, y_col, cov, vx, vy)""")
      .select(col("x_col"), col("y_col"), col("n"),
        (col("cov").cast("double") /
          sqrt(col("vx").cast("double") * col("vy").cast("double")))
          .as("corr"))
  }

  private def q180OracleSql: String =
    """WITH m AS (SELECT CAST(l_quantity AS BIGINT) AS q,
          CAST(floor(l_extendedprice*100) AS BIGINT) AS p,
          CAST(floor(l_discount*100) AS BIGINT) AS d,
          CAST(floor(l_tax*100) AS BIGINT) AS t
        FROM lineitem),
       s AS (SELECT count(*) n, sum(q) sq, sum(p) sp, sum(d) sd, sum(t) st,
          sum(q*q) sqq, sum(p*p) spp, sum(d*d) sdd, sum(t*t) stt,
          sum(q*p) sqp, sum(q*d) sqd, sum(q*t) sqt,
          sum(p*d) spd, sum(p*t) spt, sum(d*t) sdt FROM m),
       pairs AS (
        SELECT 'quantity' xc, 'price' yc, n,
               n*sqp - sq*sp AS cov, n*sqq-sq*sq vx, n*spp-sp*sp vy FROM s
        UNION ALL SELECT 'quantity','discount', n, n*sqd - sq*sd,
               n*sqq-sq*sq, n*sdd-sd*sd FROM s
        UNION ALL SELECT 'quantity','tax', n, n*sqt - sq*st,
               n*sqq-sq*sq, n*stt-st*st FROM s
        UNION ALL SELECT 'price','discount', n, n*spd - sp*sd,
               n*spp-sp*sp, n*sdd-sd*sd FROM s
        UNION ALL SELECT 'price','tax', n, n*spt - sp*st,
               n*spp-sp*sp, n*stt-st*st FROM s
        UNION ALL SELECT 'discount','tax', n, n*sdt - sd*st,
               n*sdd-sd*sd, n*stt-st*st FROM s)
       SELECT xc AS x_col, yc AS y_col, CAST(n AS BIGINT) AS n,
         CAST(cov AS DOUBLE)/sqrt(CAST(vx AS DOUBLE)*CAST(vy AS DOUBLE))
           AS corr
       FROM pairs"""

  /** KMV sketch size (number of minimum hash values kept). */
  val KmvK = 64

  /** Hash-space modulus for the portable LCG (2^31 − 1, prime — the LCG
    * x → (a·x + c) mod m is a BIJECTION on [0, m) for any a not divisible
    * by m, so distinct keys keep distinct hashes and the sketch's
    * "n_exact" column doubles as the true distinct count). */
  val KmvM = 2147483647L

  /** q181 — K-MINIMUM-VALUES distinct sketch (daily-active-user
    * cardinality per event type): keep the K smallest hash values of the
    * distinct (user, day-of-year) keys; the Kth smallest estimates the
    * cardinality as (K−1)·M / h_K — the classic mergeable KMV/bottom-k
    * sketch (union = merge-and-truncate, the distributed-friendly
    * property HLL shares but with exact integer arithmetic a
    * differential can pin). Groups smaller than K fall back to the exact
    * count (the sketch IS the set below K).
    *
    * Portability: the repo's LCG hash convention (q159's constants) over
    * the injectively-packed key user·512 + dayofyear — identical integer
    * hashes on both engines, integer floor-division estimate.
    *
    * Scale shape: one distinct on (type, hash) — a map-side-combinable
    * exchange — then a window over the DISTINCT frame only. At 100 TB
    * the window's per-type sort is replaced by the mergeable form: a
    * typed Aggregator holding a K-sized max-heap per type (the
    * [[graft.functions.TopKAggregator]] shape, inverted), merged
    * associatively across partitions; output stays K rows per type. */
  def q181KmvSketch(s: SparkSession, dir: String): DataFrame = {
    val h = t(s, dir, "events")
      .select(col("event_type"),
        expr(s"((user_id * 512 + dayofyear(ts)) * 1103515245 + 12345)" +
          s" % $KmvM").as("hv"))
      .distinct()
    val r = h
      .withColumn("rn",
        row_number().over(
          Window.partitionBy("event_type").orderBy("hv")).cast("bigint"))
      .withColumn("nd",
        count(lit(1)).over(Window.partitionBy("event_type")))
    r.filter(col("rn") === least(lit(KmvK.toLong), col("nd")))
      .select(col("event_type"), col("nd").as("n_exact"),
        col("hv").cast("bigint").as("kth_hash"),
        when(col("nd") >= KmvK,
          expr(s"(CAST(${KmvK - 1} AS BIGINT) * ${KmvM - 1}) div hv"))
          .otherwise(col("nd")).as("est_distinct"))
  }

  private def q181OracleSql: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
          ((user_id * 512 + dayofyear(ts)) * 1103515245 + 12345)
            % $KmvM AS hv
        FROM events),
        r AS (SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) rn,
          count(*) OVER (PARTITION BY event_type) nd FROM h)
        SELECT event_type, CAST(nd AS BIGINT) AS n_exact,
          CAST(hv AS BIGINT) AS kth_hash,
          CAST(CASE WHEN nd >= $KmvK
            THEN (CAST(${KmvK - 1} AS BIGINT) * ${KmvM - 1}) // hv
            ELSE nd END AS BIGINT) AS est_distinct
        FROM r WHERE rn = least($KmvK, nd)"""

  /** q182 — CONTIGUOUS SEQUENCE-PATTERN mining: per user, how many times
    * the exact consecutive run view→click→purchase occurs in the
    * event-time-ordered session string (no other event in between —
    * stricter than q134's funnel, which allows gaps, and than q150's
    * single-step transitions). Each event type's distinct first letter
    * encodes the sequence as a string; occurrences are counted by exact
    * substring census (len − len(replace))/|pat| — pure integer string
    * arithmetic, no regex-engine semantics to diverge across engines.
    *
    * Ordering rides q92's collision-free integer key (epoch-second ×
    * 10⁷ + event_id), so same-second events order identically on both
    * engines.
    *
    * Scale shape: ONE user-keyed exchange; the per-user string is built
    * in-row (array_sort of the collected (key, char) structs — the sort
    * is per-user-sized, not a window over the corpus) and scanned
    * in-row. Per-user state is bounded by that user's event count; a
    * production trajectory miner shards long histories by epoch before
    * the collect (q89's chunking discipline). */
  def q182SeqPattern(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("user_id"),
        substring(col("event_type"), 1, 1).as("c"),
        (unix_timestamp(col("ts")) * Extensions.AttribKeyScale
          + col("event_id")).as("k"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("k"), col("c"))).as("lst"))
      .withColumn("sq",
        expr("array_join(transform(array_sort(lst), x -> x.c), '')"))
      .select(col("user_id"),
        expr("CAST((length(sq) - length(replace(sq, 'vcp', ''))) div 3" +
          " AS BIGINT)").as("n_matches"))
      .filter(col("n_matches") > 0)

  private def q182OracleSql: String =
    s"""WITH e AS (SELECT user_id, left(event_type, 1) c,
          (epoch_ns(ts) // 1000000000) * ${Extensions.AttribKeyScale}
            + event_id AS k
        FROM events),
        s AS (SELECT user_id, string_agg(c, '' ORDER BY k) AS sq
              FROM e GROUP BY user_id)
        SELECT user_id,
          CAST((len(sq) - len(replace(sq, 'vcp', ''))) // 3 AS BIGINT)
            AS n_matches
        FROM s WHERE len(sq) - len(replace(sq, 'vcp', '')) > 0"""

  /** Edge threshold for q183 in percent of the mean pair weight: a pair
    * of brands is an EDGE when its co-basket count is ≥ 1.04× the mean
    * over all observed pairs. Relative (scale-free) by construction —
    * the same graph density at every sf, no absolute count to re-tune. */
  val LinkEdgePct = 104L

  /** q183 — GRAPH LINK PREDICTION by common-neighbor scoring on the
    * brand co-purchase graph: brands are nodes, edges are pairs whose
    * co-basket support clears [[LinkEdgePct]] of the mean; for every
    * NON-edge pair, the number of shared neighbors — the classic
    * link-prediction baseline (common neighbors; Adamic-Adar divides
    * each wedge by log-degree) and the candidate generator a
    * recommender or knowledge-graph completion pipeline runs at scale.
    *
    * Scale shape: the co-basket census is q177's machinery (one
    * basket-keyed exchange, in-row pair generation bounded by basket
    * size — never a corpus self-join); everything after rides the
    * DOMAIN-sized pair frame (≤ |brands|²). Wedges are generated
    * IN-ROW from each node's sorted adjacency array (bounded by
    * degree², the same orientation discipline as q105's triangles);
    * the edge filter is a broadcast 1-row stat attach; the final
    * anti-join runs on the wedge frame. At crawl scale the adjacency
    * build adds a degree cap before pair generation. */
  def q183LinkPrediction(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand").as("b"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("ok").agg(sort_array(collect_set("b")).as("bs"))
    val pair = baskets
      .select(explode(expr("flatten(transform(bs, (x, i) -> " +
        "transform(slice(bs, i + 2, size(bs)), " +
        "y -> struct(x AS b1, y AS b2))))")).as("p"))
      .select(col("p.b1"), col("p.b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("n12"))
    val tot = pair.agg(count(lit(1)).as("np"), sum("n12").as("tw"))
    val edges = pair.crossJoin(broadcast(tot))
      .filter(col("n12") * col("np") * 100 >= col("tw") * LinkEdgePct)
      .select("b1", "b2")
    val und = edges.select(col("b1").as("src"), col("b2").as("nbr"))
      .unionByName(edges.select(col("b2").as("src"), col("b1").as("nbr")))
    val wedges = und.groupBy("src")
      .agg(sort_array(collect_set("nbr")).as("ns"))
      .select(explode(expr("flatten(transform(ns, (x, i) -> " +
        "transform(slice(ns, i + 2, size(ns)), " +
        "y -> struct(x AS a, y AS b))))")).as("w"))
      .select(col("w.a"), col("w.b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    wedges.join(edges,
        wedges("a") === edges("b1") && wedges("b") === edges("b2"),
        "left_anti")
      .select(col("a").as("b1"), col("b").as("b2"), col("common"))
  }

  private def q183OracleSql: String =
    s"""WITH bi AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        pair AS (SELECT x.b AS b1, y.b AS b2,
            CAST(count(*) AS BIGINT) AS n12
          FROM bi x JOIN bi y ON x.ok = y.ok AND x.b < y.b GROUP BY 1, 2),
        tot AS (SELECT CAST(count(*) AS BIGINT) np,
                       CAST(sum(n12) AS BIGINT) tw FROM pair),
        eu AS (SELECT b1, b2 FROM pair, tot
               WHERE n12 * np * 100 >= tw * $LinkEdgePct),
        und AS (SELECT b1 AS src, b2 AS nbr FROM eu
                UNION ALL SELECT b2, b1 FROM eu),
        wedge AS (SELECT u1.nbr a, u2.nbr b, count(*) cn
          FROM und u1 JOIN und u2
          ON u1.src = u2.src AND u1.nbr < u2.nbr GROUP BY 1, 2)
        SELECT w.a AS b1, w.b AS b2, CAST(w.cn AS BIGINT) AS common
        FROM wedge w ANTI JOIN eu ON w.a = eu.b1 AND w.b = eu.b2"""

  /** Source-index stride in q184's order key — must exceed the source
    * count (20 here) so (rank, source) packs injectively. */
  val CurriculumStride = 100L

  /** q184 — CURRICULUM ORDERING with source interleaving: every document
    * gets a position in a single global training order that (a) goes
    * easy→hard (rank within source by length — the curriculum axis) and
    * (b) round-robins across sources at every difficulty level (no
    * thousand-doc runs of one source — the mixing a streaming data
    * loader needs). The order is emitted as an ORDER KEY
    * (rank·stride + source_index), not a materialized global row
    * number: the key is order-isomorphic to the interleaved curriculum,
    * and computing it needs NO global sort — the difference between a
    * per-source window and pulling the corpus through one partition.
    * Writing shards in key ranges (q172's assignment) yields the
    * curriculum order on read.
    *
    * Scale shape: ONE source-keyed exchange for the rank window; the
    * source index is a domain-sized (20-row) broadcast dim. The only
    * unpartitioned window in the plan runs over DISTINCT sources —
    * domain-sized, the q132 discipline. */
  def q184CurriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rk = docs.select("doc_id", "source", "n_chars")
      .withColumn("rank_in_source",
        row_number().over(
          Window.partitionBy("source").orderBy("n_chars", "doc_id"))
          .cast("bigint"))
    val si = docs.select("source").distinct()
      .withColumn("sidx",
        (row_number().over(Window.orderBy("source")) - 1).cast("bigint"))
    rk.join(broadcast(si), "source")
      .select(col("doc_id"), col("source"), col("rank_in_source"),
        (col("rank_in_source") * CurriculumStride + col("sidx"))
          .as("order_key"))
  }

  private def q184OracleSql: String =
    s"""WITH r AS (SELECT doc_id, source,
          row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
            AS rk
        FROM documents),
        si AS (SELECT source, row_number() OVER (ORDER BY source) - 1
            AS sidx
          FROM (SELECT DISTINCT source FROM documents))
        SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rank_in_source,
          CAST(r.rk * $CurriculumStride + si.sidx AS BIGINT) AS order_key
        FROM r JOIN si ON r.source = si.source"""

  /** q185 grid-join radius (squared) and cell size. Cell = radius is the
    * standard fixed-grid choice: all true pairs land in the 3×3 cell
    * neighborhood. */
  val GridR2 = 625L
  val GridCell = 25L

  /** q185 — GRID-BUCKETED SPATIAL SELF-JOIN (fixed-grid ε-neighborhood):
    * all part pairs within L2 distance 25 in the (price-cents,
    * scaled-size) plane — the distance-join every spatial/embedding-2D
    * workload needs, in the shape that scales: bucket each point into a
    * radius-sized grid cell, fan each point out to its 3×3 neighbor
    * cells on ONE side only, equi-join on the cell key, then verify the
    * exact distance in-row. A pair is emitted exactly once: the probe
    * copy that lands on its partner's home cell meets it there, and the
    * id1 < id2 canonicalization kills the mirror.
    *
    * Scale shape: the candidate set is |cell density|-bounded, not
    * |corpus|² — the fan-out is a constant 9×, the join is a plain hash
    * equi-join on (gx, gy), and the exact filter is integer arithmetic
    * in-row. Skewed cells (hot price points) salt like any hot join key
    * (q65/q163); at 100 TB the cell key doubles as the layout
    * partitioning (q129's z-order), making the join co-located. */
  def q185GridJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pt = t(s, dir, "part").select(
      col("p_partkey").as("id"),
      floor(col("p_retailprice") * 100).as("x"),
      (col("p_size") * 20).cast("bigint").as("y"))
    val cells = pt
      .withColumn("cx", expr(s"x div $GridCell"))
      .withColumn("cy", expr(s"y div $GridCell"))
    val off = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
      (1, -1), (1, 0), (1, 1)).toDF("dx", "dy")
    val probe = cells.crossJoin(broadcast(off))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("dx")).as("gx"), (col("cy") + col("dy")).as("gy"))
    val home = cells.select(col("id").as("id2"), col("x").as("x2"),
      col("y").as("y2"), col("cx"), col("cy"))
    probe.join(home,
        probe("gx") === home("cx") && probe("gy") === home("cy") &&
          probe("id") < home("id2"))
      .withColumn("dist2",
        (col("x") - col("x2")) * (col("x") - col("x2")) +
          (col("y") - col("y2")) * (col("y") - col("y2")))
      .filter(col("dist2") <= GridR2)
      .select(col("id").as("id1"), col("id2"), col("dist2"))
  }

  private def q185OracleSql: String =
    s"""WITH pt AS (SELECT p_partkey id,
          CAST(floor(p_retailprice*100) AS BIGINT) x,
          CAST(p_size*20 AS BIGINT) y FROM part),
        cells AS (SELECT *, x // $GridCell cx, y // $GridCell cy FROM pt),
        off AS (SELECT dx, dy FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
          (0,0),(0,1),(1,-1),(1,0),(1,1)) v(dx, dy)),
        probe AS (SELECT id, x, y, cx+dx AS gx, cy+dy AS gy
          FROM cells CROSS JOIN off),
        cand AS (SELECT p.id id1, c.id id2,
            (p.x-c.x)*(p.x-c.x)+(p.y-c.y)*(p.y-c.y) AS d2
          FROM probe p JOIN cells c
          ON p.gx = c.cx AND p.gy = c.cy AND p.id < c.id)
        SELECT id1, id2, CAST(d2 AS BIGINT) AS dist2 FROM cand
        WHERE d2 <= $GridR2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q180_corr_matrix" -> (q180CorrMatrix _),
    "q181_kmv_sketch" -> (q181KmvSketch _),
    "q182_seq_pattern" -> (q182SeqPattern _),
    "q183_link_prediction" -> (q183LinkPrediction _),
    "q184_curriculum_order" -> (q184CurriculumOrder _),
    "q185_grid_join" -> (q185GridJoin _))

  val oracleSql: Map[String, String] = Map(
    "q180_corr_matrix" -> q180OracleSql,
    "q181_kmv_sketch" -> q181OracleSql,
    "q182_seq_pattern" -> q182OracleSql,
    "q183_link_prediction" -> q183OracleSql,
    "q184_curriculum_order" -> q184OracleSql,
    "q185_grid_join" -> q185OracleSql)
}
