package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.PortableHash._
import graft.sources.Tables

/** Training-data pipeline operators beyond the dedup/similarity families
  * (north star: what a 100 TB corpus-preparation job needs around the
  * edges of dedup — splits, retrieval ranking, skew handling, sketch
  * accuracy).
  *
  * Scale design notes per operator:
  *  - hash split: embarrassingly parallel, zero shuffles — the split of a
  *    document is a pure function of its content hash, so membership is
  *    stable under re-partitioning, re-runs, and corpus growth (the
  *    property reservoir/random sampling lacks).
  *  - BM25: one corpus scan for per-doc term frequencies + one tiny
  *    aggregate for corpus stats (broadcast back), then a top-k. No
  *    per-term shuffle: the query's terms are fixed columns, not rows.
  *  - salted join: the declared query proves result-equivalence of
  *    [[Skew.saltedEquiJoin]] with the plain join the oracle runs.
  *  - approx quantile: GK-sketch median per group with a hash-checkable
  *    accuracy bound (same pattern as q47's HLL bound) — sketches
  *    themselves are not cross-engine comparable, their error bounds are.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------ q62

  /** q62 — deterministic train/val/test split by content hash: bucket =
    * poly_hash(text) mod 100, 80/10/10. Content-hash (not id-hash) keeps
    * exact duplicates in the same split — id-based or random splits leak
    * dup pairs across train/test. */
  def q62HashSplit(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    t(s, dir, "documents")
      .select(col("doc_id"),
        expr("poly_hash(text) % 100").as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  private def q62OracleSql: String =
    s"""WITH h AS (SELECT doc_id,
          ${duckCharFold("text")} % 100 AS bucket FROM documents)
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM h"""

  // ------------------------------------------------------------ q64

  /** Fixed retrieval query: one rare term (df=25 in the testdata vocab)
    * plus two common ones, so the ranking exercises the idf weighting. */
  val Bm25Terms: Seq[String] = Seq("dup", "vector", "scan")
  val Bm25TopK = 20

  /** Shared BM25 formula text (rational idf): identical expression
    * string on both engines so every double op associates the same way.
    * All inputs are exact-integer-valued doubles; +,*,/ are
    * IEEE-deterministic, so scores are bit-equal cross-engine. The
    * rational idf (N-df+0.5)/(df+0.5) (BM25's idf without the log) keeps
    * libm out of the differential; the ranking is the same monotone
    * order. */
  private def bm25ScoreExpr(
      nTerms: Int, k1: Double, b: Double): String =
    (0 until nTerms).map { i =>
      s"((((n_docs - df$i) + 0.5) / (df$i + 0.5)) * " +
        s"((tf$i * ${k1 + 1.0}) / (tf$i + ($k1 * ((1.0 - $b) + " +
        s"($b * (dl / avgdl)))))))"
    }.mkString("(", " + ", ")")

  /** Library API: BM25 top-k retrieval over any (doc_id, text) frame for
    * an arbitrary term set. One corpus scan for per-doc term-frequency
    * COLUMNS (terms are columns, not rows — no per-term shuffle), a
    * one-row broadcast of corpus stats, then TakeOrderedAndProject. */
  def bm25TopK(docs0: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = docs0
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val tf = docs.select(
      col("doc_id") +:
        size(col("ws")).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (term, i) =>
          size(expr(s"filter(ws, bm_w -> bm_w = '$term')"))
            .cast("double").as(s"tf$i")
        }: _*)
    val statCols =
      (sum(size(col("ws"))).cast("double") /
        count(lit(1)).cast("double")).as("avgdl") +:
        terms.zipWithIndex.map { case (term, i) =>
          sum(when(array_contains(col("ws"), term), 1L).otherwise(0L))
            .cast("double").as(s"df$i")
        }
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"), statCols: _*)
    tf.crossJoin(broadcast(stats))
      .withColumn("score", expr(bm25ScoreExpr(terms.size, k1, b)))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("score").desc, col("doc_id")))
          .cast("bigint").as("rank"))
  }

  /** q64 — BM25-style top-k retrieval over `documents` for a fixed term
    * set. Output is (doc_id, rank) only — float scores stay out of the
    * hash compare; the ORDER they induce is the tested artifact. */
  def q64Bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25TopK(t(s, dir, "documents"), Bm25Terms, Bm25TopK)

  private def q64OracleSql: String = {
    val tfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter(ws, bm_w -> bm_w = '$term')) AS DOUBLE) AS tf$i"
    }.mkString(", ")
    val dfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(sum(CASE WHEN list_contains(ws, '$term') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        tf AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, $tfCols
               FROM d),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                      CAST(sum(len(ws)) AS DOUBLE) /
                        CAST(count(*) AS DOUBLE) AS avgdl,
                      $dfCols
               FROM d),
        sc AS (SELECT doc_id, ${bm25ScoreExpr(Bm25Terms.size, 1.2, 0.75)}
                 AS score FROM tf CROSS JOIN st)
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rank
        FROM sc ORDER BY score DESC, doc_id LIMIT $Bm25TopK"""
  }

  // ------------------------------------------------------------ q65

  /** q65 — skew-salted fact⋈dim join, aggregated: the declared proof that
    * [[Skew.saltedEquiJoin]] (fact salted across 4 splits, dim replicated
    * 4×) produces the multiset the plain join the oracle runs produces.
    * At 100 TB this is the plan-level answer to a known-hot key that AQE
    * can't pre-split. */
  def q65SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
    val dim = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    Skew.saltedEquiJoin(fact, dim, "l_orderkey", "o_orderkey", numSalts = 4)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))
  }

  private def q65OracleSql: String =
    """SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority"""

  // ------------------------------------------------------------ q66

  /** q66 — sketch-based median with a hash-checkable accuracy bound:
    * approx_percentile (GK sketch, accuracy 1000 → rank error ≤ n/1000)
    * must land inside the exact [p45, p55] band — a ±5% RANK margin, vs
    * the sketch's 0.1% guarantee. The exact percentiles and the bound
    * check both run Spark-side; the oracle asserts the group counts and
    * TRUE, so a regressed sketch breaks the hash. (Same pattern as q47's
    * HLL bound — sketch values aren't cross-engine comparable, their
    * error bounds are.) */
  def q66ApproxQuantile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.45)").as("p45"),
        expr("percentile(o_totalprice, 0.55)").as("p55"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap"))
      .select(col("o_orderpriority"), col("n"),
        (col("ap") >= col("p45") && col("ap") <= col("p55"))
          .as("within_band"))

  private def q66OracleSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       TRUE AS within_band
       FROM orders GROUP BY o_orderpriority"""

  // ------------------------------------------------------------ q75

  /** q75 — INCREMENTAL dedup: dedup a new batch against itself and an
    * already-deduped corpus without reprocessing the corpus. Batch =
    * docs with doc_id >= 250, corpus = the rest. Three cheap stages:
    * in-batch exact dedup (groupBy fingerprint), anti-join against the
    * corpus's fingerprints (a semi-join-sized shuffle — at 100 TB the
    * corpus side is a pre-built fingerprint table, not a rescan), and
    * the surviving rows. This is the daily-ingest shape: work scales
    * with the batch, not the corpus. */
  def q75IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    val all = t(s, dir, "documents")
      .select(col("doc_id"), expr("poly_hash(text)").as("fp"))
    val corpusFps = all.filter(col("doc_id") < 250L).select("fp")
    val batch = all.filter(col("doc_id") >= 250L)
    batch
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .join(corpusFps, Seq("fp"), "left_anti")
      .select("doc_id", "fp")
  }

  private def q75OracleSql: String = {
    val fp = duckCharFold("text")
    s"""WITH all_fp AS (SELECT doc_id, $fp AS fp FROM documents),
        corpus AS (SELECT fp FROM all_fp WHERE doc_id < 250),
        batch AS (SELECT fp, min(doc_id) AS doc_id FROM all_fp
                  WHERE doc_id >= 250 GROUP BY fp)
        SELECT doc_id, fp FROM batch
        WHERE fp NOT IN (SELECT fp FROM corpus)"""
  }

  // ------------------------------------------------------------ q84

  /** 5-gram fingerprints for decontamination: wide enough that chance
    * collisions are rare (the 31-word testdata vocab makes 3-grams
    * collide constantly), narrow enough to catch verbatim benchmark
    * quotes inside longer documents. */
  val DecontamN = 5

  /** Benchmark DECONTAMINATION — the standard LLM-pipeline guard against
    * train-on-test leakage: drop every corpus document sharing an n-gram
    * fingerprint with a held-out benchmark. Scale shape: benchmark
    * fingerprints are a distinct-projected (usually broadcastable) set;
    * contamination detection is ONE semi-join from the corpus's exploded
    * fingerprints (no pairwise document comparison), and the survivors
    * come from ONE anti-join on doc_id. Work is O(corpus n-grams +
    * benchmark n-grams), never O(corpus × benchmark). */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame, n: Int = DecontamN)
      : DataFrame = {
    def fps(df: DataFrame) = df
      .withColumn("dc_ws", split(col("text"), " "))
      .filter(size(col("dc_ws")) >= n)
      .select(col("doc_id"),
        explode(expr(s"array_distinct(shingle_hashes(dc_ws, $n))"))
          .as("fp"))
    val benchFps = fps(benchmark).select("fp").distinct()
    val contaminated = fps(corpus)
      .join(benchFps, Seq("fp"), "left_semi")
      .select("doc_id").distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** q84 — decontamination over the testdata: documents with
    * doc_id % 10 = 0 act as the held-out benchmark, the rest as the
    * training corpus; survivors are corpus docs sharing no 5-gram with
    * the benchmark. Documents shorter than 5 tokens have no 5-grams and
    * always survive — both engines agree by construction. */
  def q84Decontaminate(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    val docs = t(s, dir, "documents").select("doc_id", "text")
    decontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0))
      .select("doc_id")
  }

  private def q84OracleSql: String = {
    val n = DecontamN
    val parts = (0 until n).map(k => s"sw_w[dc_i + $k]").mkString(", ")
    val grams = s"list_transform(range(1, len(sw_w) - ${n - 2}), " +
      s"dc_i -> ${duckCharFold(s"concat_ws(' ', $parts)")})"
    s"""WITH b AS (SELECT string_split(text, ' ') AS sw_w FROM documents
                   WHERE doc_id % 10 = 0
                     AND len(string_split(text, ' ')) >= $n),
        bfp AS (SELECT DISTINCT unnest($grams) AS fp FROM b),
        c AS (SELECT doc_id, string_split(text, ' ') AS sw_w
              FROM documents
              WHERE doc_id % 10 <> 0
                AND len(string_split(text, ' ')) >= $n),
        cfp AS (SELECT doc_id, unnest($grams) AS fp FROM c),
        cont AS (SELECT DISTINCT cfp.doc_id FROM cfp
                 JOIN bfp USING (fp))
        SELECT doc_id FROM documents
        WHERE doc_id % 10 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM cont)"""
  }

  // ------------------------------------------------------------ q85

  /** Per-stratum target size for q85 (chosen so every language is
    * genuinely downsampled at every test scale factor — `en` is ~40% of
    * the corpus, the others ~15% each). */
  val SampleCap = 64L

  /** q85 — deterministic stratified downsampling: cap each language at
    * ~SampleCap docs by keeping a doc iff `poly_hash(text) % 1000 <
    * rate_permille(lang)`, with the per-stratum rate computed from
    * stratum counts in integer arithmetic (floor division — no floats
    * anywhere, so both engines agree bit-for-bit). This is the standard
    * corpus-balancing pass (downweight over-represented
    * languages/sources) and the scale shape is ideal: one tiny
    * aggregate (O(strata) rows) broadcast back, then a scan-speed
    * filter. Content-hash gating keeps exact duplicates co-sampled
    * (same property as q62's split) and membership is stable under
    * re-runs and re-partitioning, unlike `df.sample`. */
  def q85StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    val docs = t(s, dir, "documents")
    val rates = docs.groupBy("lang")
      .agg(count(lit(1)).as("cnt"))
      .select(col("lang"),
        // `div`, not `/`: Spark's `/` on longs returns DOUBLE — the
        // rate must stay integer so both engines floor identically
        expr(s"least(1000L, ${1000L * SampleCap} div cnt)").as("rate_pm"))
    docs.join(broadcast(rates), "lang")
      .filter(expr("poly_hash(text) % 1000") < col("rate_pm"))
      .select("doc_id", "lang")
  }

  private def q85OracleSql: String =
    s"""WITH r AS (SELECT lang,
          LEAST(1000, (1000 * $SampleCap) // count(*)) AS rate_pm
        FROM documents GROUP BY lang)
        SELECT doc_id, d.lang FROM documents d JOIN r USING (lang)
        WHERE ${duckCharFold("text")} % 1000 < rate_pm"""

  // ------------------------------------------- end-to-end corpus prep

  /** The flagship composition: everything a corpus-preparation job runs,
    * chained as library calls over any (doc_id, text) frame —
    *
    *   quality gate → exact dedup → near-dup cluster resolution (keep
    *   each cluster's min doc_id) → deterministic content-hash split →
    *   split-partitioned write.
    *
    * Every stage is one of the declared operators (q35/q23/q30+q63/q62
    * shapes), so the whole pipeline inherits their scale properties: no
    * all-pairs work, one shuffle per stage, split membership stable
    * under re-runs. Returns the surviving (doc_id, text, cluster, split)
    * frame; writes it partitioned by split when `out` is given. */
  def prepareCorpus(
      spark: SparkSession, docs: DataFrame, out: Option[String] = None)
      : DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    // 1. quality gate: enough tokens, no degenerate repetition
    val gated = docs
      .withColumn("pc_ws", split(col("text"), " "))
      .filter(size(col("pc_ws")) >= Dedup.ShingleN)
      .drop("pc_ws")
    // 2. exact dedup (keep min doc_id per text) — cached ONCE: the LSH
    // pair generation, the CC node list, and the final keep-join all
    // read this frame, and without the cache each consumer re-runs the
    // scan + dedup shuffle (the r2 bench showed q79 paying that
    // upstream 3x)
    val exact = gated
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "text")
      .cache()
    // 3. near-dup clusters; keep each cluster's min doc_id. Propagation
    // CC is the right variant here (post-LSH dup clusters are
    // near-cliques — diameter 2-3) and it now fails fast instead of
    // mislabeling if that assumption ever breaks.
    val labels = Dedup.connectedComponents(
      exact.select("doc_id"), Dedup.minhashCandidatePairs(exact))
    val kept = exact.join(labels, "doc_id")
      .filter(col("doc_id") === col("cluster"))
    // 4. deterministic content-hash split
    val split80 = kept
      .withColumn("pc_bucket", expr("poly_hash(text) % 100"))
      .withColumn("split",
        when(col("pc_bucket") < 80, lit("train"))
          .when(col("pc_bucket") < 90, lit("val"))
          .otherwise(lit("test")))
      .drop("pc_bucket")
    out.foreach(dir => split80.write
      .partitionBy("split").mode("overwrite").parquet(dir))
    split80
  }

  /** q79 — the WHOLE prepareCorpus pipeline as a declared, hash-checked
    * query: quality gate → exact dedup → LSH candidate pairs →
    * connected-component cluster resolution → keep cluster minima →
    * content-hash split, reproduced end-to-end in DuckDB (the CC stage
    * as a recursive CTE). The strongest correctness statement the
    * differential can make: not one operator, the composed pipeline. */
  def q79PrepareCorpus(s: SparkSession, dir: String): DataFrame =
    prepareCorpus(s,
      t(s, dir, "documents").select("doc_id", "text"))
      .select("doc_id", "split")

  private def q79OracleSql: String = {
    import graft.operators.Dedup.{lshCtes, q30SelectPairs, ShingleN}
    s"""WITH RECURSIVE
        gated AS (SELECT doc_id, text FROM documents
                  WHERE len(string_split(text, ' ')) >= $ShingleN),
        exact AS (SELECT min(doc_id) AS doc_id, text FROM gated
                  GROUP BY text),
        ${lshCtes("SELECT doc_id, text FROM exact")},
        pairs AS ($q30SelectPairs),
        edges AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
                  UNION ALL
                  SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs),
        reach(doc_id, lab) AS (
          SELECT doc_id, doc_id FROM exact
          UNION
          SELECT e.src, r.lab FROM edges e JOIN reach r
            ON r.doc_id = e.dst),
        labels AS (SELECT doc_id, min(lab) AS cluster FROM reach
                   GROUP BY doc_id),
        kept AS (SELECT e.doc_id, e.text FROM exact e
                 JOIN labels l ON e.doc_id = l.doc_id
                 WHERE e.doc_id = l.cluster),
        bucketed AS (SELECT doc_id,
          ${duckCharFold("text")} % 100 AS b FROM kept)
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM bucketed"""
  }

  // ------------------------------------------------------------ q95

  /** Packing budget: docs are ~30-100 tokens, so 512 packs several per
    * sequence and still forces occasional near-full bins. */
  val PackBudget = 512L

  /** q95 — SEQUENCE PACKING: assign documents to fixed-budget training
    * sequences by cumulative token offset (contiguous packing — each
    * sequence is a [k·B, (k+1)·B) slice of the source's token stream).
    * This is the pass between tokenization and batch assembly: it needs
    * a per-source ordered cumulative sum (ONE window shuffle on the
    * partition key) and nothing else — no driver loop, no global sort.
    * At 100 TB, sources partition the corpus, so each window is an
    * independent task chain; bin identity is a pure function of the
    * prefix sum, stable under re-runs. All-integer geometry (`div`). */
  def q95PackSequences(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .select(col("source"),
        expr(s"(cum - tok) div $PackBudget").as("seq_id"),
        col("doc_id"), col("tok"))
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("seq_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  private def q95OracleSql: String =
    s"""WITH c AS (SELECT source, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
          CAST(sum(len(string_split(text, ' '))) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
        FROM documents)
        SELECT source, (cum - tok) // $PackBudget AS seq_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS seq_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY source, (cum - tok) // $PackBudget"""

  // ------------------------------------------------------------ q97

  /** q97 — DATA-MIXTURE REWEIGHTING: per-source sampling weights that
    * equalize token contribution across sources (the domain-balancing
    * pass before training-batch assembly). Two tiny aggregates — the
    * per-source token census (one shuffle over a low-cardinality key)
    * and a one-row corpus total broadcast back — then pure integer
    * arithmetic: weight_ppm = (total/n_sources · 10⁶) div source_tokens.
    * Parts-per-million integers keep the differential exact and are what
    * a sampler actually consumes (fixed-point rates, as in q85). */
  def q97MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val perSource = t(s, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("bigint").as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("src_tokens"))
    // corpus totals via a global window over the ALREADY-AGGREGATED
    // frame (n_sources rows), not a second corpus scan: the single-
    // partition exchange moves O(sources), the 100 TB side is read once
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSource
      .withColumn("total_tokens", sum(col("src_tokens")).over(all))
      .withColumn("n_sources", count(lit(1)).over(all))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        expr("((total_tokens div n_sources) * 1000000) div src_tokens")
          .as("weight_ppm"))
  }

  private def q97OracleSql: String =
    """WITH per_src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
          CAST(count(*) AS BIGINT) AS n_sources FROM per_src)
        SELECT source, n_docs, src_tokens,
               ((total_tokens // n_sources) * 1000000) // src_tokens
                 AS weight_ppm
        FROM per_src, tot"""

  /** q103 — CDC MERGE/upsert compaction (lakehouse MERGE INTO,
    * latest-version-wins): a base snapshot (orders, version 1) folded
    * with a change batch (version-2 updates to every 10th key + inserts
    * of brand-new keys), keeping exactly one row per key — the highest
    * version. The batch twin of the streaming `mapGroupsWithState`
    * upsert, and the compaction discipline q94's mergeable aggregates
    * assume upstream. Delta is synthesized deterministically FROM the
    * base (bumped cents, shifted keys) so the differential pins the
    * merge semantics, not a fixture. Scale shape: one shuffle on the
    * merge key; with the base bucketed on that key
    * (Sink.writeBucketedTable) only the — much smaller — delta moves,
    * which is why compaction stays affordable when the snapshot is the
    * 100 TB side. max_by carries the winning row without a rank window
    * (no second shuffle, no full sort of each key group). */
  def q103MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey"), lit(1L).as("version"),
      (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").as("cents"))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit(2L).as("version"),
        (col("cents") + 500L).as("cents"))
    // inserts live in the strictly NEGATIVE keyspace: -(k+1) can never
    // collide with a non-negative base key at any SF (an additive offset
    // would collide once orderkeys outgrow it — ~SF 17 for +1e8 — making
    // max_by tie-dependent; bare -k still collides on k=0, which the
    // testdata contains)
    val inserts = base.filter(col("o_orderkey") % 97 === 0)
      .select((-(col("o_orderkey") + 1L)).as("o_orderkey"),
        lit(2L).as("version"), (col("cents") + 1L).as("cents"))
    base.unionByName(updates).unionByName(inserts)
      .groupBy("o_orderkey")
      .agg(max("version").as("version"),
        max_by(col("cents"), col("version")).as("cents"))
  }

  private def q103OracleSql: String =
    """WITH base AS (SELECT o_orderkey, CAST(1 AS BIGINT) AS version,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders),
        delta AS (
          SELECT o_orderkey, CAST(2 AS BIGINT) AS version,
                 cents + 500 AS cents
          FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT -(o_orderkey + 1), CAST(2 AS BIGINT), cents + 1
          FROM base WHERE o_orderkey % 97 = 0),
        u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
        SELECT o_orderkey, max(version) AS version,
               arg_max(cents, version) AS cents
        FROM u GROUP BY o_orderkey"""

  /** q130 — declarative DATA-QUALITY CONSTRAINT suite (the Deequ-style
    * audit a pipeline runs before admitting a batch): seven checks over
    * lineitem — row count, key completeness, composite-PK uniqueness,
    * two domain bounds, a date-ordering invariant, and referential
    * integrity against orders — emitted as one long-format
    * (check, violations, pass) table a gate can assert on. On this
    * corpus six checks are green and `pk_unique` correctly reports the
    * synthetic lineitem's real (orderkey, linenumber) duplication —
    * the audit is demonstrably falsifiable, not vacuous (PipelineSpec
    * pins the exact count against an independent recompute).
    *
    * Scale shape: checks 1–6 fold into ONE wide partial-aggregated
    * corpus pass (count-distinct of the PK included — Spark plans it
    * as the standard two-phase distinct-agg expand); the referential
    * check is one LEFT ANTI broadcast/shuffle join reduced to a count.
    * Both one-row frames cross-join (1×1) into the stack — nothing
    * corpus-sized moves after the aggregates. All-integer output. */
  def q130QualityConstraints(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val wide = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("nulls"),
      (count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber")))
        .as("pk_dupes"),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("qty_oob"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.10, 1L)
        .otherwise(0L)).as("disc_oob"),
      sum(when(col("l_extendedprice") <= 0.0, 1L)
        .otherwise(0L)).as("price_inv"))
    val orphans = li.select("l_orderkey")
      .join(t(s, dir, "orders").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    wide.crossJoin(orphans)
      .selectExpr(
        """stack(7,
             'rowcount_nonzero',
               CASE WHEN n > 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(1 AS BIGINT) END,
             'orderkey_complete', nulls,
             'pk_unique', pk_dupes,
             'quantity_in_1_50', qty_oob,
             'discount_in_0_10pct', disc_oob,
             'price_positive', price_inv,
             'orders_ref_integrity', orphans
           ) AS (`check`, violations)""")
      .withColumn("pass",
        when(col("violations") === 0L, 1L).otherwise(0L))
  }

  private def q130OracleSql: String =
    """WITH wide AS (SELECT count(*) AS n,
          CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS nulls,
          count(*) - count(DISTINCT (l_orderkey, l_linenumber))
            AS pk_dupes,
          CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS qty_oob,
          CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.10
                        THEN 1 ELSE 0 END) AS BIGINT) AS disc_oob,
          CAST(sum(CASE WHEN l_extendedprice <= 0.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS price_inv
        FROM lineitem),
        orph AS (SELECT count(*) AS orphans FROM lineitem l
                 LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                 WHERE o.o_orderkey IS NULL),
        long AS (
          SELECT 'rowcount_nonzero' AS "check",
            CASE WHEN n > 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(1 AS BIGINT) END AS violations FROM wide
          UNION ALL SELECT 'orderkey_complete', nulls FROM wide
          UNION ALL SELECT 'pk_unique', pk_dupes FROM wide
          UNION ALL SELECT 'quantity_in_1_50', qty_oob FROM wide
          UNION ALL SELECT 'discount_in_0_10pct', disc_oob FROM wide
          UNION ALL SELECT 'price_positive', price_inv FROM wide
          UNION ALL SELECT 'orders_ref_integrity', orphans FROM orph)
        SELECT "check", violations,
          CASE WHEN violations = 0 THEN CAST(1 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS pass
        FROM long"""

  /** Retention-probability denominator for q135 (ppm). */
  val SampleMod = 1000000L

  /** q135 — MIXTURE APPLICATION: materialize q97's per-source token-
    * rebalancing weights as an actual deterministic sample — keep a
    * document iff LCG(doc_id) mod 10⁶ < min(weight_ppm, 10⁶). This is
    * the missing half of the mixture story: q97 COMPUTES the target
    * weights, this query ENFORCES them (downsampling oversized sources;
    * sources with weight ≥ 1 keep everything — upsampling is a repeat
    * factor the sequence-packer q95 applies, not a sampling decision).
    * Declared output is the per-source audit (n_docs, n_kept,
    * target_ppm).
    *
    * The sampling hash is a pure-integer LCG on doc_id (identical
    * arithmetic both engines — no float, no engine hash), so the KEPT
    * SET itself is deterministic and portable, not just the counts:
    * re-running admission on any engine keeps exactly the same
    * documents — the property incremental corpus rebuilds rely on.
    * Scale shape: one broadcast of the O(sources) weight frame, one
    * narrow per-row keep decision, one partial-aggregated rollup. */
  def q135MixtureApply(s: SparkSession, dir: String): DataFrame = {
    val w = q97MixtureWeights(s, dir).select("source", "weight_ppm")
    t(s, dir, "documents").select("doc_id", "source")
      .join(broadcast(w), "source")
      .withColumn("h",
        expr("(doc_id * 1103515245 + 12345) % 2147483647"))
      .withColumn("keep",
        (col("h") % SampleMod) < least(col("weight_ppm"), lit(SampleMod)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        max(least(col("weight_ppm"), lit(SampleMod))).as("target_ppm"))
  }

  private def q135OracleSql: String =
    s"""WITH per_source AS (SELECT source, count(*) AS n_docs,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
        w AS (SELECT source,
          (((SELECT CAST(sum(src_tokens) AS BIGINT) FROM per_source) //
            (SELECT count(*) FROM per_source)) * 1000000) // src_tokens
            AS weight_ppm
        FROM per_source),
        d AS (SELECT doc_id, d0.source, weight_ppm,
          (doc_id * 1103515245 + 12345) % 2147483647 AS h
        FROM documents d0 JOIN w ON d0.source = w.source)
        SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN h % $SampleMod <
            least(weight_ppm, $SampleMod) THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept,
          max(least(weight_ppm, $SampleMod)) AS target_ppm
        FROM d GROUP BY source"""

  /** q138 — SNAPSHOT DIFF (Delta/Iceberg change-data-feed analog): the
    * orders table diffed against a deterministically mutated next
    * snapshot (price bump on key%10, delete on key%13, insert on
    * key%97 — q103's mutation vocabulary) via ONE full-outer join on
    * the key; declared output is the change summary (added / removed /
    * changed / unchanged counts) — what a corpus-versioning pipeline
    * publishes per refresh so consumers know whether to re-run.
    *
    * Scale shape: both snapshots shuffle once on the join key (in
    * production both sides are bucketed on it — the q123 layout — and
    * the diff is co-located, zero-exchange); the classification is
    * in-row null/value comparison, the rollup a 4-group aggregate.
    * All-integer cents comparison, no float equality. */
  def q138SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    val next = base
      .filter(col("k") % 13 =!= 0) // deletes
      .select(col("k"),
        when(col("k") % 10 === 0, col("cents") + 500L)
          .otherwise(col("cents")).as("cents"))
      .unionByName(base.filter(col("k") % 97 === 0)
        .select((-(col("k") + 1L)).as("k"),
          (col("cents") + 1L).as("cents"))) // inserts
    base.select(col("k"), col("cents").as("old_cents"))
      .join(next.select(col("k"), col("cents").as("new_cents")),
        Seq("k"), "full_outer")
      .select(
        when(col("old_cents").isNull, "added")
          .when(col("new_cents").isNull, "removed")
          .when(col("old_cents") =!= col("new_cents"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"))
  }

  private def q138OracleSql: String =
    """WITH base AS (SELECT o_orderkey AS k,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders),
        nxt AS (
          SELECT k, CASE WHEN k % 10 = 0 THEN cents + 500
                         ELSE cents END AS cents
          FROM base WHERE k % 13 <> 0
          UNION ALL
          SELECT -(k + 1), cents + 1 FROM base WHERE k % 97 = 0),
        d AS (SELECT CASE
            WHEN b.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            WHEN b.cents <> n.cents THEN 'changed'
            ELSE 'unchanged' END AS change_type
          FROM base b FULL OUTER JOIN nxt n ON b.k = n.k)
        SELECT change_type, count(*) AS n FROM d GROUP BY change_type"""

  /** q166 — INCREMENTAL AGGREGATE MAINTENANCE (materialized-view
    * delta-merge with retraction semantics): the per-priority order
    * count/revenue view updated to the q138 mutated snapshot WITHOUT
    * re-aggregating it — deletes retract (−1, −cents), price bumps
    * contribute their net (0, +500), inserts add (+1, cents+1); the
    * delta aggregate merges into the standing view by group. The
    * DuckDB oracle re-aggregates the mutated snapshot from scratch, so
    * the differential hash-checks the IVM algebra itself (merge of
    * partial aggregates + retractions ≡ rebuild).
    *
    * Scale shape: this is THE 100 TB maintenance story — refresh cost
    * scales with the CHANGED keys, not the corpus: the delta pass
    * filters to mutation keys in one scan (the mutation cases fold
    * into one in-row `filter(array(...))` — no three-pass union), the
    * standing view is group-cardinality-sized, and the merge joins
    * |groups| rows. A production deployment reads the view from its
    * sink instead of recomputing `baseAgg`; the delta side is
    * unchanged. */
  def q166IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    val baseAgg = base.groupBy("g")
      .agg(count(lit(1)).as("n0"), sum("cents").as("s0"))
    val delta = base
      .withColumn("d", expr(
        """filter(array(
             CASE WHEN k % 13 = 0
                  THEN named_struct('dn', CAST(-1 AS BIGINT), 'ds', -cents)
                  WHEN k % 10 = 0
                  THEN named_struct('dn', CAST(0 AS BIGINT),
                                    'ds', CAST(500 AS BIGINT))
                  END,
             CASE WHEN k % 97 = 0
                  THEN named_struct('dn', CAST(1 AS BIGINT),
                                    'ds', cents + 1) END),
           x -> x IS NOT NULL)"""))
      .select(col("g"), explode(col("d")).as("m"))
      .groupBy("g")
      .agg(sum("m.dn").as("dn"), sum("m.ds").as("ds"))
    baseAgg.join(delta, Seq("g"), "left")
      .select(col("g"),
        (col("n0") + coalesce(col("dn"), lit(0L))).as("n"),
        (col("s0") + coalesce(col("ds"), lit(0L))).as("sum_cents"))
  }

  private def q166OracleSql: String =
    """WITH base AS (SELECT o_orderkey AS k, o_orderpriority AS g,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders),
        nxt AS (
          SELECT k, g, CASE WHEN k % 10 = 0 THEN cents + 500
                            ELSE cents END AS cents
          FROM base WHERE k % 13 <> 0
          UNION ALL
          SELECT -(k + 1), g, cents + 1 FROM base WHERE k % 97 = 0)
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM nxt GROUP BY g"""

  /** Shard count for q172 — in production this is the trainer's data-
    * parallel world size. */
  val NumShards = 8

  /** Size-bucket cap for q172 (fixed 64-char-wide buckets, capped so the
    * geometry is scale-factor-independent). */
  val ShardBucketCap = 9

  /** q172 — BALANCED SHARD ASSIGNMENT (the step after q95's sequence
    * packing: distributed training wants the corpus cut into N shards
    * with near-equal work, not near-equal document counts — a shard of
    * long documents finishes last and stalls the all-reduce). Docs are
    * bucketed into fixed 64-char-wide size bands, and each band
    * round-robins its documents across the [[NumShards]] shards in
    * size-descending order (longest-processing-time-first within band)
    * — every shard receives an equal count ±1 of every size band, so
    * shard totals are balanced without any global sort. Output is the
    * per-shard manifest (count + total chars) the trainer's loader
    * validates against.
    *
    * Scale shape: this is the reason for the band-local formulation —
    * a single global `row_number() OVER (ORDER BY size)` funnels the
    * corpus through ONE partition (the classic window scale-killer);
    * per-band windows give |bands| independent sorted partitions
    * (band count is fixed at 10, each ~corpus/10 — at real scale widen
    * the bands knob the same way q30 widens LSH bands). Balance holds
    * because round-robin within every band is count-exact per shard. */
  def q172ShardAssign(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("bucket")
      .orderBy(col("n_chars").desc, col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        least(expr("n_chars div 64"), lit(ShardBucketCap.toLong))
          .as("bucket"))
      .withColumn("shard",
        ((row_number().over(w) - 1) % NumShards).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
  }

  private def q172OracleSql: String =
    s"""WITH sized AS (SELECT doc_id, n_chars,
          least(n_chars // 64, $ShardBucketCap) AS bucket
        FROM documents),
        rr AS (SELECT bucket, n_chars, doc_id,
          (row_number() OVER (PARTITION BY bucket
             ORDER BY n_chars DESC, doc_id) - 1) % $NumShards AS shard
        FROM sized)
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM rr GROUP BY shard"""

  /** Per-group sample size for q141. */
  val GroupSampleK = 25

  /** q141 — exact-K PER-GROUP deterministic sampling: from every
    * source keep exactly min(K, n) documents, chosen by ranking on the
    * portable integer LCG of doc_id — the "pilot corpus" / eval-slice
    * builder (q85 samples a FRACTION per stratum; this pins a COUNT).
    * The declared output pins the exact kept set per source through an
    * id checksum, not just its size — the sample is reproducible on
    * any engine, the property eval sets demand.
    *
    * Scale shape: one window rank per source partition (a single
    * corpus shuffle on source) with the rank cut applied immediately —
    * at production scale swap the full sort for a per-group
    * TakeOrdered/quickselect if groups are huge; the hash-rank
    * contract (and thus the kept set) is unchanged. */
  def q141GroupSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("h",
        expr("(doc_id * 1103515245 + 12345) % 2147483647"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= GroupSampleK)
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"),
        sum("doc_id").cast("bigint").as("id_checksum"))
  }

  private def q141OracleSql: String =
    s"""WITH h AS (SELECT doc_id, source,
          (doc_id * 1103515245 + 12345) % 2147483647 AS h
        FROM documents),
        r AS (SELECT doc_id, source,
          row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
            AS rn
        FROM h)
        SELECT source, count(*) AS n_sampled,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM r WHERE rn <= $GroupSampleK GROUP BY source"""

  /** Range-block size for q145's digest tree — the "file / partition"
    * unit whose digest is compared before any row is re-read. Sized so
    * even sf0.001's key domain spans several blocks (6) while sf0.1
    * spans hundreds — the touched fraction stays ~1/8 at every SF. */
  val MerkleBlock = 256L

  /** q145 — MERKLE-STYLE ANTI-ENTROPY DIFF (the scale-out form of
    * q138's full-outer snapshot diff): both snapshots are digested per
    * key-range block (sum of portable row hashes — commutative, so the
    * digest is partition-order-free), digests are compared first, and
    * the row-level full-outer diff runs ONLY inside blocks whose
    * digests disagree. Mutations here are block-localized (every 8th
    * block — the "late-arriving partition" shape real feeds have), so
    * the row diff re-reads ~1/8 of the blocks (7 mutated + a handful of
    * insert-only blocks of 59 at sf0.01; 73+ of 586 at sf0.1) —
    * reconciliation cost ∝ changed data, not corpus. Declared output:
    * per-change-type counts + key checksums, the dirty-block count and
    * the total-block count (the pruning ratio's numerator and
    * denominator).
    *
    * Scale shape: digests partial-aggregate map-side to one row per
    * block per partition — the digest shuffle is O(blocks), not
    * O(rows); the dirty-block list (checkpointed once, it has three
    * consumers) broadcasts into both snapshot scans as a pre-join
    * filter (with a range-partitioned layout this is partition
    * pruning); only the surviving ~1/8 of rows pays the full-outer
    * join. A digest collision would suppress a block on both engines
    * identically (P ≈ 2⁻³⁰ per block); production would widen to 128
    * bits, same plan. */
  def q145MerkleDiff(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    def touched = expr(s"(k div $MerkleBlock) % 8 = 3")
    val next = base
      .filter(not(touched && expr("k % 13 = 0")))
      .select(col("k"),
        when(touched && expr("k % 10 = 0"), col("cents") + 500L)
          .otherwise(col("cents")).as("cents"))
      .unionByName(base.filter(touched && expr("k % 97 = 0"))
        .select((col("k") + 10000000L).as("k"),
          (col("cents") + 1L).as("cents")))
    def blocked(df: DataFrame): DataFrame = df
      .withColumn("blk", expr(s"k div $MerkleBlock"))
      .withColumn("rh", expr(s"(k * 31 + cents) % $Mod"))
    def digest(df: DataFrame): DataFrame = blocked(df).groupBy("blk")
      .agg(expr(s"CAST(sum(rh) % $Mod AS BIGINT)").as("dig"))
    val dirty = digest(base).as("db")
      .join(digest(next).as("dn"), col("db.blk") === col("dn.blk"),
        "full_outer")
      .filter(not(col("db.dig") <=> col("dn.dig")))
      .select(coalesce(col("db.blk"), col("dn.blk")).as("blk"))
      .localCheckpoint(true) // three consumers below
    val d = blocked(base).join(broadcast(dirty), Seq("blk")).as("b")
      .join(blocked(next).join(broadcast(dirty), Seq("blk")).as("n"),
        col("b.k") === col("n.k"), "full_outer")
      .filter(col("b.k").isNull || col("n.k").isNull ||
        col("b.cents") =!= col("n.cents"))
      .select(
        when(col("b.k").isNull, "added")
          .when(col("n.k").isNull, "removed")
          .otherwise("changed").as("metric"),
        coalesce(col("b.k"), col("n.k")).as("k"))
    d.groupBy("metric")
      .agg(count(lit(1)).as("n"), sum("k").as("checksum"))
      .unionByName(dirty
        .agg(count(lit(1)).as("n"),
          coalesce(sum("blk"), lit(0L)).as("checksum"))
        .select(lit("dirty_blocks").as("metric"), col("n"),
          col("checksum")))
      .unionByName(digest(base)
        .agg(count(lit(1)).as("n"),
          coalesce(sum("blk"), lit(0L)).as("checksum"))
        .select(lit("total_blocks").as("metric"), col("n"),
          col("checksum")))
  }

  private def q145OracleSql: String =
    s"""WITH base AS (SELECT o_orderkey AS k,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM orders),
        nxt AS (
          SELECT k, CASE WHEN (k // $MerkleBlock) % 8 = 3 AND k % 10 = 0
                         THEN cents + 500 ELSE cents END AS cents
          FROM base
          WHERE NOT ((k // $MerkleBlock) % 8 = 3 AND k % 13 = 0)
          UNION ALL
          SELECT k + 10000000, cents + 1 FROM base
          WHERE (k // $MerkleBlock) % 8 = 3 AND k % 97 = 0),
        bb AS (SELECT k, cents, k // $MerkleBlock AS blk,
               (k * 31 + cents) % $Mod AS rh FROM base),
        nb AS (SELECT k, cents, k // $MerkleBlock AS blk,
               (k * 31 + cents) % $Mod AS rh FROM nxt),
        bd AS (SELECT blk, CAST(sum(rh) % $Mod AS BIGINT) AS dig
               FROM bb GROUP BY blk),
        nd AS (SELECT blk, CAST(sum(rh) % $Mod AS BIGINT) AS dig
               FROM nb GROUP BY blk),
        dirty AS (SELECT COALESCE(b.blk, n.blk) AS blk
          FROM bd b FULL OUTER JOIN nd n ON b.blk = n.blk
          WHERE b.dig IS DISTINCT FROM n.dig),
        d AS (SELECT CASE WHEN b.k IS NULL THEN 'added'
                WHEN n.k IS NULL THEN 'removed'
                ELSE 'changed' END AS metric, COALESCE(b.k, n.k) AS k
          FROM (SELECT * FROM bb
                WHERE blk IN (SELECT blk FROM dirty)) b
          FULL OUTER JOIN (SELECT * FROM nb
                WHERE blk IN (SELECT blk FROM dirty)) n
            ON b.k = n.k
          WHERE b.k IS NULL OR n.k IS NULL OR b.cents <> n.cents)
        SELECT metric, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS checksum FROM d GROUP BY metric
        UNION ALL
        SELECT 'dirty_blocks', CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(blk), 0) AS BIGINT) FROM dirty
        UNION ALL
        SELECT 'total_blocks', CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(blk), 0) AS BIGINT) FROM bd"""

  /** Per-source token budget for q151 — small enough to truncate every
    * source even at sf0.001. */
  val TokenBudget = 1000L

  /** q151 — TOKEN-BUDGET sampling per source (the token-denominated
    * member of the sampling family: q85 pins a FRACTION per stratum,
    * q141 a COUNT, this one a TOKEN budget — the unit training runs
    * are actually planned in): docs ordered per source by the portable
    * LCG (uniform, reproducible), kept while the running whitespace
    * token total stays within $TokenBudget. Cumulative sums are
    * monotone (every doc has ≥1 token), so the kept set is a prefix —
    * and it's pinned by an id checksum, not just counted.
    *
    * Scale shape: one corpus shuffle on source + one window cumsum,
    * cut immediately (q141's discipline); overshoot docs never leave
    * their executor. At production scale, where one source outgrows a
    * partition, the two-pass variant (per-source token histograms →
    * broadcast hash threshold — q90's histogram trick) keeps the same
    * kept-set contract without the big window sort. */
  def q151TokenBudget(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      .withColumn("h",
        expr("(doc_id * 1103515245 + 12345) % 2147483647"))
      .withColumn("cum_tok",
        sum("n_tok").over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tok") <= TokenBudget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum("n_tok").as("tokens_kept"),
        sum("doc_id").as("id_checksum"))
  }

  private def q151OracleSql: String =
    s"""WITH d AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          (doc_id * 1103515245 + 12345) % 2147483647 AS h
        FROM documents),
        c AS (SELECT doc_id, source, n_tok,
          sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum_tok
        FROM d)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
               CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM c WHERE cum_tok <= $TokenBudget GROUP BY source"""

  /** Sampling stride (in characters) for q159 — one pick per full
    * stride of cumulative weight. */
  val SysStep = 2000L

  /** q159 — WEIGHTED SYSTEMATIC SAMPLING (the probability-proportional-
    * to-size member of the sampling family: q85 a fraction, q141 a
    * count, q151 a budget PREFIX — this one an UNBIASED stride walk):
    * docs shuffle per source into the portable-LCG order, and a pick
    * lands on every [[SysStep]]-th character of the cumulative-weight
    * axis — so each doc is picked ⌊cum/S⌋ − ⌊(cum−w)/S⌋ times,
    * proportional to its weight in expectation, with heavy docs
    * legitimately straddling multiple strides (picks > 1). Exact
    * integer floors both sides — the selection that survives an engine
    * swap, where u^(1/w) reservoir keys (A-Res) would drift in libm.
    *
    * Scale shape: one source-keyed exchange carries the LCG sort and
    * the cumsum window (q151's single-exchange discipline); the cut is
    * applied in-window, and the same histogram-threshold fallback as
    * q151/q90 applies when one source outgrows a partition. */
  def q159SystematicSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("h",
        expr("(doc_id * 1103515245 + 12345) % 2147483647"))
      .withColumn("cum",
        sum("n_chars").over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .select(col("source"), col("doc_id"),
        expr(s"cum div $SysStep - (cum - n_chars) div $SysStep")
          .as("picks"))
      .filter(col("picks") > 0)
  }

  private def q159OracleSql: String =
    s"""WITH d AS (SELECT source, doc_id, n_chars,
          (doc_id * 1103515245 + 12345) % 2147483647 AS h
        FROM documents),
        c AS (SELECT source, doc_id, n_chars,
          sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM d)
        SELECT source, doc_id,
               CAST(cum // $SysStep - (cum - n_chars) // $SysStep
                    AS BIGINT) AS picks
        FROM c WHERE cum // $SysStep - (cum - n_chars) // $SysStep > 0"""

  /** q165 — RANK TRANSFORM normalization (quantile/rank-based feature
    * scaling): each doc's length mapped to its per-source rank position
    * in exact ppm — `(rank − 1) · 10⁶ div (n − 1)` — the
    * distribution-free normalization (spearman features, quantile
    * matching across heterogeneous sources) that min-max and z-score
    * scaling can't give on heavy-tailed lengths. `rank()` (not
    * row_number) so equal lengths map to equal features — the transform
    * stays a FUNCTION of the value; all integer arithmetic, and
    * singleton sources pin to 0 rather than divide by zero.
    *
    * Scale shape: ONE source-keyed exchange carries the rank sort and
    * the count; the projection is in-row. At huge groups the q90
    * histogram trick replaces the sort: a value-keyed census plus a
    * cumsum over the (much smaller) distinct-value frame yields the
    * same rank for every row of a value. */
  def q165RankTransform(s: SparkSession, dir: String): DataFrame = {
    val wp = Window.partitionBy("source")
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("r", rank().over(wp.orderBy("n_chars")))
      .withColumn("n", count(lit(1)).over(wp))
      .select(col("doc_id"), col("source"),
        when(col("n") > 1,
          expr("(CAST(r AS BIGINT) - 1) * 1000000 div (n - 1)"))
          .otherwise(0L).as("r_ppm"))
  }

  private def q165OracleSql: String =
    """WITH d AS (SELECT source, doc_id, n_chars,
          rank() OVER (PARTITION BY source ORDER BY n_chars) AS r,
          count(*) OVER (PARTITION BY source) AS n
        FROM documents)
        SELECT doc_id, source,
          CASE WHEN n > 1 THEN (r - 1) * 1000000 // (n - 1)
               ELSE 0 END AS r_ppm
        FROM d"""

  /** Dense sequential ID assignment over a unique long key — the
    * scale-safe replacement for the two standard traps: `row_number()
    * OVER (ORDER BY k)` with no partition spec funnels the ENTIRE
    * dataset through one task (the WindowExec single-partition
    * warning), and `monotonically_increasing_id`/`zipWithIndex` are
    * neither dense nor stable across task retries. Here the total order
    * is realized as a range partition + in-partition sort, and
    * global ids come from the q169 two-pass discipline: pass 1 collects
    * O(partitions) per-partition row counts, pass 2 streams each sorted
    * partition once, numbering from the broadcast exclusive-prefix
    * offset. O(n log n) work, ONE range exchange, no global window.
    * IDs are 1-based to match SQL `row_number()`. */
  def denseIds(df: DataFrame, key: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val parts = s.sessionState.conf.numShufflePartitions
    val sorted = df.select(col(key).cast("long").as("k"))
      .repartitionByRange(parts, col("k"))
      .sortWithinPartitions("k")
      // FREEZE the partition id into the data before checkpointing:
      // a consumer may coalesce() the narrow tail (Verify's
      // single-file write does), merging several range partitions into
      // one task — TaskContext.getPartitionId() at consumption time
      // would then be the COALESCED task's id, zeroing every offset.
      // The embedded pid survives any narrow re-composition. (q169's
      // sweep can key off TaskContext because its census groupBy puts
      // a shuffle boundary between the emit pass and any consumer.)
      .withColumn("pid", spark_partition_id())
      .as[(Long, Int)]
      // two consumers (count pass + numbering pass): sort exactly once
      .localCheckpoint(true)
    val counts = sorted.toDF().groupBy("pid")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val r = (pid, acc); acc += c; r
    }.toMap
    val bc = s.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      // coalesce concatenates parent partitions in order, so runs of
      // the embedded pid arrive contiguously — reinitialize per run
      var cur = -1
      var i = 0L
      it.map { case (k, pid) =>
        if (pid != cur) { cur = pid; i = bc.value.getOrElse(pid, 0L) }
        i += 1
        (k, i)
      }
    }.toDF(key, "dense_id")
  }

  /** q221 — DENSE ID ASSIGNMENT as a declared query: every document
    * gets the 1-based rank of its doc_id, computed by [[denseIds]]
    * (range partition + two-pass offset exchange — never a global
    * window, never zipWithIndex). The oracle states the SEMANTIC with
    * the plain `row_number()` the implementation must never use;
    * ScalePathSpec pins the no-Window, no-post-checkpoint-exchange
    * plan. The assignment every training-shard writer, packed-sequence
    * builder (q95), and stable-join-key pipeline needs at 100 TB. */
  def q221DenseIds(s: SparkSession, dir: String): DataFrame =
    denseIds(t(s, dir, "documents"), "doc_id")

  private def q221OracleSql: String =
    """SELECT doc_id,
         CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS dense_id
       FROM documents"""

  // ------------------------------------------------------------ q223

  /** RRF constant k=60 (Cormack & Clarke 2009's recommended value): the
    * rank dampener that keeps one list's #1 from dominating the fusion. */
  val RrfK = 60
  /** Depth of each input ranking fed to the fusion. */
  val RrfPoolK = 50
  /** Released fused-list depth. */
  val RrfTopK = 20

  /** q223 — RECIPROCAL-RANK FUSION of two retrieval rankings (the
    * standard hybrid-search combiner: lexical BM25 ⊕ a second signal —
    * here a document-length prior standing in for popularity/quality;
    * in production the second list is the ANN ranking). RRF score =
    * Σ_lists 1/(k + rank), declared in exact integer ppm
    * (10⁶ div (k+rank), absent list contributes 0) so no float fold
    * enters the differential; ranks carry the information, the fusion
    * is pure integer arithmetic. Output: fused top-20 with both input
    * ranks (NULL where a doc appeared in only one list) — exactly what
    * a reranker consumes.
    *
    * Scale shape: each input list is already a top-k
    * (TakeOrderedAndProject — k rows per partition cross the wire); the
    * fusion is a full-outer join of two k-row frames + one k-row sort.
    * Corpus cost = the two ranking scans; fusion cost is O(k) no matter
    * the corpus. */
  def q223RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val a = bm25TopK(docs, Bm25Terms, RrfPoolK)
      .select(col("doc_id"), col("rank").as("rank_bm25"))
    val b = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
      .orderBy(col("dl").desc, col("doc_id"))
      .limit(RrfPoolK)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("dl").desc, col("doc_id")))
          .cast("bigint").as("rank_len"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr(s"1000000 div ($RrfK + rank_bm25)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + rank_len)"), lit(0L)))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(RrfTopK)
      .select(col("doc_id"), col("rank_bm25"), col("rank_len"),
        col("rrf_ppm"),
        row_number().over(
          Window.orderBy(col("rrf_ppm").desc, col("doc_id")))
          .cast("bigint").as("fused_rank"))
  }

  private def q223OracleSql: String = {
    val tfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter(ws, bm_w -> bm_w = '$term')) AS DOUBLE) AS tf$i"
    }.mkString(", ")
    val dfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(sum(CASE WHEN list_contains(ws, '$term') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        tf AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, $tfCols
               FROM d),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                      CAST(sum(len(ws)) AS DOUBLE) /
                        CAST(count(*) AS DOUBLE) AS avgdl,
                      $dfCols
               FROM d),
        sc AS (SELECT doc_id, ${bm25ScoreExpr(Bm25Terms.size, 1.2, 0.75)}
                 AS score FROM tf CROSS JOIN st),
        la AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score
                 DESC, doc_id) AS BIGINT) AS rank_bm25
               FROM sc ORDER BY score DESC, doc_id LIMIT $RrfPoolK),
        lb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY dl
                 DESC, doc_id) AS BIGINT) AS rank_len
               FROM tf ORDER BY dl DESC, doc_id LIMIT $RrfPoolK),
        f AS (SELECT doc_id, rank_bm25, rank_len,
                COALESCE(1000000 // ($RrfK + rank_bm25), 0)
                  + COALESCE(1000000 // ($RrfK + rank_len), 0) AS rrf_ppm
              FROM la FULL OUTER JOIN lb USING (doc_id))
        SELECT doc_id, rank_bm25, rank_len, CAST(rrf_ppm AS BIGINT)
                 AS rrf_ppm,
               CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id)
                 AS BIGINT) AS fused_rank
        FROM f ORDER BY rrf_ppm DESC, doc_id LIMIT $RrfTopK"""
  }

  // ------------------------------------------------------------ q225

  /** q225 — EFFECTIVE SOURCE COUNT per language (inverse-Simpson
    * diversity, the "effective number of parties" statistic): a data
    * mixture with 10 sources where one holds 99% of documents behaves
    * like a 1-source mixture — raw source counts hide that. Effective
    * sources = (Σnᵢ)² / Σnᵢ², exactly integer-expressible (unlike
    * Shannon entropy's log), declared ×10⁶ (ppm of a source): 1.0e6 =
    * monoculture, n·10⁶ = perfectly balanced n sources. The diversity
    * gate a mixture builder (q97/q135) checks before committing weights.
    *
    * Determinism: pure integer counts; squares widened to decimal(38,0)
    * (HUGEINT in the oracle, q190 convention) so a source holding ~3e9
    * docs can't overflow the square; one exact integer division at the
    * end.
    *
    * Scale shape: one (lang, source) census — map-side combinable — then
    * a lang rollup of the census-sized frame. One corpus scan, one
    * domain-sized shuffle; nothing downstream touches corpus rows. */
  def q225EffectiveSources(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
      .groupBy("lang")
      .agg(sum("n").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("ss"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        expr("""CAST(CAST(n_docs AS DECIMAL(38,0)) * n_docs * 1000000
                div ss AS BIGINT)""").as("eff_sources_ppm"))

  private def q225OracleSql: String =
    """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY lang, source)
       SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_sources,
         CAST(CAST(sum(n) AS HUGEINT) * sum(n) * 1000000
           // sum(CAST(n AS HUGEINT) * n) AS BIGINT) AS eff_sources_ppm
       FROM c GROUP BY lang"""

  // ------------------------------------------------------------ q228

  /** q228 — QUANTILE NORMALIZATION across sources (the batch-effect
    * correction microarray pipelines standardized and mixed-corpus
    * training inherits): each source's document-length distribution is
    * remapped onto the POOLED distribution, so "long for its source"
    * means the same thing everywhere — per doc, the in-source rank r
    * maps to pooled rank j = (r·N) div n_g (nearest-rank, exact
    * integers; r = n_g ⇒ j = N, and j ≥ 1 since n_g ≤ N), and the
    * normalized value is the pooled distribution's value at rank j.
    * The rank-preserving cousin of q165's rank transform: q165 releases
    * the rank itself, this releases a VALUE from the reference
    * distribution (downstream stays in value units).
    *
    * Scale shape — the pooled side is deliberately NOT a global sort:
    * pooled rank→value is resolved through the value census + cumsum
    * intervals (q210's prefix-sum discipline — the window rides a
    * domain-sized frame, |distinct lengths| rows), broadcast to an
    * interval-containment join. The per-source rank is one
    * source-keyed exchange. So: one corpus scan for the census, one
    * keyed window pass, one broadcast join — no rangepartitioning of
    * the corpus anywhere (the oracle states the semantic with the
    * global row_number the implementation must never run). */
  def q228QuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val intervals = docs.groupBy("n_chars")
      .agg(count(lit(1)).as("c"))
      // domain-sized frame: |distinct n_chars| rows, not corpus rows
      .withColumn("hi", sum("c").over(
        Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("n_chars").as("ref_chars"),
        (col("hi") - col("c") + 1).as("lo"), col("hi"))
    val tot = docs.agg(count(lit(1)).as("nn"))
    val ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val wsz = Window.partitionBy("source")
    docs
      .withColumn("r", row_number().over(ws).cast("bigint"))
      .withColumn("ng", count(lit(1)).over(wsz))
      .crossJoin(broadcast(tot))
      .withColumn("j", expr("(r * nn) div ng"))
      .join(broadcast(intervals),
        col("j") >= col("lo") && col("j") <= col("hi"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("ref_chars").as("qnorm_chars"))
  }

  private def q228OracleSql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        tt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d),
        r AS (SELECT doc_id, source, n_chars,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS BIGINT) AS r,
            CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ng
          FROM d),
        pooled AS (SELECT n_chars AS ref_chars,
            CAST(row_number() OVER (ORDER BY n_chars, doc_id)
              AS BIGINT) AS pr
          FROM d)
       SELECT rr.doc_id, rr.source, rr.n_chars,
              pooled.ref_chars AS qnorm_chars
       FROM (SELECT r.*, tt.nn FROM r, tt) rr
       JOIN pooled ON pooled.pr = (rr.r * rr.nn) // rr.ng"""

  // ------------------------------------------------------------ q237

  /** q237 sample size. */
  val WSampleK = 100

  /** q237 — DETERMINISTIC WEIGHTED SAMPLING without replacement (the
    * reproducible analog of the Efraimidis-Spirakis A-ES scheme, with
    * the random key replaced by the content hash — q62's discipline
    * applied to weighted selection): every document gets priority =
    * (poly_hash(text) mod 1000003) · 10⁶ div weight (weight = n_chars);
    * the K smallest priorities are the sample. Heavier documents draw
    * proportionally smaller priorities, so inclusion probability tracks
    * weight like A-ES, but the draw is a pure function of content —
    * re-runs, re-partitions, and corpus re-orders reproduce it exactly
    * (what makes a training-mixture sample auditable, and what lets the
    * differential pin a "random" sample at all).
    *
    * Scale shape: priority is in-row arithmetic; selection is a top-K
    * (TakeOrderedAndProject — K rows per partition cross the wire). One
    * scan, no shuffle beyond the K-row gather. */
  def q237WeightedSample(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").as("weight"),
        expr("""(poly_hash(text) % 1000003) * 1000000
                div greatest(n_chars, 1)""").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(WSampleK)
  }

  private def q237OracleSql: String =
    s"""WITH p AS (SELECT doc_id, n_chars AS weight,
          (${duckCharFold("text")} % 1000003) * 1000000
            // greatest(n_chars, 1) AS priority
        FROM documents)
        SELECT doc_id, weight, priority FROM p
        ORDER BY priority, doc_id LIMIT $WSampleK"""

  // ------------------------------------------------------------ q238

  /** q238 — REFERENTIAL-INTEGRITY MATRIX (the whole-schema FK audit a
    * data contract runs before anything joins: q130 checks ONE edge's
    * integrity among its constraints, this censuses EVERY declared FK
    * edge of the star schema in one result): per edge, child rows,
    * orphaned child rows (no matching parent), orphan rate in exact
    * ppm. An orphan rate that moves between snapshots is the earliest
    * detector of a broken upstream load — and the number that decides
    * whether inner joins silently drop rows.
    *
    * Scale shape: each edge is one LEFT ANTI join — dimension parents
    * (nation, region, customer, supplier, part) broadcast; the two
    * fact-fact edges (lineitem→orders) shuffle on the join key like
    * any fact join. Counts partially aggregate; the result is 7 rows.
    * The union of 7 independent audits parallelizes trivially — at
    * 100 TB each edge is its own job stage, sharing the fact scan via
    * cache when run together. */
  def q238FkIntegrity(s: SparkSession, dir: String): DataFrame = {
    def audit(edge: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val orphans = child.join(parent,
        child(key) === parent(pkey), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(edge).as("edge"), col("n_child"), col("n_orphans"),
          expr("n_orphans * 1000000 div n_child").as("orphan_ppm"))
    }
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    Seq(
      audit("lineitem_orders", li, "l_orderkey", ord, "o_orderkey"),
      audit("lineitem_part", li, "l_partkey",
        t(s, dir, "part"), "p_partkey"),
      audit("lineitem_supplier", li, "l_suppkey", sup, "s_suppkey"),
      audit("orders_customer", ord, "o_custkey", cust, "c_custkey"),
      audit("customer_nation", cust, "c_nationkey", nat, "n_nationkey"),
      audit("supplier_nation", sup, "s_nationkey", nat, "n_nationkey"),
      audit("nation_region", nat, "n_regionkey",
        t(s, dir, "region"), "r_regionkey"))
      .reduce(_ unionByName _)
  }

  private def q238OracleSql: String = {
    val edges = Seq(
      ("lineitem_orders", "lineitem", "l_orderkey", "orders",
        "o_orderkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_supplier", "lineitem", "l_suppkey", "supplier",
        "s_suppkey"),
      ("orders_customer", "orders", "o_custkey", "customer",
        "c_custkey"),
      ("customer_nation", "customer", "c_nationkey", "nation",
        "n_nationkey"),
      ("supplier_nation", "supplier", "s_nationkey", "nation",
        "n_nationkey"),
      ("nation_region", "nation", "n_regionkey", "region",
        "r_regionkey"))
    edges.map { case (edge, child, key, parent, pkey) =>
      s"""SELECT '$edge' AS edge,
          CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_child,
          CAST((SELECT count(*) FROM $child c
            WHERE NOT EXISTS (SELECT 1 FROM $parent p
              WHERE p.$pkey = c.$key)) AS BIGINT) AS n_orphans,
          CAST((SELECT count(*) FROM $child c
            WHERE NOT EXISTS (SELECT 1 FROM $parent p
              WHERE p.$pkey = c.$key)) * 1000000
            // (SELECT count(*) FROM $child) AS BIGINT) AS orphan_ppm"""
    }.mkString("\n UNION ALL\n ")
  }

  // ------------------------------------------------------------ q250

  /** q250 batch size (documents per training batch). */
  val PadB = 16

  /** q250 — PADDING-WASTE BATCHING EVAL (the number that justifies
    * length-bucketed batching in every LLM training pipeline: a batch
    * pads every document to the batch max, so arrival-order batches
    * burn compute on pad tokens in proportion to within-batch length
    * spread; bucketing by length first collapses the spread). Two
    * strategies over the same corpus, whitespace token counts (q36's
    * n_ws): ARRIVAL = consecutive doc_id runs of 16 (ids are dense, so
    * batch = doc_id div 16 — no window, no sort); LENGTH_BUCKETED =
    * docs banded by len div 64, batches formed inside each band in
    * (len, doc_id) order. Released per strategy: batch count, real
    * tokens, padded tokens (Σ batch_max·batch_n), and the waste share
    * in exact ppm — the eval's single headline number.
    *
    * Scale shape: arrival is pure key arithmetic (zero shuffles before
    * the batch census); bucketed needs one exchange on the band key
    * and a within-band sort — exactly the shuffle the production
    * batcher itself pays, so the eval's cost model matches the thing
    * it measures. Both collapse map-side to batch-sized censuses. */
  def q250PaddingWaste(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("len"))
    def waste(df: DataFrame, nm: String): DataFrame =
      df.groupBy("batch")
        .agg(count(lit(1)).as("bn"), sum("len").as("bt"),
          max("len").as("bm"))
        .agg(count(lit(1)).as("n_batches"), sum("bt").as("total_tok"),
          sum(expr("bm * bn")).as("padded_tok"))
        .select(lit(nm).as("strategy"), col("n_batches"),
          col("total_tok"), col("padded_tok"),
          expr("(padded_tok - total_tok) * 1000000 div padded_tok")
            .as("waste_ppm"))
    val arrival = toks.withColumn("batch", expr(s"doc_id div $PadB"))
    val banded = toks.withColumn("band", expr("len div 64"))
      .withColumn("idx", row_number().over(
        Window.partitionBy("band").orderBy("len", "doc_id"))
        .cast("bigint"))
      .withColumn("batch",
        expr(s"band * 1000000 + (idx - 1) div $PadB"))
    waste(arrival, "arrival")
      .unionByName(waste(banded, "length_bucketed"))
  }

  private def q250OracleSql: String =
    s"""WITH toks AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        FROM documents),
        arrival AS (SELECT doc_id // $PadB AS batch, len FROM toks),
        banded AS (SELECT (len // 64) * 1000000
            + (row_number() OVER (PARTITION BY len // 64
                ORDER BY len, doc_id) - 1) // $PadB AS batch, len
          FROM toks),
        aw AS (SELECT batch, count(*) AS bn, sum(len) AS bt,
            max(len) AS bm FROM arrival GROUP BY 1),
        bw AS (SELECT batch, count(*) AS bn, sum(len) AS bt,
            max(len) AS bm FROM banded GROUP BY 1),
        u AS (
          SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT)
              AS n_batches, CAST(sum(bt) AS BIGINT) AS total_tok,
            CAST(sum(bm * bn) AS BIGINT) AS padded_tok FROM aw
          UNION ALL
          SELECT 'length_bucketed', CAST(count(*) AS BIGINT),
            CAST(sum(bt) AS BIGINT), CAST(sum(bm * bn) AS BIGINT)
          FROM bw)
        SELECT strategy, n_batches, total_tok, padded_tok,
          (padded_tok - total_tok) * 1000000 // padded_tok AS waste_ppm
        FROM u"""

  // ------------------------------------------------------------ q251

  /** q251 ring geometry: shard counts before/after, vnodes per shard. */
  val RingN1 = 8
  val RingN2 = 9
  val RingV = 64

  /** Sorted (position, shard) ring for `n` shards — positions from the
    * repo's portable LCG applied TWICE to (shard·97 + vnode), computed
    * ONCE here and embedded as the same literal array in both engines'
    * plans (the BenfordPpm discipline: shared constants, not
    * per-engine hashing). The double application matters: keys are
    * single-LCG hashed in-engine, and two affine progressions with the
    * SAME stride stay rigidly correlated mod m (small consecutive uids
    * would collide exactly with consecutive vnode positions, pinning
    * ring movement to a degenerate 0); the second pass breaks the
    * shared stride, restoring the ~V·new/total expected intercept. */
  private[graft] def ringFor(n: Int): IndexedSeq[(Long, Int)] = {
    def lcg(x: Long): Long = (x * 1103515245L + 12345L) % 2147483647L
    (0 until n).flatMap { sh =>
      (0 until RingV).map(v => (lcg(lcg(sh.toLong * 97 + v)), sh))
    }.sorted
  }

  /** q251 — CONSISTENT-HASH REBALANCE AUDIT (what adding one shard
    * costs: under mod-N sharding, going 8 → 9 remaps ~8/9 of all keys
    * — every cache, local index, and co-located file moves; under a
    * hash RING with virtual nodes, only the keys a new shard's vnodes
    * intercept move, ~1/9). Both schemes evaluated over the distinct
    * event user base with the SAME portable-LCG key hash: mod moves
    * where h%8 ≠ h%9; ring assignment = first vnode clockwise of the
    * key's position (wrap to the ring head), rings embedded as sorted
    * literal arrays. One audit row: key count, moved counts, both in
    * exact ppm. The minimal-disruption theorem is test-pinned: every
    * ring-moved key lands on the NEW shard, never a reshuffle among
    * the old eight.
    *
    * Scale shape: one distinct-key aggregate, then per-key in-row
    * arithmetic against two broadcast-literal rings (512/576 entries
    * inside the plan), collapsing map-side to ONE row. No joins. */
  def q251ConsistentHash(s: SparkSession, dir: String): DataFrame = {
    def ringLit(r: IndexedSeq[(Long, Int)]): String =
      r.map { case (p, sh) => s"named_struct('pos', ${p}L, 'shard', $sh)" }
        .mkString("array(", ", ", ")")
    val r1 = ringLit(ringFor(RingN1))
    val r2 = ringLit(ringFor(RingN2))
    t(s, dir, "events").select(col("user_id")).distinct()
      .select(col("user_id"),
        expr("(user_id * 1103515245 + 12345) % 2147483647").as("kp"))
      .select(
        expr(s"kp % $RingN1 != kp % $RingN2").as("mod_moved"),
        expr(s"""coalesce(try_element_at(filter($r1, r -> r.pos >= kp),
                 1), element_at($r1, 1)).shard""").as("sh1"),
        expr(s"""coalesce(try_element_at(filter($r2, r -> r.pos >= kp),
                 1), element_at($r2, 1)).shard""").as("sh2"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("mod_moved"), 1L).otherwise(0L)).as("moved_mod"),
        sum(when(col("sh1") =!= col("sh2"), 1L).otherwise(0L))
          .as("moved_ring"))
      .select(col("n_keys"), col("moved_mod"), col("moved_ring"),
        expr("moved_mod * 1000000 div n_keys").as("moved_mod_ppm"),
        expr("moved_ring * 1000000 div n_keys").as("moved_ring_ppm"))
  }

  private def q251OracleSql: String = {
    def ringLit(r: IndexedSeq[(Long, Int)]): String =
      r.map { case (p, sh) => s"{'pos': $p, 'shard': $sh}" }
        .mkString("[", ", ", "]")
    val r1 = ringLit(ringFor(RingN1))
    val r2 = ringLit(ringFor(RingN2))
    s"""WITH k AS (SELECT DISTINCT user_id FROM events),
        h AS (SELECT user_id,
            (user_id * 1103515245 + 12345) % 2147483647 AS kp
          FROM k),
        a AS (SELECT kp % $RingN1 != kp % $RingN2 AS mod_moved,
            coalesce(list_filter($r1, r -> r.pos >= kp)[1],
              ($r1)[1]).shard AS sh1,
            coalesce(list_filter($r2, r -> r.pos >= kp)[1],
              ($r2)[1]).shard AS sh2
          FROM h)
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
          CAST(sum(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT)
            AS moved_mod,
          CAST(sum(CASE WHEN sh1 != sh2 THEN 1 ELSE 0 END) AS BIGINT)
            AS moved_ring,
          CAST(sum(CASE WHEN mod_moved THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS moved_mod_ppm,
          CAST(sum(CASE WHEN sh1 != sh2 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS moved_ring_ppm
        FROM a"""
  }

  // ------------------------------------------------------------ q260

  /** q260 total sample budget to apportion across sources. */
  val QuotaN = 1000L

  /** q260 — LARGEST-REMAINDER QUOTA ALLOCATION (Hamilton
    * apportionment: every sampler in the suite — q85 fraction, q141
    * count, q151 tokens — presumes a per-group target; this operator
    * IS the target computation, and naive floor(n·share) under-fills
    * the budget by up to |sources| rows while naive rounding
    * over-fills it): per source the floor quota n_docs·N div total,
    * the remainder n_docs·N mod total, and +1 for the
    * (N − Σ floors) largest remainders (ties broken by source name) —
    * the allocation sums to EXACTLY N, the invariant downstream
    * shard/batch geometry depends on. Released with floor and
    * remainder so the apportionment is auditable.
    *
    * Scale shape: one map-side source census; apportionment arithmetic
    * and the remainder-rank window ride the |sources|-row frame (the
    * q97 domain-sized-window argument). Corpus touched once. */
  def q260QuotaAllocate(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = census.agg(sum("n_docs").as("total"))
    val base = census.crossJoin(broadcast(tot))
      .withColumn("floor_q", expr(s"n_docs * $QuotaN div total"))
      .withColumn("rem", expr(s"n_docs * $QuotaN % total"))
    val left = base.agg((lit(QuotaN) - sum("floor_q")).as("leftover"))
    base.crossJoin(broadcast(left))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("bigint"))
      .select(col("source"), col("n_docs"), col("floor_q"), col("rem"),
        (col("floor_q") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("quota"))
  }

  private def q260OracleSql: String =
    s"""WITH census AS (SELECT source, CAST(count(*) AS BIGINT)
          AS n_docs FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total
          FROM census),
        base AS (SELECT c.source, c.n_docs,
            c.n_docs * $QuotaN // t.total AS floor_q,
            c.n_docs * $QuotaN % t.total AS rem
          FROM census c CROSS JOIN tot t),
        lo AS (SELECT $QuotaN - sum(floor_q) AS leftover FROM base),
        rk AS (SELECT b.*, lo.leftover,
            CAST(row_number() OVER (ORDER BY b.rem DESC, b.source)
              AS BIGINT) AS rk
          FROM base b CROSS JOIN lo)
        SELECT source, n_docs, floor_q, rem,
          floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS quota
        FROM rk"""

  /** q263 fold count. */
  val KFolds = 5L

  /** q263 — STRATIFIED K-FOLD ASSIGNMENT (cross-validation splits that
    * hold the source mix constant: q62's hash split is balanced only
    * in expectation, so a small stratum can land 40/60 and poison every
    * fold's eval; stratified assignment pins each (source, fold) cell
    * to within ONE document of n_s/k by construction): docs ranked
    * within their source by the portable LCG (shuffle), fold =
    * (rank − 1) mod k — deterministic, leakage-free, and exactly
    * balanced per stratum. Released per doc (doc_id, source, fold) so
    * the differential pins every assignment, not just the counts.
    *
    * Scale shape: ONE exchange on the stratum key + the within-source
    * rank window — exactly the shuffle any stratified partitioner
    * pays; the balance invariant is what that shuffle buys. At
    * huge-stratum scale the rank window swaps for q90's two-pass
    * histogram threshold without changing the assignment contract. */
  def q263StratifiedFolds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("(doc_id * 1103515245 + 12345) % 2147483647").as("u"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("u", "doc_id"))
        .cast("bigint"))
      .select(col("doc_id"), col("source"),
        expr(s"(rk - 1) % $KFolds").as("fold"))

  private def q263OracleSql: String =
    s"""WITH u AS (SELECT doc_id, source,
          (doc_id * 1103515245 + 12345) % 2147483647 AS u
        FROM documents),
        r AS (SELECT doc_id, source,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY u, doc_id) AS BIGINT) AS rk
          FROM u)
        SELECT doc_id, source, (rk - 1) % $KFolds AS fold FROM r"""

  /** q273 deletion-subject selector (every 97th customer key). */
  val ErasureMod = 97L

  /** q273 — CASCADING ERASURE AUDIT (the right-to-be-forgotten
    * operator: deleting a subject is easy — PROVING the deletion
    * reached every table that references them, including through a
    * join hop, is the part regulators actually ask for; q238 audits
    * FK orphans, this audits the REVERSE closure of a deletion set):
    * subjects = customers with custkey ≡ 0 (mod 97); per table the
    * total row count, rows referencing a subject (direct for orders,
    * THROUGH the order hop for lineitem — the cascade a naive
    * single-table delete misses), and the post-erasure count the
    * anti-join pass would leave. The differential pins all three per
    * table, so an erasure job can be diffed against this audit before
    * and after.
    *
    * Scale shape: subjects are a broadcast dim slice; orders filter
    * by broadcast semi-join; the lineitem cascade semi-joins against
    * the ~1% victim order keys (AQE broadcasts them); three map-side
    * count aggregates, one row each. */
  def q273ErasureAudit(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select("c_custkey")
    val victims = cust.filter(col("c_custkey") % ErasureMod === 0)
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey")
    val vOrders = orders.join(broadcast(victims),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val li = t(s, dir, "lineitem").select("l_orderkey")
    val vLi = li.join(vOrders.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    def audit(nm: String, total: DataFrame, refs: DataFrame)
        : DataFrame = {
      val tc = total.agg(count(lit(1)).as("n_total"))
      val rc = refs.agg(count(lit(1)).as("n_refs"))
      tc.crossJoin(rc).select(lit(nm).as("table_name"),
        col("n_total"), col("n_refs"),
        (col("n_total") - col("n_refs")).as("n_after"))
    }
    audit("customer", cust, victims)
      .unionByName(audit("orders", orders, vOrders))
      .unionByName(audit("lineitem", li, vLi))
  }

  private def q273OracleSql: String =
    s"""SELECT 'customer' AS table_name,
          CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total,
          CAST((SELECT count(*) FROM customer
                WHERE c_custkey % $ErasureMod = 0) AS BIGINT)
            AS n_refs,
          CAST((SELECT count(*) FROM customer) -
               (SELECT count(*) FROM customer
                WHERE c_custkey % $ErasureMod = 0) AS BIGINT)
            AS n_after
        UNION ALL
        SELECT 'orders',
          CAST((SELECT count(*) FROM orders) AS BIGINT),
          CAST((SELECT count(*) FROM orders
                WHERE o_custkey % $ErasureMod = 0) AS BIGINT),
          CAST((SELECT count(*) FROM orders) -
               (SELECT count(*) FROM orders
                WHERE o_custkey % $ErasureMod = 0) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
          CAST((SELECT count(*) FROM lineitem) AS BIGINT),
          CAST((SELECT count(*) FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_custkey % $ErasureMod = 0) AS BIGINT),
          CAST((SELECT count(*) FROM lineitem) -
               (SELECT count(*) FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_custkey % $ErasureMod = 0) AS BIGINT)"""

  /** q274 hashed-feature bucket count. */
  val CrossBuckets = 32L

  /** q274 — HASHING-TRICK COLLISION AUDIT (the feature-crossing
    * reality check: crossing nation × segment gives 125 true
    * categories, the hashing trick folds them into 32 buckets to cap
    * model width, and what the model actually sees is the COLLISION
    * structure — two crossed categories sharing a bucket share a
    * weight; this audit is the difference between "hashing is fine"
    * and "two of our biggest segments just merged"): cross key =
    * nationkey·256 + ascii(segment[0]) (first letters are distinct —
    * asserted by the spec), bucket = LCG(key) mod 32; per bucket the
    * row mass and the DISTINCT true categories folded into it.
    *
    * Scale shape: one broadcast-dim pass computes keys in-row; the
    * audit is a (bucket, key) census collapsed to a bucket census —
    * both map-side; ≤32 output rows. */
  def q274HashCrossAudit(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "customer")
      .select(expr("""CAST(c_nationkey AS BIGINT) * 256
           + ascii(substring(c_mktsegment, 1, 1))""").as("ck"))
      .select(col("ck"),
        expr(s"((ck * 1103515245 + 12345) % 2147483647) % $CrossBuckets")
          .as("bucket"))
    keyed.groupBy("bucket", "ck").agg(count(lit(1)).as("n"))
      .groupBy("bucket")
      .agg(sum("n").as("n_rows"), count(lit(1)).as("n_categories"))
      .withColumn("collided", col("n_categories") > 1L)
  }

  private def q274OracleSql: String =
    s"""WITH keyed AS (SELECT CAST(c_nationkey AS BIGINT) * 256
          + ascii(substr(c_mktsegment, 1, 1)) AS ck
        FROM customer),
        b AS (SELECT ck,
            ((ck * 1103515245 + 12345) % 2147483647) % $CrossBuckets
              AS bucket
          FROM keyed),
        kc AS (SELECT bucket, ck, CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2)
        SELECT bucket, CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_categories,
          count(*) > 1 AS collided
        FROM kc GROUP BY bucket"""

  /** q280 token budget as a percentage of the corpus. */
  val KnapBudgetPct = 50L

  /** q280 — QUALITY-KNAPSACK MIXTURE (the budgeted source selection
    * dual of q97's target-share mixture: q97 matches a prescribed
    * distribution, this OPTIMIZES one — given a 50%-of-corpus token
    * budget, take sources greedily by quality density until the
    * budget closes, splitting the marginal source fractionally; for
    * whole-source utilities the greedy-by-density order IS the
    * fractional-knapsack optimum): per source the token mass and an
    * alphabetic-share quality score in exact ppm; released with rank,
    * taken tokens, and the partial flag on the marginal source — the
    * audit a budget decision needs.
    *
    * Scale shape: corpus collapses map-side to a per-source stats
    * frame; the greedy order, prefix sums, and the budget cut all
    * ride the |sources|-row frame (q97's domain-window argument). */
  def q280QualityKnapsack(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("bigint"))
        .as("n_tokens"),
        sum(length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast("bigint")).as("alpha"),
        sum(length(col("text")).cast("bigint")).as("chars"))
      .select(col("source"), col("n_tokens"),
        expr("alpha * 1000000 div chars").as("quality_ppm"))
    val tot = per.agg(sum("n_tokens").as("total"))
    val ord = Window.orderBy(col("quality_ppm").desc, col("source"))
    per.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(ord).cast("bigint"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("budget", expr(s"total * $KnapBudgetPct div 100"))
      .select(col("source"), col("quality_ppm"), col("n_tokens"),
        col("rank"),
        expr("greatest(0L, least(n_tokens, budget - cum_before))")
          .as("taken_tokens"))
      .withColumn("partial", col("taken_tokens") > 0L &&
        col("taken_tokens") < col("n_tokens"))
  }

  private def q280OracleSql: String =
    s"""WITH per AS (SELECT source,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT)
            AS n_tokens,
          CAST(sum(strlen(regexp_replace(text, '[^a-z]', '', 'g')))
            AS BIGINT) AS alpha,
          CAST(sum(strlen(text)) AS BIGINT) AS chars
        FROM documents GROUP BY source),
        q AS (SELECT source, n_tokens,
            alpha * 1000000 // chars AS quality_ppm
          FROM per),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM q),
        o AS (SELECT q.source, q.quality_ppm, q.n_tokens,
            CAST(row_number() OVER (ORDER BY q.quality_ppm DESC,
              q.source) AS BIGINT) AS rank,
            CAST(coalesce(sum(q.n_tokens) OVER (ORDER BY
              q.quality_ppm DESC, q.source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before,
            tot.total * $KnapBudgetPct // 100 AS budget
          FROM q CROSS JOIN tot)
        SELECT source, quality_ppm, n_tokens, rank,
          greatest(0, least(n_tokens, budget - cum_before))
            AS taken_tokens,
          greatest(0, least(n_tokens, budget - cum_before)) > 0
            AND greatest(0, least(n_tokens, budget - cum_before))
              < n_tokens AS partial
        FROM o"""

  /** q289 — FOLD-BALANCE AUDIT (closing q263's loop: stratification
    * promises that CV folds are exchangeable — this measures it, per
    * fold, on the metrics a fold's eval would actually move: token
    * mass and lexical quality; a fold whose mean length sits 20% off
    * its siblings biases every per-fold score computed on it): q263's
    * assignment re-derived, then per fold the doc count, mean
    * whitespace-token length ×10⁶ (exact), and mean alphabetic share
    * in ppm — the differential pins all five folds' profiles, so a
    * regression in the fold assignment surfaces as profile drift.
    *
    * Scale shape: q263's one stratum exchange + rank window, then a
    * 5-group map-side aggregate. */
  def q289FoldBalanceAudit(s: SparkSession, dir: String): DataFrame = {
    val folds = q263StratifiedFolds(s, dir)
    val stats = t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("len"),
        length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast("bigint").as("alpha"),
        length(col("text")).cast("bigint").as("chars"))
    folds.join(stats, "doc_id")
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(len) * 1000000 div count(1)").as("mean_len_fp"),
        expr("sum(alpha) * 1000000 div sum(chars)").as("alpha_ppm"))
  }

  private def q289OracleSql: String =
    s"""WITH u AS (SELECT doc_id, source,
          (doc_id * 1103515245 + 12345) % 2147483647 AS u
        FROM documents),
        r AS (SELECT doc_id,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY u, doc_id) AS BIGINT) AS rk
          FROM u),
        f AS (SELECT doc_id, (rk - 1) % $KFolds AS fold FROM r),
        st AS (SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
            CAST(strlen(regexp_replace(text, '[^a-z]', '', 'g'))
              AS BIGINT) AS alpha,
            CAST(strlen(text) AS BIGINT) AS chars
          FROM documents)
        SELECT f.fold, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(st.len) * 1000000 // count(*) AS BIGINT)
            AS mean_len_fp,
          CAST(sum(st.alpha) * 1000000 // sum(st.chars) AS BIGINT)
            AS alpha_ppm
        FROM f JOIN st ON f.doc_id = st.doc_id
        GROUP BY f.fold"""

  /** q292 sample budget to allocate. */
  val NeymanN = 1000L

  /** q292 — NEYMAN OPTIMAL ALLOCATION (the variance-aware upgrade of
    * q260's proportional quotas: survey-sampling theory allocates a
    * fixed budget ∝ n_h·σ_h — a big uniform stratum needs FEWER
    * samples than a small volatile one, and proportional allocation
    * wastes budget on the former; the pair of operators is the
    * design-based sampling toolkit): per source stratum the exact
    * sufficient statistics over doc token lengths, weight
    * w_h = floor(n_h·σ_h) through ONE shared-text sqrt expression
    * (q242 discipline — sample σ from exact integers), then the q260
    * largest-remainder apportionment over the weights so the
    * allocation still sums to EXACTLY N. Released with both the
    * weight and the proportional quota for comparison.
    *
    * Scale shape: one map-side stratum-stats pass; weights,
    * remainders, and the rank window ride the |sources|-row frame. */
  def q292NeymanAllocation(s: SparkSession, dir: String): DataFrame = {
    val stats = t(s, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("bigint").as("len"))
      .groupBy("source")
      .agg(count(lit(1)).as("nh"), sum("len").as("sl"),
        sum(expr("len * len")).as("ql"))
    // greatest(·,1) guards the singleton stratum (nh = 1, where the
    // numerator is identically 0): without it Spark's 0/0 → NaN flows
    // to CAST(floor(NaN) AS BIGINT) = NULL while DuckDB raises on the
    // cast — the q181/q259 guard convention, shared-text with oracle
    val sd = "sqrt((nh * CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * sl)" +
      " / (CAST(nh AS DOUBLE) * greatest(nh - 1.0, 1.0)))"
    val w = stats
      .withColumn("weight", expr(s"CAST(floor(nh * $sd) AS BIGINT)"))
    val tot = w.agg(sum("weight").as("tw"), sum("nh").as("tn"))
    val base = w.crossJoin(broadcast(tot))
      .withColumn("floor_q", expr(s"weight * $NeymanN div tw"))
      .withColumn("rem", expr(s"weight * $NeymanN % tw"))
      .withColumn("prop_q", expr(s"nh * $NeymanN div tn"))
    val left = base.agg((lit(NeymanN) - sum("floor_q")).as("leftover"))
    base.crossJoin(broadcast(left))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("bigint"))
      .select(col("source"), col("nh").as("n_docs"), col("weight"),
        col("prop_q").as("proportional_q"),
        (col("floor_q") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("neyman_q"))
  }

  private def q292OracleSql: String = {
    val sd = "sqrt((nh * CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * sl)" +
      " / (CAST(nh AS DOUBLE) * greatest(nh - 1.0, 1.0)))"
    s"""WITH stats AS (SELECT source,
          CAST(count(*) AS BIGINT) AS nh,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sl,
          CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)
            * len(string_split(text, ' '))) AS BIGINT) AS ql
        FROM documents GROUP BY source),
        w AS (SELECT source, nh,
            CAST(floor(nh * $sd) AS BIGINT) AS weight
          FROM stats),
        tot AS (SELECT CAST(sum(weight) AS BIGINT) AS tw,
            CAST(sum(nh) AS BIGINT) AS tn FROM w),
        base AS (SELECT w.source, w.nh, w.weight,
            w.weight * $NeymanN // t.tw AS floor_q,
            w.weight * $NeymanN % t.tw AS rem,
            w.nh * $NeymanN // t.tn AS prop_q
          FROM w CROSS JOIN tot t),
        lo AS (SELECT $NeymanN - sum(floor_q) AS leftover FROM base),
        rk AS (SELECT b.*, lo.leftover,
            CAST(row_number() OVER (ORDER BY b.rem DESC, b.source)
              AS BIGINT) AS rk
          FROM base b CROSS JOIN lo)
        SELECT source, nh AS n_docs, weight,
          prop_q AS proportional_q,
          floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS neyman_q
        FROM rk"""
  }

  // ------------------------------------------------------------ q398

  /** Stratum sample size for q398. */
  val BottomK = 10

  /** Row shape feeding q398's typed bottom-k aggregator. */
  final case class LangPriority(lang: String, id: Long, score: Double)

  /** q398 — BOTTOM-K PER-STRATUM SAMPLE by content-hash priority (the
    * EXACT-size member of the sampling family: q85's Bernoulli gate
    * hits its cap only in expectation — bottom-k returns EXACTLY k docs
    * per language, and is the distributed form of reservoir sampling:
    * assign every row a hash priority and keep the k smallest, a
    * mergeable statistic — per-partition top-k states merge
    * associatively, which a sequential reservoir's index-dependent
    * acceptance never does). Priority = poly_hash(text): content-keyed,
    * so exact duplicates carry EQUAL priority and the sample is stable
    * under re-partitioning and re-runs (q62's co-split property);
    * deterministic ties break toward the lower doc_id. Hash values
    * < 2⁵³ are exact in the aggregator's double score.
    *
    * Scale shape: the typed TopKByScore Aggregator holds O(k) state per
    * stratum per partition and map-side combines — NO corpus-wide rank
    * window pulling each language through one reducer (with 5 strata
    * that window would be a 5-partition bottleneck at 100 TB; the
    * aggregator's partial states are the fix). One exchange of
    * \|strata\|·k partial rows. */
  def q398BottomkSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftFunctions.registerAll(s)
    val prio = t(s, dir, "documents")
      .select(col("lang"), col("doc_id").as("id"),
        // negated: TopKByScore keeps the HIGHEST scores (ties → lower
        // id), so -priority selects the k smallest priorities
        expr("CAST(-poly_hash(text) AS DOUBLE)").as("score"))
      .as[LangPriority]
    val bottomK = graft.functions.TopKByScore[LangPriority](
      BottomK, r => graft.functions.Scored(r.id, r.score))
    prio.groupByKey(_.lang)
      .agg(bottomK.toColumn.name("ids"))
      .flatMap { case (lang, ids) =>
        ids.zipWithIndex.map { case (id, i) => (lang, id, (i + 1).toLong) }
      }
      .toDF("lang", "doc_id", "rank")
  }

  private def q398OracleSql: String =
    s"""WITH pr AS (SELECT lang, doc_id,
          ${duckCharFold("text")} AS prio FROM documents),
        rk AS (SELECT lang, doc_id,
            CAST(row_number() OVER (PARTITION BY lang
              ORDER BY prio, doc_id) AS BIGINT) AS rank
          FROM pr)
        SELECT lang, doc_id, rank FROM rk WHERE rank <= $BottomK"""

  // ------------------------------------------------------------ q402

  /** q402 — HYBRID RETRIEVAL: RRF of the lexical and the DENSE leg
    * (the production shape q223's docstring promises — there the
    * second list is a length prior; here it is the embedding ranker,
    * which is what a RAG stack actually fuses: BM25 finds term
    * matches, the dense leg finds paraphrases, and RRF Σ 1/(k+rankᵣ)
    * merges on RANKS ALONE, no score calibration across the two
    * incomparable scales): leg 1 = q64's BM25 top-[[Bm25TopK]] over
    * the fixed term set; leg 2 = cosine-to-probe top-20 over the
    * embeddings (q25's ranking, vec_id ≡ doc_id in this corpus);
    * fused score is the EXACT integer Σ 1000000 div ([[RrfK]] + rank)
    * over the legs a doc appears in (absent leg contributes 0 — pure
    * integer division, no float anywhere in the fusion); released
    * {doc_id, bm25_rank, ann_rank, rrf_micro, fused_rank} with NULL
    * marking absence and the deterministic (rrf_micro DESC, doc_id)
    * final order.
    *
    * Scale shape: both legs are top-k's (bounded outputs); the fusion
    * is a ≤40-row full outer join + rank — driver-scale by
    * construction. At corpus scale the legs shard (BM25 by posting,
    * ANN by cell) and the fusion cost stays |results|, not |corpus|. */
  def q402HybridRetrieval(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    val bm25 = bm25TopK(t(s, dir, "documents"), Bm25Terms, Bm25TopK)
      .select(col("doc_id"), col("rank").as("bm25_rank"))
    val e = t(s, dir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
    val probe = e.filter(col("vec_id") === 0L)
      .select(col("ed").as("ped"))
    val ann = e.crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        expr("vec_dot(ed, ped) / (sqrt(vec_dot(ed, ed)) * " +
          "sqrt(vec_dot(ped, ped)))").as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(Bm25TopK)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id")))
        .cast("bigint").as("ann_rank"))
    bm25.join(ann, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro", expr(
        s"""coalesce(1000000 DIV ($RrfK + bm25_rank), CAST(0 AS BIGINT))
         + coalesce(1000000 DIV ($RrfK + ann_rank), CAST(0 AS BIGINT))"""))
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("doc_id")))
        .cast("bigint"))
      .select("doc_id", "bm25_rank", "ann_rank", "rrf_micro",
        "fused_rank")
  }

  private def q402OracleSql: String = {
    val tfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter(ws, bm_w -> bm_w = '$term')) AS DOUBLE)" +
        s" AS tf$i"
    }.mkString(", ")
    val dfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(sum(CASE WHEN list_contains(ws, '$term') THEN 1 ELSE 0 " +
        s"END) AS DOUBLE) AS df$i"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        tf AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, $tfCols
               FROM d),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                      CAST(sum(len(ws)) AS DOUBLE) /
                        CAST(count(*) AS DOUBLE) AS avgdl,
                      $dfCols
               FROM d),
        sc AS (SELECT doc_id, ${bm25ScoreExpr(Bm25Terms.size, 1.2, 0.75)}
                 AS score FROM tf CROSS JOIN st),
        bm AS (SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS bm25_rank
          FROM sc ORDER BY score DESC, doc_id LIMIT $Bm25TopK),
        ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed
               FROM embeddings),
        p AS (SELECT ed AS ped FROM ev WHERE vec_id = 0),
        sim AS (SELECT vec_id AS doc_id,
            list_dot_product(ed, ped) / (sqrt(list_dot_product(ed, ed))
              * sqrt(list_dot_product(ped, ped))) AS sim
          FROM ev CROSS JOIN p),
        an AS (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
              AS BIGINT) AS ann_rank
          FROM sim ORDER BY sim DESC, doc_id LIMIT $Bm25TopK),
        fused AS (SELECT coalesce(bm.doc_id, an.doc_id) AS doc_id,
            bm.bm25_rank, an.ann_rank,
            coalesce(1000000 // ($RrfK + bm.bm25_rank),
              CAST(0 AS BIGINT))
              + coalesce(1000000 // ($RrfK + an.ann_rank),
                CAST(0 AS BIGINT)) AS rrf_micro
          FROM bm FULL JOIN an ON bm.doc_id = an.doc_id)
        SELECT doc_id, bm25_rank, ann_rank, rrf_micro,
          CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
            AS BIGINT) AS fused_rank
        FROM fused"""
  }

  // ------------------------------------------------------------ q424

  /** q424 — CONJUNCTIVE-SELECTIVITY AUDIT over the q64 term set (the
    * cardinality-estimation error every cost-based planner makes: for
    * a conjunctive predicate the planner multiplies per-term
    * selectivities — the INDEPENDENCE assumption — and real corpora
    * violate it in both directions (co-topical terms co-occur MORE,
    * the audit's ratio > 1; complementary terms less); q294 collects
    * the single-column stats, this measures the error of COMBINING
    * them, the number a multi-column-statistics feature is judged
    * by): per unordered term pair the EXACT {df1, df2, inter, n_docs},
    * the independence estimate df1·df2·1000 div n, and the
    * observed/expected ratio inter·n·1000 div (df1·df2) — all exact
    * widened integer arithmetic, zero-product guarded.
    *
    * Scale shape: ONE corpus scan to per-doc membership flags
    * (map-side combined to a 1-row census of df/intersection sums);
    * the three pair rows are literal projections of that census. */
  def q424SelectivityAudit(s: SparkSession, dir: String): DataFrame = {
    val flags = Bm25Terms.zipWithIndex.map { case (term, i) =>
      array_contains(split(col("text"), " "), term).cast("long")
        .as(s"h$i")
    }
    val census = t(s, dir, "documents")
      .select(flags: _*)
      .agg(count(lit(1)).as("n_docs"),
        (Bm25Terms.indices.map(i => sum(col(s"h$i")).as(s"df$i")) ++
          (for { i <- Bm25Terms.indices; j <- Bm25Terms.indices
                 if i < j }
            yield sum(col(s"h$i") * col(s"h$j")).as(s"in${i}_$j"))): _*)
    val pairs = for { i <- Bm25Terms.indices; j <- Bm25Terms.indices
                      if i < j } yield
      census.select(lit(Bm25Terms(i)).as("term1"),
        lit(Bm25Terms(j)).as("term2"), col("n_docs"),
        col(s"df$i").as("df1"), col(s"df$j").as("df2"),
        col(s"in${i}_$j").as("inter"))
    pairs.reduce(_ unionByName _)
      .select(col("term1"), col("term2"), col("n_docs"), col("df1"),
        col("df2"), col("inter"),
        expr("""CAST(CAST(df1 AS DECIMAL(38,0)) * df2 * 1000
          DIV n_docs AS BIGINT)""").as("indep_est_milli"),
        expr("""CASE WHEN df1 = 0 OR df2 = 0 THEN NULL
          ELSE CAST(CAST(inter AS DECIMAL(38,0)) * n_docs * 1000
            DIV (CAST(df1 AS DECIMAL(38,0)) * df2) AS BIGINT) END""")
          .as("lift_milli"))
  }

  private def q424OracleSql: String = {
    val flagCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"""CAST(CASE WHEN list_contains(string_split(text, ' '),
          '$term') THEN 1 ELSE 0 END AS BIGINT) AS h$i"""
    }.mkString(", ")
    val sums = (Bm25Terms.indices.map(i =>
      s"CAST(sum(h$i) AS BIGINT) AS df$i") ++
      (for { i <- Bm25Terms.indices; j <- Bm25Terms.indices if i < j }
        yield s"CAST(sum(h$i * h$j) AS BIGINT) AS in${i}_$j"))
      .mkString(", ")
    val pairRows = (for { i <- Bm25Terms.indices
                          j <- Bm25Terms.indices if i < j } yield
      s"""SELECT '${Bm25Terms(i)}' AS term1, '${Bm25Terms(j)}' AS term2,
          n_docs, df$i AS df1, df$j AS df2, in${i}_$j AS inter
        FROM census""").mkString("\n        UNION ALL\n        ")
    s"""WITH flags AS (SELECT $flagCols FROM documents),
        census AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, $sums
          FROM flags),
        pairs AS (
        $pairRows)
        SELECT term1, term2, n_docs, df1, df2, inter,
          CAST(CAST(df1 AS HUGEINT) * df2 * 1000 // n_docs AS BIGINT)
            AS indep_est_milli,
          CASE WHEN df1 = 0 OR df2 = 0 THEN NULL
            ELSE CAST(CAST(inter AS HUGEINT) * n_docs * 1000
              // (CAST(df1 AS HUGEINT) * df2) AS BIGINT) END
            AS lift_milli
        FROM pairs"""
  }

  // ------------------------------------------------------------ q439

  /** q439's ln-derived sizing factors ×10⁶, baked as literals (the
    * q403 discipline — data enters the formula LINEARLY, the ln's are
    * of the target fpp only): bits-per-key = ln(1/p)/ln²2, hashes
    * k = round(−ln p / ln 2). */
  val BloomFpp: Seq[(Long, Long, Long)] =
    Seq((10000L, 9585058L, 7L), (1000L, 14377587L, 10L))

  /** q439 — BLOOM-FILTER SIZING ADVISOR for the four hot join keys
    * (the planner-advisory sibling of q88: q88 APPLIES a build-side
    * bloom to prune a probe scan, this answers the sizing question
    * that precedes it — how many bits and hashes does a filter on
    * this key need at a target false-positive rate, the number a
    * runtime-filter planner must know before deciding the build is
    * worth shipping). Per key × fpp ∈ {1%, 0.1%}: EXACT ndv (the
    * filter is built from the distinct build side), m_bits =
    * ndv·[[BloomFpp]] factor div 10⁶ + 1, k hashes literal, kib
    * released for the shipping-cost read — all integer arithmetic.
    *
    * Scale shape: two table scans (lineitem, orders) map-side
    * combined into per-key exact distinct aggregates — the
    * count-distinct shuffles carry only the key columns; the 8-row
    * advisory is literal projections. */
  def q439BloomSizing(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .agg(countDistinct("l_partkey").as("ndv_part"),
        countDistinct("l_suppkey").as("ndv_supp"),
        countDistinct("l_orderkey").as("ndv_order"))
    val o = t(s, dir, "orders")
      .agg(countDistinct("o_custkey").as("ndv_cust"))
    val base = li.crossJoin(o).localCheckpoint(true)
    val keys = Seq("l_partkey" -> "ndv_part", "l_suppkey" -> "ndv_supp",
      "l_orderkey" -> "ndv_order", "o_custkey" -> "ndv_cust")
    (for { (key, ndvCol) <- keys; (fppPpm, factor, k) <- BloomFpp }
      yield base.select(lit(key).as("join_key"),
        lit(fppPpm).as("fpp_ppm"), col(ndvCol).as("ndv"),
        expr(s"$ndvCol * $factor div 1000000 + 1").as("m_bits"),
        lit(k).as("k_hashes"),
        expr(s"($ndvCol * $factor div 1000000 + 1) div 8192 + 1")
          .as("kib"))).reduce(_ unionByName _)
  }

  private def q439OracleSql: String = {
    val ndvOf = Map("l_partkey" -> "lineitem", "l_suppkey" -> "lineitem",
      "l_orderkey" -> "lineitem", "o_custkey" -> "orders")
    val rows = (for { (key, tab) <- ndvOf.toSeq.sortBy(_._1)
                      (fppPpm, factor, k) <- BloomFpp } yield
      s"""SELECT '$key' AS join_key, CAST($fppPpm AS BIGINT) AS fpp_ppm,
          (SELECT CAST(count(DISTINCT $key) AS BIGINT) FROM $tab)
            AS ndv,
          (SELECT CAST(count(DISTINCT $key) AS BIGINT) FROM $tab)
            * $factor // 1000000 + 1 AS m_bits,
          CAST($k AS BIGINT) AS k_hashes,
          ((SELECT CAST(count(DISTINCT $key) AS BIGINT) FROM $tab)
            * $factor // 1000000 + 1) // 8192 + 1 AS kib""")
      .mkString("\n        UNION ALL\n        ")
    rows
  }

  // ------------------------------------------------------------ q440

  /** q440's target file size in estimated bytes, and the per-row width
    * estimate the planner prices months with. Both literals: the
    * planner's contract is the BINNING GEOMETRY, not a byte-accurate
    * forecast. */
  val CompactTargetBytes = 262144L
  val CompactRowBytes = 120L

  /** q440 — SMALL-FILE COMPACTION PLANNER over the monthly order
    * partitions (the layout-maintenance twin of q271's partitioned
    * write: date-partitioned ingest leaves a long tail of small
    * files, and every table-maintenance service — Delta OPTIMIZE,
    * Iceberg rewrite — plans exactly this bin-packing pass; this
    * declares the plan itself so it can be differential-checked).
    * ORDER-PRESERVING running-sum packing: months stay in calendar
    * order (preserving partition-pruning locality — the reason
    * maintenance services don't first-fit-decreasing a date axis),
    * file_id = exclusive-prefix-bytes div [[CompactTargetBytes]].
    * Released per month: {month, rows, bytes_est, file_id} — the
    * assignment every month-to-output mapping needs.
    *
    * Scale shape: one corpus scan map-side combined to the ~84-row
    * month census; the packing is ONE ordered window (prefix sum) over
    * that census. At 100 TB the census is per-PARTITION metadata
    * (q104's frame), never the rows. */
  def q440CompactionPlanner(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bytes_est", col("n_rows") * CompactRowBytes)
    val w = Window.orderBy("month")
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("prefix", coalesce(sum("bytes_est").over(w), lit(0L)))
      .select(col("month"), col("n_rows"), col("bytes_est"),
        expr(s"prefix div $CompactTargetBytes").as("file_id"))
  }

  private def q440OracleSql: String =
    s"""WITH census AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) * $CompactRowBytes AS bytes_est
        FROM orders GROUP BY 1)
        SELECT month, n_rows, bytes_est,
          CAST(coalesce(sum(bytes_est) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // $CompactTargetBytes AS BIGINT) AS file_id
        FROM census"""

  // ------------------------------------------------------------ q449

  /** q449 — JOIN-CARDINALITY ESTIMATION AUDIT over the star schema's
    * four FK joins (the JOIN-level counterpart of q424's conjunctive-
    * selectivity audit: a cost-based optimizer prices every join with
    * \|A⋈B\| ≈ \|A\|·\|B\|/max(ndv_A, ndv_B) — the uniform-key
    * containment assumption — and the ratio of that estimate to the
    * TRUE join cardinality is the number that decides whether a
    * multi-column-statistics or runtime-sampling feature pays for
    * itself). Per join: exact {n_left, n_right, ndv_left, ndv_right},
    * the textbook estimate by exact decimal division, the EXECUTED
    * join's true row count, and ratio_milli = 1000·actual div est.
    *
    * Scale shape: each audit is one fact equi-join (shuffle on its
    * key, the plan the estimate prices) plus per-side map-combined
    * distinct aggregates; the 4-row advisory is literal projections. */
  def q449JoinCardinality(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ords = t(s, dir, "orders")
    val joins: Seq[(String, DataFrame, String, DataFrame, String)] = Seq(
      ("lineitem_orders", li, "l_orderkey", ords, "o_orderkey"),
      ("lineitem_part", li, "l_partkey", t(s, dir, "part"), "p_partkey"),
      ("lineitem_supplier", li, "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"),
      ("orders_customer", ords, "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
    joins.map { case (name, l, lk, r, rk) =>
      val stats = l.agg(count(lit(1)).as("n_left"),
        countDistinct(lk).as("ndv_left"))
        .crossJoin(r.agg(count(lit(1)).as("n_right"),
          countDistinct(rk).as("ndv_right")))
      val actual = l.select(col(lk).as("k"))
        .join(r.select(col(rk).as("k")), "k")
        .agg(count(lit(1)).as("actual_rows"))
      stats.crossJoin(actual)
        .select(lit(name).as("join_name"), col("n_left"),
          col("n_right"), col("ndv_left"), col("ndv_right"),
          expr("""CAST(CAST(n_left AS DECIMAL(38,0)) * n_right
               div greatest(ndv_left, ndv_right) AS BIGINT)""")
            .as("est_rows"),
          col("actual_rows"),
          expr("""CAST(CAST(actual_rows AS DECIMAL(38,0)) * 1000
               div (CAST(n_left AS DECIMAL(38,0)) * n_right
                    div greatest(ndv_left, ndv_right)) AS BIGINT)""")
            .as("ratio_milli"))
    }.reduce(_ unionByName _)
  }

  private def q449OracleSql: String = {
    val joins = Seq(
      ("lineitem_orders", "lineitem", "l_orderkey", "orders",
        "o_orderkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_supplier", "lineitem", "l_suppkey", "supplier",
        "s_suppkey"),
      ("orders_customer", "orders", "o_custkey", "customer",
        "c_custkey"))
    joins.map { case (name, lt, lk, rt, rk) =>
      s"""SELECT '$name' AS join_name,
          (SELECT CAST(count(*) AS BIGINT) FROM $lt) AS n_left,
          (SELECT CAST(count(*) AS BIGINT) FROM $rt) AS n_right,
          (SELECT CAST(count(DISTINCT $lk) AS BIGINT) FROM $lt)
            AS ndv_left,
          (SELECT CAST(count(DISTINCT $rk) AS BIGINT) FROM $rt)
            AS ndv_right,
          CAST((SELECT CAST(count(*) AS HUGEINT) FROM $lt)
            * (SELECT count(*) FROM $rt)
            // greatest(
                (SELECT CAST(count(DISTINCT $lk) AS HUGEINT) FROM $lt),
                (SELECT CAST(count(DISTINCT $rk) AS HUGEINT) FROM $rt))
            AS BIGINT) AS est_rows,
          (SELECT CAST(count(*) AS BIGINT)
            FROM $lt JOIN $rt ON $lt.$lk = $rt.$rk) AS actual_rows,
          CAST((SELECT CAST(count(*) AS HUGEINT)
              FROM $lt JOIN $rt ON $lt.$lk = $rt.$rk) * 1000
            // ((SELECT CAST(count(*) AS HUGEINT) FROM $lt)
               * (SELECT count(*) FROM $rt)
               // greatest(
                  (SELECT CAST(count(DISTINCT $lk) AS HUGEINT)
                    FROM $lt),
                  (SELECT CAST(count(DISTINCT $rk) AS HUGEINT)
                    FROM $rt))) AS BIGINT) AS ratio_milli"""
    }.mkString("\n        UNION ALL\n        ")
  }

  // ------------------------------------------------------------ q456

  /** q456's short-doc threshold (tokens). */
  val CardShortDocTokens = 20L

  /** q456 — DATASET CARD: the one-row corpus summary every published
    * training set ships (Gebru et al.'s datasheets, distilled to the
    * numbers a consumer checks first): {n_docs, n_tokens, n_langs,
    * n_sources, exact-dup rate, mean doc length, short-doc fraction}.
    * The point of DECLARING it as a query is that the card is then
    * differential-checked like any operator — a dataset card that
    * drifts from its corpus is worse than none. Exact-dup rate via the
    * md5 fingerprint census (q23's detector); all ratios exact ppm /
    * milli integers.
    *
    * Scale shape: one corpus scan map-side combined to scalar
    * aggregates + one fingerprint census for the dup rate; zero
    * joins. */
  def q456DatasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("toks"),
        md5(col("text")).as("fp"))
      .localCheckpoint(true)
    val dup = docs.groupBy("fp").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c - 1")).as("n_dups"))
    docs.agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        sum(when(col("toks") < CardShortDocTokens, 1L).otherwise(0L))
          .as("n_short"))
      .crossJoin(broadcast(dup))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"),
        expr("n_dups * 1000000 div n_docs").as("dup_ppm"),
        expr("1000 * n_tokens div n_docs").as("mean_toks_milli"),
        expr("n_short * 1000000 div n_docs").as("short_ppm"))
  }

  private def q456OracleSql: String =
    s"""WITH docs AS (SELECT doc_id, lang, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
          md5(text) AS fp FROM documents),
        dup AS (SELECT CAST(sum(c - 1) AS BIGINT) AS n_dups
          FROM (SELECT CAST(count(*) AS BIGINT) AS c
                FROM docs GROUP BY fp) z),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(toks) AS BIGINT) AS n_tokens,
          CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          CAST(sum(CASE WHEN toks < $CardShortDocTokens
            THEN 1 ELSE 0 END) AS BIGINT) AS n_short
          FROM docs)
        SELECT n_docs, n_tokens, n_langs, n_sources,
          n_dups * 1000000 // n_docs AS dup_ppm,
          1000 * n_tokens // n_docs AS mean_toks_milli,
          n_short * 1000000 // n_docs AS short_ppm
        FROM g CROSS JOIN dup"""

  // ------------------------------------------------------------ q457

  /** q457's temporal cutoff. */
  val TemporalCutoff = "1999-01-01"

  /** q457 — TEMPORAL SPLIT AUDIT (the TIME axis of the split-hygiene
    * family: q62 splits by content hash, q224 catches NEAR-DUP leakage
    * across splits — but forecasting and recommendation evals split by
    * TIME, and their leak is an ENTITY appearing on both sides of the
    * cutoff, which inflates any per-user model's test score; the audit
    * quantifies exactly that overlap). Train = orders before
    * [[TemporalCutoff]], test = after; released one row {n_train,
    * n_test, cust_train, cust_test, cust_overlap, leakage_ppm =
    * overlap·10⁶ div cust_test} — at 100 TB the overlap is the size of
    * the user dimension, never the fact table.
    *
    * Scale shape: one fact scan map-side combined into per-side
    * customer distinct censuses; the overlap is a \|customers\|-bounded
    * aggregate (distinct-count of customers seen on both sides), no
    * fact-fact join. */
  def q457TemporalSplit(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"),
        (col("o_orderdate") < lit(TemporalCutoff).cast("timestamp"))
          .as("is_train"))
    val per = o.groupBy("o_custkey")
      .agg(sum(when(col("is_train"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("is_train"), 1L).otherwise(0L)).as("ne"))
    per.agg(sum("nt").as("n_train"), sum("ne").as("n_test"),
        sum(when(col("nt") > 0, 1L).otherwise(0L)).as("cust_train"),
        sum(when(col("ne") > 0, 1L).otherwise(0L)).as("cust_test"),
        sum(when(col("nt") > 0 && col("ne") > 0, 1L).otherwise(0L))
          .as("cust_overlap"))
      .select(col("n_train"), col("n_test"), col("cust_train"),
        col("cust_test"), col("cust_overlap"),
        expr("""CASE WHEN cust_test = 0 THEN NULL
             ELSE cust_overlap * 1000000 div cust_test END""")
          .as("leakage_ppm"))
  }

  private def q457OracleSql: String =
    s"""WITH o AS (SELECT o_custkey,
          o_orderdate < TIMESTAMP '$TemporalCutoff 00:00:00'
            AS is_train FROM orders),
        per AS (SELECT o_custkey,
          CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
            AS nt,
          CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
            AS ne
          FROM o GROUP BY 1),
        g AS (SELECT CAST(sum(nt) AS BIGINT) AS n_train,
          CAST(sum(ne) AS BIGINT) AS n_test,
          CAST(sum(CASE WHEN nt > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS cust_train,
          CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS cust_test,
          CAST(sum(CASE WHEN nt > 0 AND ne > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS cust_overlap
          FROM per)
        SELECT n_train, n_test, cust_train, cust_test, cust_overlap,
          CASE WHEN cust_test = 0 THEN NULL
            ELSE cust_overlap * 1000000 // cust_test END AS leakage_ppm
        FROM g"""

  // ------------------------------------------------------------ q462

  /** q462's salting trigger: hottest key carries > this × the mean
    * key load (milli). */
  val SkewGateMilli = 4000L

  /** q462 — JOIN-KEY SKEW REPORT over the star schema's four hot keys
    * (the DETECTOR that precedes q65/q163's salted joins and AQE's
    * runtime skew split: salting costs a replicated build side, so the
    * decision needs the number this audit produces — how much hotter
    * than average is the hottest key). Per key: exact {n, ndv,
    * max_cnt}, skew_ratio_milli = 1000·max_cnt·ndv div n (the
    * hottest-to-mean load ratio), and the salt recommendation at the
    * [[SkewGateMilli]] gate — all integers off one per-key census.
    *
    * Scale shape: one scan per table, each key's census map-side
    * combined (shuffle carries only the key column); the report is a
    * 4-row projection. */
  def q462SkewReport(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val keys: Seq[(String, DataFrame)] = Seq(
      ("l_partkey", li.select(col("l_partkey").as("k"))),
      ("l_suppkey", li.select(col("l_suppkey").as("k"))),
      ("l_orderkey", li.select(col("l_orderkey").as("k"))),
      ("o_custkey", t(s, dir, "orders").select(col("o_custkey").as("k"))))
    keys.map { case (name, kf) =>
      kf.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n"), count(lit(1)).as("ndv"),
          max("c").as("max_cnt"))
        .select(lit(name).as("join_key"), col("n"), col("ndv"),
          col("max_cnt"),
          expr("""CAST(1000 * CAST(max_cnt AS DECIMAL(38,0)) * ndv
               div n AS BIGINT)""").as("skew_ratio_milli"),
          expr(s"""CAST(1000 * CAST(max_cnt AS DECIMAL(38,0)) * ndv
               div n AS BIGINT) > $SkewGateMilli""")
            .as("salt_recommended"))
    }.reduce(_ unionByName _)
  }

  private def q462OracleSql: String = {
    val keys = Seq(("l_partkey", "lineitem"), ("l_suppkey", "lineitem"),
      ("l_orderkey", "lineitem"), ("o_custkey", "orders"))
    keys.map { case (k, tab) =>
      s"""SELECT '$k' AS join_key,
          CAST(sum(c) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS ndv,
          CAST(max(c) AS BIGINT) AS max_cnt,
          CAST(1000 * CAST(max(c) AS HUGEINT) * count(*)
            // sum(c) AS BIGINT) AS skew_ratio_milli,
          CAST(1000 * CAST(max(c) AS HUGEINT) * count(*)
            // sum(c) AS BIGINT) > $SkewGateMilli AS salt_recommended
        FROM (SELECT $k, CAST(count(*) AS BIGINT) AS c
              FROM $tab GROUP BY $k) z"""
    }.mkString("\n        UNION ALL\n        ")
  }

  // ------------------------------------------------------------ q470

  /** q470 — PIPELINE STAGE RECONCILIATION over the q12 star chain
    * (the row-count lineage audit every production DAG carries: each
    * stage declares rows_in → rows_out with the retention ratio, so a
    * silently exploding join or an over-eager filter is caught by a
    * NUMBER, not a postmortem — the ops twin of q226's join-blowup
    * probe, here as a declared end-to-end ledger). Stages: lineitem
    * scan → ship-date filter → ⋈ orders → ⋈ customer (dim chain) →
    * priority aggregate. Exact row counts; ratio_ppm = out·10⁶ div in.
    *
    * Scale shape: the audited chain IS the q12 plan (broadcast dim
    * chain, fact shuffle on the order key); counts add one aggregate
    * per stage over frames the chain builds anyway. */
  def q470StageReconciliation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val filtered = li.filter(col("l_shipdate") >=
      lit("1996-01-01").cast("timestamp"))
    val j1 = filtered.join(t(s, dir, "orders"),
      col("l_orderkey") === col("o_orderkey"))
    val j2 = j1.join(broadcast(t(s, dir, "customer")),
      col("o_custkey") === col("c_custkey"))
    val agg = j2.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    // counts stay distributed: one 1-row aggregate per stage,
    // crossJoined into the 5-row ledger (no driver-side .count loop)
    val counts = li.agg(count(lit(1)).as("c0"))
      .crossJoin(filtered.agg(count(lit(1)).as("c1")))
      .crossJoin(j1.agg(count(lit(1)).as("c2")))
      .crossJoin(j2.agg(count(lit(1)).as("c3")))
      .crossJoin(agg.agg(count(lit(1)).as("c4")))
      .localCheckpoint(true)
    Seq(("scan_lineitem", "c0", "c0"),
      ("filter_shipdate", "c0", "c1"), ("join_orders", "c1", "c2"),
      ("join_customer", "c2", "c3"), ("agg_priority", "c3", "c4"))
      .map { case (nm, ci, co) =>
        counts.select(lit(nm).as("stage"), col(ci).as("rows_in"),
          col(co).as("rows_out"),
          expr(s"$co * 1000000 div $ci").as("ratio_ppm"))
      }.reduce(_ unionByName _)
  }

  private def q470OracleSql: String =
    """WITH c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
        c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
        c2 AS (SELECT CAST(count(*) AS BIGINT) AS n
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
        c3 AS (SELECT CAST(count(*) AS BIGINT) AS n
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
        c4 AS (SELECT CAST(count(DISTINCT o.o_orderpriority) AS BIGINT)
            AS n
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
        SELECT 'scan_lineitem' AS stage, c0.n AS rows_in,
          c0.n AS rows_out, c0.n * 1000000 // c0.n AS ratio_ppm
        FROM c0
        UNION ALL SELECT 'filter_shipdate', c0.n, c1.n,
          c1.n * 1000000 // c0.n FROM c0, c1
        UNION ALL SELECT 'join_orders', c1.n, c2.n,
          c2.n * 1000000 // c1.n FROM c1, c2
        UNION ALL SELECT 'join_customer', c2.n, c3.n,
          c3.n * 1000000 // c2.n FROM c2, c3
        UNION ALL SELECT 'agg_priority', c3.n, c4.n,
          c4.n * 1000000 // c3.n FROM c3, c4"""

  // ------------------------------------------------------------ q475

  /** q475's swept parameterizations (the default plus the two
    * textbook extremes: near-binary saturation, aggressive length
    * normalization). Stored ×100 so the declared key is an integer. */
  val Bm25Sweep: Seq[(Long, Long)] =
    Seq((120L, 75L), (90L, 40L), (200L, 90L))

  /** q475 — BM25 PARAMETER SWEEP (the q318-style calibration pass on
    * the retrieval axis: k1 controls term-frequency saturation, b
    * length normalization, and "does the ranking even move when we
    * tune them" is the first question a retrieval owner asks before
    * any learned ranker — answered here as top-k set overlap against
    * the default plus a relevance-proxy hit count per setting). Per
    * (k1, b): q64's exact machinery at that setting; released
    * {k1_centi, b_centi, rel_hits (top-k docs containing the rare
    * term), overlap_default = \|top-k ∩ default top-k\|}.
    *
    * Scale shape: three bounded top-k runs over ONE shared tf frame
    * shape (each a corpus scan + broadcast stats +
    * TakeOrderedAndProject); the overlap joins are k-row × k-row. */
  def q475Bm25ParamSweep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rel = docs
      .filter(array_contains(split(col("text"), " "), Bm25Terms.head))
      .select(col("doc_id").as("rid"))
      .localCheckpoint(true)
    val default = bm25TopK(docs, Bm25Terms, Bm25TopK)
      .select(col("doc_id").as("did")).localCheckpoint(true)
    Bm25Sweep.map { case (k1c, bc) =>
      val top = bm25TopK(docs, Bm25Terms, Bm25TopK,
        k1c / 100.0, bc / 100.0)
        .select("doc_id").localCheckpoint(true)
      val hits = top.join(rel, col("doc_id") === col("rid"), "left_semi")
        .agg(count(lit(1)).as("rel_hits"))
      val ovl = top.join(default, col("doc_id") === col("did"),
        "left_semi").agg(count(lit(1)).as("overlap_default"))
      hits.crossJoin(ovl)
        .select(lit(k1c).as("k1_centi"), lit(bc).as("b_centi"),
          col("rel_hits"), col("overlap_default"))
    }.reduce(_ unionByName _)
  }

  private def q475OracleSql: String = {
    def cfg(name: String, k1c: Long, bc: Long): String = {
      val tfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
        s"CAST(len(list_filter(ws, bm_w -> bm_w = '$term')) AS DOUBLE) AS tf$i"
      }.mkString(", ")
      val dfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
        s"CAST(sum(CASE WHEN list_contains(ws, '$term') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
      }.mkString(", ")
      s"""${name}_sc AS (SELECT doc_id,
            ${bm25ScoreExpr(Bm25Terms.size, k1c / 100.0, bc / 100.0)}
              AS score
          FROM (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, $tfCols
                FROM d) tf
          CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              CAST(sum(len(ws)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS avgdl, $dfCols FROM d) st),
        $name AS (SELECT doc_id FROM ${name}_sc
          ORDER BY score DESC, doc_id LIMIT $Bm25TopK)"""
    }
    val cfgs = Bm25Sweep.zipWithIndex.map { case ((k1c, bc), i) =>
      cfg(s"cfg$i", k1c, bc) }.mkString(",\n        ")
    val rows = Bm25Sweep.zipWithIndex.map { case ((k1c, bc), i) =>
      s"""SELECT CAST($k1c AS BIGINT) AS k1_centi,
          CAST($bc AS BIGINT) AS b_centi,
          (SELECT CAST(count(*) AS BIGINT) FROM cfg$i
             WHERE doc_id IN (SELECT rid FROM rel)) AS rel_hits,
          (SELECT CAST(count(*) AS BIGINT) FROM cfg$i
             WHERE doc_id IN (SELECT doc_id FROM dflt))
            AS overlap_default"""
    }.mkString("\n        UNION ALL\n        ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents),
        rel AS (SELECT doc_id AS rid FROM documents
          WHERE list_contains(string_split(text, ' '),
            '${Bm25Terms.head}')),
        ${cfg("dflt", 120L, 75L)},
        $cfgs
        $rows"""
  }

  // ------------------------------------------------------------ q479

  /** q479 — INCREMENTAL DATASET-CARD MAINTENANCE (q456's card kept
    * fresh under a batch append with work ∝ batch — the q75/q166
    * incremental discipline applied to corpus governance: a card that
    * needs a full rescan per ingest never stays fresh at 100 TB).
    * Batch = the planted perturbed docs (ids at +100000, last word
    * dropped). Additive panels (docs, tokens, short) merge as sums;
    * the dup rate uses the identity n_dups = N − \|distinct fps\|,
    * where the union's distinct-fp count is corpus_fps + the batch
    * fps that ANTI-JOIN the corpus fp set — the only cross term, and
    * it is batch-sized. The oracle computes the card FROM SCRATCH
    * over the union: incremental must equal rebuild exactly.
    *
    * Scale shape: corpus-side stats are one (materializable) census;
    * per batch the work is the batch scan + a batch-keyed anti-join
    * against the fp index. */
  def q479IncrementalCard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("toks"),
      md5(col("text")).as("fp"))
    val batch = docs.select((col("doc_id") + 100000L).as("doc_id"),
      expr("""array_join(slice(split(text, ' '), 1,
           size(split(text, ' ')) - 1), ' ')""").as("text"))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("toks"),
        md5(col("text")).as("fp"))
    val corpusFps = corpus.select("fp").distinct().localCheckpoint(true)
    val corpusStats = corpus.agg(count(lit(1)).as("nd"),
      sum("toks").as("nt"),
      sum(when(col("toks") < CardShortDocTokens, 1L).otherwise(0L))
        .as("nshort")).crossJoin(
      corpusFps.agg(count(lit(1)).as("nfp")))
    val newFps = batch.select("fp").distinct()
      .join(corpusFps, Seq("fp"), "left_anti")
      .agg(count(lit(1)).as("nfp_new"))
    val batchStats = batch.agg(count(lit(1)).as("bd"),
      sum("toks").as("bt"),
      sum(when(col("toks") < CardShortDocTokens, 1L).otherwise(0L))
        .as("bshort"))
    corpusStats.crossJoin(batchStats).crossJoin(newFps)
      .select(
        (col("nd") + col("bd")).as("n_docs"),
        (col("nt") + col("bt")).as("n_tokens"),
        expr("""(nd + bd - (nfp + nfp_new)) * 1000000
             div (nd + bd)""").as("dup_ppm"),
        expr("1000 * (nt + bt) div (nd + bd)").as("mean_toks_milli"),
        expr("(nshort + bshort) * 1000000 div (nd + bd)")
          .as("short_ppm"))
  }

  private def q479OracleSql: String =
    s"""WITH uni AS (SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000,
            array_to_string(list_slice(string_split(text, ' '), 1,
              len(string_split(text, ' ')) - 1), ' ')
          FROM documents),
        d AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
          md5(text) AS fp FROM uni),
        dup AS (SELECT CAST(count(*) AS BIGINT)
            - CAST(count(DISTINCT fp) AS BIGINT) AS n_dups FROM d),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(toks) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN toks < $CardShortDocTokens
            THEN 1 ELSE 0 END) AS BIGINT) AS n_short
          FROM d)
        SELECT n_docs, n_tokens,
          n_dups * 1000000 // n_docs AS dup_ppm,
          1000 * n_tokens // n_docs AS mean_toks_milli,
          n_short * 1000000 // n_docs AS short_ppm
        FROM g CROSS JOIN dup"""

  // ------------------------------------------------------------ q487

  /** q487 — CORPUS COVERAGE MATRIX over (lang × source) (the balance
    * audit corpus governance runs before any mixture decision: q97
    * WEIGHTS sources and q331 measures lang divergence, but the first
    * question is structural — is every language represented in every
    * source at all, and how lopsided are the cells; empty cells are
    * where a "multilingual" claim quietly fails). Zero-filled
    * lang × source spine (q430 discipline); released one row {n_langs,
    * n_sources, n_cells, zero_cells, min_cell, max_cell,
    * imbalance_milli = 1000·n_langs·n_sources·max div n_docs} — all
    * exact integers.
    *
    * Scale shape: one corpus scan map-side combined to the ≤ 100-cell
    * census; the spine is dims × dims. */
  def q487CoverageMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val langs = docs.select("lang").distinct()
    val sources = docs.select("source").distinct()
    val census = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("c"))
    val spine = langs.crossJoin(sources)
      .join(census, Seq("lang", "source"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
    spine.agg(count(lit(1)).as("n_cells"),
        sum(when(col("c") === 0, 1L).otherwise(0L)).as("zero_cells"),
        min("c").as("min_cell"), max("c").as("max_cell"),
        sum("c").as("n_docs"))
      .crossJoin(broadcast(langs.agg(count(lit(1)).as("n_langs"))))
      .crossJoin(broadcast(sources.agg(count(lit(1)).as("n_sources"))))
      .select(col("n_langs"), col("n_sources"), col("n_cells"),
        col("zero_cells"), col("min_cell"), col("max_cell"),
        expr("1000 * n_langs * n_sources * max_cell div n_docs")
          .as("imbalance_milli"))
  }

  /** q487's oracle, shared with its streaming twin q491. */
  private[graft] def q487OracleSql: String =
    """WITH census AS (SELECT lang, source,
          CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        spine AS (SELECT l.lang, s.source, coalesce(c.c, 0) AS c
          FROM (SELECT DISTINCT lang FROM documents) l
          CROSS JOIN (SELECT DISTINCT source FROM documents) s
          LEFT JOIN census c ON c.lang = l.lang
            AND c.source = s.source),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
          CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS zero_cells,
          CAST(min(c) AS BIGINT) AS min_cell,
          CAST(max(c) AS BIGINT) AS max_cell,
          CAST(sum(c) AS BIGINT) AS n_docs FROM spine),
        nl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
          FROM documents),
        ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT)
            AS n_sources FROM documents)
        SELECT n_langs, n_sources, n_cells, zero_cells, min_cell,
          max_cell,
          1000 * n_langs * n_sources * max_cell // n_docs
            AS imbalance_milli
        FROM g CROSS JOIN nl CROSS JOIN ns"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q479_incremental_card" -> (q479IncrementalCard _),
    "q487_coverage_matrix" -> (q487CoverageMatrix _),
    "q475_bm25_param_sweep" -> (q475Bm25ParamSweep _),
    "q470_stage_reconciliation" -> (q470StageReconciliation _),
    "q462_skew_report" -> (q462SkewReport _),
    "q456_dataset_card" -> (q456DatasetCard _),
    "q457_temporal_split" -> (q457TemporalSplit _),
    "q449_join_cardinality" -> (q449JoinCardinality _),
    "q439_bloom_sizing" -> (q439BloomSizing _),
    "q440_compaction_planner" -> (q440CompactionPlanner _),
    "q424_selectivity_audit" -> (q424SelectivityAudit _),
    "q402_hybrid_retrieval" -> (q402HybridRetrieval _),
    "q398_bottomk_sample" -> (q398BottomkSample _),
    "q292_neyman_allocation" -> (q292NeymanAllocation _),
    "q289_fold_balance_audit" -> (q289FoldBalanceAudit _),
    "q280_quality_knapsack" -> (q280QualityKnapsack _),
    "q274_hash_cross_audit" -> (q274HashCrossAudit _),
    "q273_erasure_audit" -> (q273ErasureAudit _),
    "q263_stratified_folds" -> (q263StratifiedFolds _),
    "q260_quota_allocate" -> (q260QuotaAllocate _),
    "q250_padding_waste" -> (q250PaddingWaste _),
    "q251_consistent_hash" -> (q251ConsistentHash _),
    "q238_fk_integrity" -> (q238FkIntegrity _),
    "q237_weighted_sample" -> (q237WeightedSample _),
    "q228_quantile_normalize" -> (q228QuantileNormalize _),
    "q223_rrf_fusion" -> (q223RrfFusion _),
    "q225_effective_sources" -> (q225EffectiveSources _),
    "q221_dense_ids" -> (q221DenseIds _),
    "q159_systematic_sample" -> (q159SystematicSample _),
    "q165_rank_transform" -> (q165RankTransform _),
    "q166_incremental_agg" -> (q166IncrementalAgg _),
    "q172_shard_assign" -> (q172ShardAssign _),
    "q151_token_budget" -> (q151TokenBudget _),
    "q103_merge_upsert" -> (q103MergeUpsert _),
    "q130_quality_constraints" -> (q130QualityConstraints _),
    "q135_mixture_apply" -> (q135MixtureApply _),
    "q138_snapshot_diff" -> (q138SnapshotDiff _),
    "q141_group_sample" -> (q141GroupSample _),
    "q145_merkle_diff" -> (q145MerkleDiff _),
    "q95_pack_sequences" -> (q95PackSequences _),
    "q97_mixture_weights" -> (q97MixtureWeights _),
    "q62_hash_split" -> (q62HashSplit _),
    "q64_bm25_topk" -> (q64Bm25TopK _),
    "q65_salted_join" -> (q65SaltedJoin _),
    "q66_approx_quantile" -> (q66ApproxQuantile _),
    "q75_incremental_dedup" -> (q75IncrementalDedup _),
    "q79_prepare_corpus" -> (q79PrepareCorpus _),
    "q84_decontaminate" -> (q84Decontaminate _),
    "q85_stratified_sample" -> (q85StratifiedSample _))

  val oracleSql: Map[String, String] = Map(
    "q398_bottomk_sample" -> q398OracleSql,
    "q479_incremental_card" -> q479OracleSql,
    "q487_coverage_matrix" -> q487OracleSql,
    "q475_bm25_param_sweep" -> q475OracleSql,
    "q470_stage_reconciliation" -> q470OracleSql,
    "q462_skew_report" -> q462OracleSql,
    "q456_dataset_card" -> q456OracleSql,
    "q457_temporal_split" -> q457OracleSql,
    "q449_join_cardinality" -> q449OracleSql,
    "q439_bloom_sizing" -> q439OracleSql,
    "q440_compaction_planner" -> q440OracleSql,
    "q424_selectivity_audit" -> q424OracleSql,
    "q402_hybrid_retrieval" -> q402OracleSql,
    "q292_neyman_allocation" -> q292OracleSql,
    "q289_fold_balance_audit" -> q289OracleSql,
    "q280_quality_knapsack" -> q280OracleSql,
    "q274_hash_cross_audit" -> q274OracleSql,
    "q273_erasure_audit" -> q273OracleSql,
    "q263_stratified_folds" -> q263OracleSql,
    "q260_quota_allocate" -> q260OracleSql,
    "q250_padding_waste" -> q250OracleSql,
    "q251_consistent_hash" -> q251OracleSql,
    "q238_fk_integrity" -> q238OracleSql,
    "q237_weighted_sample" -> q237OracleSql,
    "q228_quantile_normalize" -> q228OracleSql,
    "q223_rrf_fusion" -> q223OracleSql,
    "q225_effective_sources" -> q225OracleSql,
    "q221_dense_ids" -> q221OracleSql,
    "q151_token_budget" -> q151OracleSql,
    "q159_systematic_sample" -> q159OracleSql,
    "q165_rank_transform" -> q165OracleSql,
    "q166_incremental_agg" -> q166OracleSql,
    "q172_shard_assign" -> q172OracleSql,
    "q103_merge_upsert" -> q103OracleSql,
    "q130_quality_constraints" -> q130OracleSql,
    "q135_mixture_apply" -> q135OracleSql,
    "q138_snapshot_diff" -> q138OracleSql,
    "q141_group_sample" -> q141OracleSql,
    "q145_merkle_diff" -> q145OracleSql,
    "q95_pack_sequences" -> q95OracleSql,
    "q97_mixture_weights" -> q97OracleSql,
    "q62_hash_split" -> q62OracleSql,
    "q64_bm25_topk" -> q64OracleSql,
    "q65_salted_join" -> q65OracleSql,
    "q66_approx_quantile" -> q66OracleSql,
    "q75_incremental_dedup" -> q75OracleSql,
    "q79_prepare_corpus" -> q79OracleSql,
    "q84_decontaminate" -> q84OracleSql,
    "q85_stratified_sample" -> q85OracleSql)
}
