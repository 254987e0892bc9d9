package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.operators.Core

/** Operator-level checks for the reference surface (SURVEY.md §2.1),
  * mirroring the transcripts' own validations plus plan-shape assertions
  * Catalyst is expected to deliver (SURVEY.md §4.2). */
class CoreSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01 full scan returns every customer row") {
    assert(Core.q01FullScan(spark, sf1).count() === 150L)
  }

  test("q02 narrows nationkey to bigint (reference T1 decimal->bigint)") {
    val df = Core.q02ReadbackProjection(spark, sf1)
    assert(df.schema("c_nationkey").dataType.typeName === "long")
  }

  test("q03 SQL-string and DataFrame-method projections optimize to the " +
    "same plan (reference README.md:801-833 equivalence)") {
    val p1 = Core.q03Projection(spark, sf1)
      .queryExecution.optimizedPlan.canonicalized
    val p2 = Core.q03ProjectionSql(spark, sf1)
      .queryExecution.optimizedPlan.canonicalized
    assert(p1 === p2)
  }

  test("q03 projection prunes the parquet read schema") {
    val plan = formatted(Core.q03Projection(spark, sf1))
    assert(!plan.contains("l_shipdate"), "pruned column leaked into scan")
  }

  test("q05 point lookup pushes the filter to the scan") {
    val plan = formatted(Core.q05PointLookup(spark, sf1))
    // EqualTo reaches the scan; IsNotNull is ABSENT because the source
    // boundary marks c_custkey non-nullable (JDBC-metadata analog) and
    // null-propagation deletes the redundant guard
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(c_custkey"))
    assert(!plan.replaceAll("\\s", "").contains("IsNotNull(c_custkey)"))
    assert(Core.q05PointLookup(spark, sf1).count() === 1L)
  }

  test("q09 denorm join broadcasts the nation dim") {
    val plan = formatted(Core.q09DenormJoin(spark, sf1))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q09 denorm join output matches inner-join row count") {
    // every customer has a valid nation FK -> |join| == |customer|
    assert(Core.q09DenormJoin(spark, sf1).count() === 150L)
  }

  test("q11 self join resolves manager rows") {
    val df = Core.q11SelfJoin(spark, sf1)
    // every c_nationkey (0-24) is a valid c_custkey (0-149)
    assert(df.count() === 150L)
    val bad = df.filter("mgr_custkey < 0 OR mgr_custkey > 149").count()
    assert(bad === 0L)
  }

  test("q12 multiway join keeps every lineitem (FK chain fully covered)") {
    assert(Core.q12MultiwayJoin(spark, sf1).count() === 6000L)
  }

  test("q12 multiway join broadcasts both small dims") {
    val plan = formatted(Core.q12MultiwayJoin(spark, sf1))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins:\n${plan.take(3000)}")
  }

  test("q13 count matches reference-style row-count check") {
    assert(Core.q13Count(spark, sf1).head().getLong(0) === 1500L)
  }

  test("q14 distinct yields one row per nation present in customer") {
    assert(Core.q14Distinct(spark, sf1).count() === 25L)
  }

  test("q15 cluster-order rank restarts per partition key") {
    val df = Core.q15ClusterOrder(spark, sf1)
    import org.apache.spark.sql.functions._
    val perGroup = df.groupBy("c_nationkey")
      .agg(min("rn").as("lo"), count(lit(1)).as("n"), max("rn").as("hi"))
    val bad = perGroup.filter("lo <> 1 OR hi <> n").count()
    assert(bad === 0L)
  }

  test("q16 renders timestamps as text (reference T2)") {
    val df = Core.q16TimestampFormat(spark, sf1)
    assert(df.schema("o_date_str").dataType.typeName === "string")
    val sample = df.filter("o_date_str NOT RLIKE " +
      "'^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$'").count()
    assert(sample === 0L)
  }

  test("limit(n) caps rows like the transcripts' show(n) (L1)") {
    assert(Core.q01FullScan(spark, sf1).limit(5).count() === 5L)
  }

  test("q296 the date spine is gapless over the orders span with a " +
    "consistent weekday cycle and correct month-end flags") {
    import org.apache.spark.sql.functions._
    val rows = Core.q296DateDim(spark, sf1).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .sortBy(_._1.toEpochDay)
    val span = graft.sources.Tables.load(spark, sf1, "orders")
      .agg(min(col("o_orderdate").cast("date")),
        max(col("o_orderdate").cast("date"))).head()
    val (d0, d1) = (span.getDate(0).toLocalDate,
      span.getDate(1).toLocalDate)
    assert(rows.head._1 === d0 && rows.last._1 === d1)
    assert(rows.length.toLong ===
      java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1,
      "spine has gaps or duplicates")
    // weekday cycles mod 7 along consecutive days
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert((a._2 + 1) % 7 === b._2, s"dow broke at ${b._1}")
    }
    for ((d, _, _, m, q, me) <- rows.take(400)) {
      assert(m === d.getMonthValue.toLong)
      assert(q === ((d.getMonthValue - 1) / 3 + 1).toLong)
      assert(me === (d.getDayOfMonth == d.lengthOfMonth), s"$d")
    }
  }

  test("q294 catalog stats replay independent per-column aggregates") {
    import org.apache.spark.sql.functions._
    val rows = Core.q294AnalyzeStats(spark, sf1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5),
          r.getString(6)))).toMap
    assert(rows.keySet === Core.AnalyzeCols.toSet)
    for ((tbl, cn) <- Core.AnalyzeCols.take(4)) {
      val df = graft.sources.Tables.load(spark, sf1, tbl)
      val (n, nulls, ndv, mn, mx) = rows((tbl, cn))
      assert(n === df.count())
      assert(nulls === df.filter(col(cn).isNull).count())
      assert(ndv === df.select(cn).distinct().count())
      val r = df.agg(min(col(cn)).cast("string"),
        max(col(cn)).cast("string")).head()
      assert(mn === r.getString(0) && mx === r.getString(1))
    }
  }

  test("q453 ORC round-trip: the footer-typed read-back aggregates " +
    "exactly like the parquet original") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Core.q453OrcRoundtrip(spark, sf1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    val want = graft.sources.Tables.load(spark, sf1, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"),
        sum(expr("CAST(floor(o_custkey) AS BIGINT)")).as("cust_sum"),
        max(expr("date_format(o_orderdate, 'yyyy-MM-dd')"))
          .as("max_day"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(got === want)
    assert(got.size === 15)
  }

  test("q477 PERMISSIVE ingest quarantines exactly the planted " +
    "malformed lines and loses no good row") {
    val C = graft.operators.Core
    val row = C.q477MalformedCsvAudit(spark, sf1).head()
    val nDocs = graft.sources.Tables.load(spark, sf1, "documents")
      .count()
    assert(row.getAs[Long]("n_good") === nDocs,
      "a parseable row was dropped or quarantined")
    assert(row.getAs[Long]("n_corrupt") ===
      (C.MalformedLines.size - 1).toLong,
      "a planted malformed line escaped the corrupt column")
    assert(row.getAs[Long]("n_rows") ===
      nDocs + C.MalformedLines.size - 1)
  }
}
