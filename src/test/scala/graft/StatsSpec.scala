package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Semantic checks for the round-9 Stats surface (q303–q306). The DuckDB
  * differential pins exact values; these pin the INVARIANTS that must hold
  * at any scale factor, plus a brute-force model for the rank-sum test. */
class StatsSpec extends SparkSpec {

  test("q303 Mann-Whitney matches a brute-force midrank model") {
    val row = Stats.q303MannWhitney(spark, sf1).head()
    val vals = graft.sources.Tables.load(spark, sf1, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase").as("arm"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val sorted = vals.sortBy(_._2)
    val n = sorted.length
    // midrank model: rank i..j of a tie block all get (i+j)/2
    val rank2 = new Array[Long](n) // 2x the midrank
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j)._2 == sorted(i)._2) j += 1
      val r2 = (i + 1).toLong + j.toLong // (i+1 + j) = 2 * midrank
      (i until j).foreach(k => rank2(k) = r2)
      i = j
    }
    val n1 = vals.count(_._1).toLong
    val n2 = n - n1
    val sr2 = sorted.zipWithIndex.filter(_._1._1).map(p => rank2(p._2)).sum
    val u2 = sr2 - n1 * (n1 + 1)
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(row.getAs[Long]("u2") === u2)
    // tie term: sum over tie blocks of m^3 - m
    val ties = vals.groupBy(_._2).values
      .map(g => { val m = g.length.toLong; m * m * m - m }).sum
    assert(row.getAs[Long]("ties") === ties)
    // z reproduced in the same double arithmetic
    val u = u2 / 2.0
    val nn = (n1 + n2).toDouble
    val z = (u - n1.toDouble * n2 / 2.0) /
      math.sqrt(n1.toDouble * n2 / 12.0 *
        ((nn + 1.0) - ties.toDouble / (nn * (nn - 1.0))))
    assert(row.getAs[Long]("z_ppm") === math.floor(z * 1e6).toLong)
  }

  test("q304 ACF emits all lags with Cauchy-Schwarz-bounded numerators") {
    val rows = Stats.q304Acf(spark, sf1).collect()
    assert(rows.map(_.getAs[Long]("lag")).sorted ===
      (1L to Stats.AcfMaxLag.toLong).toArray)
    val den = rows.head.getAs[Long]("den")
    assert(den > 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("den") === den, "den must be lag-invariant")
      assert(math.abs(r.getAs[Long]("num")) <= den,
        s"|num| > den at lag ${r.getAs[Long]("lag")}")
    }
  }

  test("q305 share is a valid proportion and totals are year-consistent") {
    val rows = Stats.q305MarketShare(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("brand_rev")
      val t = r.getAs[Long]("total_rev")
      val s = r.getAs[Long]("share_ppm")
      assert(b >= 0L && b <= t, s"brand outside [0, total]: $r")
      assert(s === b * BigInt(1000000) / t, s"share_ppm mismatch: $r")
    }
    // the ASIA-scoped total must not exceed the unscoped corpus revenue
    val corpus = graft.sources.Tables.load(spark, sf1, "lineitem")
      .agg(sum(expr("""CAST(floor(l_extendedprice * 100) AS BIGINT)
        * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))""")
        .cast("decimal(38,0)")))
      .head().getDecimal(0).longValueExact()
    assert(rows.map(_.getAs[Long]("total_rev")).sum <= corpus)
  }

  test("q306 emits exactly n*w - w(w+1)/2 candidate pairs, each ranked " +
    "within the window") {
    val n = graft.sources.Tables.load(spark, sf1, "documents").count()
    val rows = Stats.q306SortedNeighborhood(spark, sf1).collect()
    val w = Stats.SnWindow.toLong
    assert(rows.length.toLong === n * w - w * (w + 1) / 2)
    assert(rows.forall { r =>
      val g = r.getAs[Long]("gap"); g >= 1L && g <= w
    })
    // pairs are distinct and never self-paired
    val pairs = rows.map(r =>
      (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")))
    assert(pairs.distinct.length === pairs.length)
    assert(pairs.forall(p => p._1 != p._2))
    // jaccard is a valid basis-point proportion
    assert(rows.forall { r =>
      val j = r.getAs[Long]("jaccard_bp"); j >= 0L && j <= 10000L
    })
  }
}
