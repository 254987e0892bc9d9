package graft

import org.apache.spark.sql.functions._

import graft.operators.Portfolio
import graft.sources.Tables

/** Invariant + model checks for the TPC-H portfolio completion
  * (q370–q380). The DuckDB differential pins exact values at sf0.01/0.1;
  * these pin the scale-independent contracts: the q380 aggregate rewrite
  * against the literal EXISTS formulation, conservation laws (q376's
  * distribution covers every customer), argmin/argmax self-consistency,
  * and the q372 pushdown plan shape. */
class PortfolioSpec extends SparkSpec {

  test("q370 releases exactly the per-part minima, all ties included") {
    val out = Portfolio.q370MinCostSupplier(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("offer_c")))
    // one offer value per part in the output, and re-deriving the min
    // from the released rows changes nothing (min of mins = the min)
    val byPart = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(byPart.nonEmpty)
    assert(byPart.values.forall(_.length === 1))
  }

  test("q372 pushes all three range predicates into the parquet scan") {
    val plan = Portfolio.q372ForecastRevenue(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    // shipdate range and the quantity cap are scan-level predicates;
    // the discount band sits on a derived cast so it filters post-scan,
    // but the raw column read must carry the pushable pair
    assert(plan.contains("l_shipdate"))
    assert(Seq("LessThan(l_quantity", "l_quantity)")
      .exists(plan.contains), s"quantity filter not pushed:\n$plan")
  }

  test("q374 threshold test is mean-relative: released parts all beat " +
    "the mean share and the complement contains the mean") {
    val sup = Tables.load(spark, sf1, "supplier")
      .filter(col("s_nationkey") === Portfolio.ImportantNationKey)
      .select("s_suppkey")
    val perPart = Tables.load(spark, sf1, "lineitem")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)") *
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("val"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tv = perPart.map(_._2).sum
    val np = perPart.length.toLong
    val expected = perPart.filter { case (_, v) =>
      BigInt(v) * np > BigInt(tv) * Portfolio.ImportantMeanMult
    }.map(_._1).toSet
    val got = Portfolio.q374ImportantParts(spark, sf1)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("q376 distribution conserves the customer count, zero bucket " +
    "counts only truly orderless customers") {
    val dist = Portfolio.q376CustDist(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.load(spark, sf1, "customer").count()
    assert(dist.map(_._2).sum === nCust)
    // cross-check one bucket against a direct inner-join count: the
    // number of customers with >=1 qualifying order
    val withOrders = Tables.load(spark, sf1, "orders")
      .filter(col("o_orderpriority") =!= Portfolio.CustDistExcluded)
      .select("o_custkey").distinct().count()
    val zeroBucket = dist.filter(_._1 == 0L).map(_._2).sum
    assert(zeroBucket === nCust - withOrders)
  }

  test("q377 releases the full argmax set at one shared maximum") {
    val rows = Portfolio.q377TopSupplier(spark, sf1).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("total_rev")).distinct.length === 1)
  }

  test("q380 aggregate rewrite equals the literal EXISTS/NOT-EXISTS " +
    "formulation") {
    val li = Tables.load(spark, sf1, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // literal Q21 semantics, straight off the definition
    val byOrder = li.groupBy(_._1)
    val expected = li.filter(_._3 == "R").filter { case (o, s, _) =>
      val others = byOrder(o).filter(_._2 != s)
      others.nonEmpty && !others.exists(_._3 == "R")
    }.map(t => (t._1, t._2)).distinct
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val supName = Tables.load(spark, sf1, "supplier")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = Portfolio.q380SoleFailingSupplier(spark, sf1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expected.map { case (k, v) => (supName(k), v) })
  }

  test("q379 majority shares: at most one supplier can hold the " +
    "majority of any part, and every released count is positive") {
    val rows = Portfolio.q379ExcessSuppliers(spark, sf1).collect()
    assert(rows.forall(_.getAs[Long]("n_excess_parts") > 0L))
    // majority is exclusive: total excess parts counted once each
    val sq = Tables.load(spark, sf1, "lineitem")
      .filter(col("l_shipdate") >= lit(Portfolio.PriorityYearLo)
        .cast("timestamp")
        && col("l_shipdate") < lit(Portfolio.PriorityYearHi)
          .cast("timestamp"))
      .join(Tables.load(spark, sf1, "part")
        .filter(col("p_name").startsWith(Portfolio.ProfitNamePrefix))
        .select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val winners = sq.groupBy(_._2).filter { case (_, g) =>
      val tot = g.map(_._3).sum
      g.count(x => 2 * x._3 > tot) > 1 // impossible by arithmetic
    }
    assert(winners.isEmpty)
    assert(rows.map(_.getAs[Long]("n_excess_parts")).sum ===
      sq.groupBy(_._2).count { case (_, g) =>
        val tot = g.map(_._3).sum; g.exists(x => 2 * x._3 > tot)
      })
  }

  test("q472 YoY: first-year months have NULL growth and every ratio " +
    "replays the census") {
    val P = graft.operators.Portfolio
    val rows = P.q472YoyGrowth(spark, sf1).collect()
      .map(r => (r.getAs[Long]("yr"), r.getAs[Long]("mo")) ->
        (r.getAs[Long]("rev"),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    val census = graft.sources.Tables.load(spark, sf1, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("rev"))
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong) ->
        r.getLong(2)).toMap
    assert(rows.keySet === census.keySet)
    val minYr = census.keys.map(_._1).min
    rows.foreach { case ((yr, mo), (rev, prev, yoy)) =>
      assert(rev === census((yr, mo)))
      census.get((yr - 1, mo)) match {
        case Some(p) =>
          assert(prev === Some(p))
          assert(yoy === Some((rev - p) * 1000L / p), s"$yr-$mo")
        case None =>
          assert(yr === minYr || !census.contains((yr - 1, mo)))
          assert(yoy.isEmpty, s"$yr-$mo should have NULL growth")
      }
    }
  }

  test("q473 decomposition identity: matched delta = vol + price + " +
    "joint per brand, and total = matched + mix") {
    val P = graft.operators.Portfolio
    val rows = P.q473PriceVolumeDecomposition(spark, sf1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dr = r.getAs[Long]("dr_total")
      val (v, pz, j, m) = (r.getAs[Long]("vol_eff"),
        r.getAs[Long]("price_eff"), r.getAs[Long]("joint_eff"),
        r.getAs[Long]("mix_eff"))
      // identity by construction: total = vol + price + joint + mix
      assert(dr === v + pz + j + m, s"${r.getString(0)} identity")
    }
  }

  test("q486 ABC classes partition the parts, shares sum to one, and " +
    "A carries the most revenue per part") {
    val P = graft.operators.Portfolio
    val rows = P.q486AbcClassification(spark, sf1).collect()
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("rev_share_ppm")))
      .toMap
    assert(rows.keySet === Set("A", "B", "C"))
    val nParts = graft.sources.Tables.load(spark, sf1, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum === nParts)
    val shareSum = rows.values.map(_._2).sum
    assert(shareSum >= 999997L && shareSum <= 1000000L,
      s"shares sum to $shareSum")
    // A parts are the head: revenue per part strictly dominates C's
    val perPartA = rows("A")._2.toDouble / rows("A")._1
    val perPartC = rows("C")._2.toDouble / rows("C")._1
    assert(perPartA > perPartC)
    // cumulative bounds: A alone stays under its 80% bound + one part
    assert(rows("A")._2 <= 850000L, "A overshoots the 80% boundary badly")
  }
}
