package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Semantic checks for the integer-arithmetic PageRank the differential
  * can't express: hand-computed fixed points, mass bounds, determinism. */
class GraphSpec extends SparkSpec {

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRank(
      nodes.toDF("id"), edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank on a 3-path matches the hand-computed integer fixpoint") {
    // 1 -> 2 -> 3, scale 10^6, damping 85/100, base 150000.
    // iter1: r=(150000, 150000+850000, 150000+850000)
    // iter2: contrib(2)=150000*85 div 100=127500; contrib(3)=850000
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(r === Map(1L -> 150000L, 2L -> 277500L, 3L -> 1000000L))
  }

  test("pageRank splits rank equally across out-edges (integer floor)") {
    // 1 -> {2,3}: each gets (10^6*85 div 100) div 2 = 425000 in iter 1
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (1L, 3L)), iters = 1)
    assert(r(2L) === 150000L + 425000L)
    assert(r(2L) === r(3L))
  }

  test("isolated nodes keep exactly the damping floor") {
    val r = ranksOf(Seq(1L, 2L, 9L), Seq((1L, 2L)), iters = 3)
    assert(r(9L) === 150000L)
  }

  test("q99 covers every nation, conserves mass bounds, is deterministic") {
    // id keeps the node frame's type (nation keys are INT)
    val a = Graph.q99PageRank(spark, sf1).collect()
      .map(r => r.getAs[Number]("id").longValue -> r.getLong(1)).toMap
    assert(a.size === 25)
    val n = a.size.toLong
    // every node ≥ floor; total ≤ n·scale (mass only leaks, never grows)
    assert(a.values.forall(_ >= 150000L))
    assert(a.values.sum <= n * Graph.PrScale)
    val b = Graph.q99PageRank(spark, sf1).collect()
      .map(r => r.getAs[Number]("id").longValue -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("q131 recursive-CTE hops equal an explicit BFS over the same graph") {
    val got = Graph.q131Reachability(spark, sf1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 0L, "the seed reaches itself in 0 hops")
    assert(got.values.forall(_ <= Graph.MaxHops))
    // independent model: collect the same rarity-ranked corridor list
    // and run a driver-side BFS (fine in a test; the operator itself
    // never collects)
    val edges = spark.sql(
      s"""SELECT src, dst FROM (
            SELECT src, dst, row_number() OVER (ORDER BY cnt, src, dst)
              AS rn
            FROM (SELECT CAST(c.c_nationkey AS BIGINT) AS src,
                    CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
                  FROM g131_lineitem l
                  JOIN g131_orders o ON l.l_orderkey = o.o_orderkey
                  JOIN g131_customer c ON o.o_custkey = c.c_custkey
                  JOIN g131_supplier s ON l.l_suppkey = s.s_suppkey
                  WHERE c.c_nationkey <> s.s_nationkey
                  GROUP BY 1, 2) g) rk
          WHERE rn <= ${Graph.RareEdges}""").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = scala.collection.mutable.Map(0L -> 0L)
    var frontier = Set(0L)
    var hop = 0L
    while (frontier.nonEmpty && hop < Graph.MaxHops) {
      hop += 1
      frontier = frontier.flatMap(n =>
          edges.getOrElse(n, Array.empty[Long]))
        .filterNot(n => dist.contains(n))
      frontier.foreach(n => dist(n) = hop)
    }
    assert(got === dist.toMap,
      s"recursive CTE ${got.toSeq.sorted} != BFS ${dist.toSeq.sorted}")
  }
}
