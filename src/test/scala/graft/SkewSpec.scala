package graft

import org.apache.spark.sql.functions._

import graft.operators.{Core, Skew}
import graft.sources.Tables

/** Salted join must be result-identical to the plain join. */
class SkewSpec extends SparkSpec {

  test("saltedEquiJoin equals the unsalted inner join") {
    val customer = Tables.load(spark, sf1, "customer")
    val nation = Tables.load(spark, sf1, "nation")
    val plain = customer.join(
        nation, customer("c_nationkey") === nation("n_nationkey"))
      .select("c_custkey", "n_name")
    val salted = Skew.saltedEquiJoin(
        customer, nation, "c_nationkey", "n_nationkey", numSalts = 4)
      .select("c_custkey", "n_name")
    assert(plain.exceptAll(salted).count() === 0L)
    assert(salted.exceptAll(plain).count() === 0L)
  }

  test("q508: AQE skew split fires (skew=true in the adaptive plan) " +
    "and agrees with the salted join on every group") {
    // Force the runtime skew split at test scale: the planted hot key
    // (~30% of lineitem on key 0, measured 57 KB vs a 27 KB median
    // shuffle partition at sf0.01) is unambiguously skewed once the
    // thresholds are lowered. One more scale emulation is needed: AQE
    // splits a skewed reduce partition at MAP-CHUNK boundaries, and the
    // single-file/single-row-group fixture gives the scan exactly ONE
    // map task — nothing to split. A production fact scan has thousands
    // of map tasks; the round-robin repartition below stands in for
    // them (32 map chunks feeding the join exchange).
    val forced = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "8kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4kb",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = forced.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    forced.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // parity: the declared query's two paths agree on every group
      val df = graft.operators.Extensions
        .q508AqeSkewParity(spark, "/root/testdata/sf0.01")
      val rows = df.collect() // execution finalizes the adaptive plan
      assert(rows.length === 5)
      assert(rows.forall(_.getAs[Boolean]("paths_agree")),
        "AQE path and salted path disagree")
      // plan: the same skewed SMJ with a multi-map-task fact child
      // really gets the runtime split (skew=true in the final plan)
      val (fact, dim) = graft.operators.Extensions
        .aqeSkewSides(spark, "/root/testdata/sf0.01")
      // keep qty in the plan: count-only would prune the fact to its
      // constant hot key, which compresses under the skew threshold
      val skewed = fact.repartition(32).hint("merge")
        .join(dim, col("k") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"))
      val viaAqe = skewed.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val finalPlan = skewed.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split SMJ in the adaptive plan:\n$finalPlan")
      // and the split run returns the same groups as the declared query
      rows.foreach { r =>
        assert(viaAqe(r.getAs[String]("o_orderpriority")) ===
          r.getAs[Long]("n_aqe"))
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting splits a hot key across multiple partitions") {
    val customer = Tables.load(spark, sf1, "customer")
    val nation = Tables.load(spark, sf1, "nation")
    val salted = Skew.saltedEquiJoin(
      customer, nation, "c_nationkey", "n_nationkey", numSalts = 8)
    // the join ran over (key, salt): replicating the dim 8x must not
    // duplicate results
    assert(salted.count() === 150L)
  }
}
