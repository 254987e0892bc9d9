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
