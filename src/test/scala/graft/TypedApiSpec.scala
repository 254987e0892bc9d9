package graft

import graft.sources.Tables

// top-level: Spark can't build an encoder for a class nested inside the
// suite (no outer scope at executor deserialization time)
case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)

/** Typed Dataset[T] parity: the same logic through case-class encoders
  * (compile-time field checks) must match the untyped DataFrame result.
  * Typed rows pay serde at object boundaries, so the library reserves
  * them for state machines (streaming) and tests; this spec pins that the
  * two APIs agree. */
class TypedApiSpec extends SparkSpec {

  test("typed filter+groupByKey matches untyped groupBy") {
    import spark.implicits._
    val ds = Tables.load(spark, sf1, "customer").as[Customer]
    val typed = ds.filter(_.c_acctbal > 0)
      .groupByKey(_.c_nationkey)
      .mapGroups((k, it) => (k, it.size.toLong))
      .toDF("c_nationkey", "n")
    import org.apache.spark.sql.functions._
    val untyped = Tables.load(spark, sf1, "customer")
      .filter(col("c_acctbal") > 0)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    assert(typed.exceptAll(untyped).count() === 0L)
    assert(untyped.exceptAll(typed).count() === 0L)
  }

  test("typed map preserves encoder schema") {
    import spark.implicits._
    val ds = Tables.load(spark, sf1, "customer").as[Customer]
    val bumped = ds.map(c => c.copy(c_acctbal = c.c_acctbal + 1.0))
    // encoder output marks primitives non-nullable (tighter than the
    // parquet source's nullable columns) — compare names/types only
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(bumped.schema) === shape(ds.schema))
    assert(bumped.count() === 150L)
  }
}
