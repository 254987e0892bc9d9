package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.sources.{ParquetBinding, SourceBinding, Tables}

/** Source-layer checks mirroring the reference's own row-count validation
  * (reference README.md:596-597, 876-877) and the lower-case normalization
  * that fixes its one real bug surface (README.md:708). */
class TablesSpec extends SparkSpec {

  val expectedCounts = Map(
    "region" -> 5L, "nation" -> 25L, "customer" -> 150L,
    "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
    "lineitem" -> 6000L, "documents" -> 500L, "embeddings" -> 500L,
    "events" -> 1000L)

  test("row counts at sf0.001 match FIXTURES.md") {
    expectedCounts.foreach { case (name, n) =>
      assert(Tables.load(spark, sf1, name).count() === n, name)
    }
  }

  test("all column names are lower-case after load") {
    Tables.names.foreach { name =>
      val cols = Tables.load(spark, sf1, name).columns
      assert(cols.forall(c => c == c.toLowerCase), s"$name: ${cols.toSeq}")
    }
  }

  test("events.ts is read as a usable timestamp despite parquet NANOS") {
    val events = Tables.load(spark, sf1, "events")
    assert(events.schema("ts").dataType === TimestampType)
    import org.apache.spark.sql.functions._
    val r = events.agg(
      min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1")).head()
    assert(r.getInt(0) === 2024 && r.getInt(1) === 2024)
  }

  test("customer schema keeps int64 custkey") {
    assert(Tables.load(spark, sf1, "customer")
      .schema("c_custkey").dataType === LongType)
  }

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sf1)
    val n = spark.sql("SELECT count(*) FROM nation").head().getLong(0)
    assert(n === 25L)
  }

  test("ParquetBinding serves the same contract as Tables.load") {
    val binding: SourceBinding = new ParquetBinding(sf1)
    assert(binding.table(spark, "region").count() === 5L)
  }

  test("SparkEntry.entry (driver smoke contract) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }
}
