package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Core

/** The write contract preserves the reference's partition+clustering
  * semantics (README.md:902-913) and survives a round trip. */
class SinkSpec extends SparkSpec {

  test("writeClustered round-trips with rows ordered by ck within pk files") {
    val out = Files.createTempDirectory("graft_sink").toString
    val denorm = Core.q09DenormJoin(spark, sf1)
    Sink.writeClustered(denorm, "n_nationkey", "c_custkey", out)
    val back = spark.read.parquet(out)
    assert(back.count() === denorm.count())
    // within every file (= written partition), c_custkey is nondecreasing
    val withFile = back.withColumn("f", input_file_name())
      .withColumn("rn", monotonically_increasing_id())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("f").orderBy("rn")
    val violations = withFile
      .withColumn("prev", lag("c_custkey", 1).over(w))
      .withColumn("prev_pk", lag("n_nationkey", 1).over(w))
      .filter(col("prev").isNotNull &&
        col("prev_pk") === col("n_nationkey") &&
        col("prev") > col("c_custkey"))
      .count()
    assert(violations === 0L, "clustering order broken within a partition")
  }

  test("auditClustered passes a contract-respecting layout (q213 shape)") {
    val res = Core.q213SinkOrder(spark, sf1).collect()
    assert(res.length === 16)
    val orders = graft.sources.Tables.load(spark, sf1, "orders")
    assert(res.map(_.getAs[Long]("n_rows")).sum === orders.count())
    assert(res.forall(_.getAs[Long]("viol") === 0L))
    assert(res.forall(_.getAs[Long]("split_keys") === 0L))
  }

  test("auditClustered catches a broken clustering order") {
    val out = Files.createTempDirectory("graft_sink_bad1").toString
    graft.sources.Tables.load(spark, sf1, "orders")
      .repartition(col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"), desc("o_orderkey")) // ck DESC
      .write.mode("overwrite").parquet(out)
    val audit = Sink.auditClustered(spark, out, "o_custkey", "o_orderkey")
    assert(audit.agg(sum("inv")).head.getLong(0) > 0L,
      "descending-ck layout should show inversions")
  }

  test("auditClustered catches a non-co-located partition key") {
    val out = Files.createTempDirectory("graft_sink_bad2").toString
    graft.sources.Tables.load(spark, sf1, "orders")
      .repartition(8) // round-robin: keys scatter across files
      .write.mode("overwrite").parquet(out)
    val audit = Sink.auditClustered(spark, out, "o_custkey", "o_orderkey")
    assert(audit.filter(col("nf") > 1).count() > 0L,
      "round-robin layout should split keys across files")
  }

  test("narrowKeys casts to bigint (reference T1)") {
    val df = graft.sources.Tables.load(spark, sf1, "customer")
    val narrowed = Sink.narrowKeys(df, Seq("c_nationkey"))
    assert(narrowed.schema("c_nationkey").dataType === LongType)
  }

  test("writePartitionedTable gives readers partition pruning") {
    val out = Files.createTempDirectory("graft_sink3").toString
    val denorm = Core.q09DenormJoin(spark, sf1)
    Sink.writePartitionedTable(denorm, "n_nationkey", out)
    val filtered = spark.read.parquet(out).filter(col("n_nationkey") === 7L)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    assert(filtered.count() ===
      denorm.filter(col("n_nationkey") === 7L).count())
  }

  test("overwrite mode makes re-runs idempotent (reference D3)") {
    val out = Files.createTempDirectory("graft_sink2").toString
    val df = Core.q14Distinct(spark, sf1)
    Sink.writeTable(df, out)
    Sink.writeTable(df, out)
    assert(spark.read.parquet(out).count() === df.count())
  }

  // S3 LIVE: the write-back twin of TablesSpec's embedded-Derby S1/S2
  // reads (round-10 verdict #6) — a real external store's type system
  // round-trips the narrowing contract, not just parquet's. The source
  // column is first WIDENED to decimal(38,0), the Oracle NUMBER shape
  // the reference migrates from (README.md:471 vs 686), so narrowKeys
  // has real work to do; Derby then materializes the narrowed column
  // as BIGINT and the read-back proves the type survived the store.
  test("S3 live: JDBC write-back to embedded Derby round-trips rows " +
    "and the decimal->bigint narrowing (reference README.md:868-874)") {
    val url = "jdbc:derby:memory:graftsink;create=true"
    val drv = "org.apache.derby.jdbc.EmbeddedDriver"
    val oracleShaped = graft.sources.Tables.load(spark, sf1, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .withColumn("s_suppkey", col("s_suppkey").cast("decimal(38,0)"))
      .withColumn("s_nationkey", col("s_nationkey").cast("decimal(38,0)"))
    val narrowed =
      Sink.narrowKeys(oracleShaped, Seq("s_suppkey", "s_nationkey"))
    assert(narrowed.schema("s_suppkey").dataType === LongType)
    def writeOnce(): Unit = narrowed.write.format("jdbc")
      .option("url", url).option("driver", drv)
      .option("dbtable", "supplier").mode("overwrite").save()
    writeOnce()
    writeOnce() // D3 idempotent re-create against a live store
    val back = new graft.sources.JdbcBinding(url, drv)
      .table(spark, "supplier")
    assert(back.schema("s_suppkey").dataType === LongType &&
      back.schema("s_nationkey").dataType === LongType,
      "narrowed keys must come back from Derby as BIGINT")
    assert(back.count() === narrowed.count())
    assert(back.select(narrowed.columns.map(col): _*)
      .collect().map(_.toString).sorted.toSeq ===
      narrowed.collect().map(_.toString).sorted.toSeq,
      "JDBC write-back multiset diverged from the written frame")
  }
}
