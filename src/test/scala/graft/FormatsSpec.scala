package graft

import java.nio.file.Files

import graft.sources.Tables

/** Source/sink format breadth: the engine's tables survive round trips
  * through every bundled columnar/text format. ORC is bit-exact for all
  * types; CSV/JSON round-trip the integer/string tables exactly when
  * read back with the original schema. */
class FormatsSpec extends SparkSpec {

  private def roundTrip(table: String, format: String): Unit = {
    val out = Files.createTempDirectory(s"graft_$format").toString
    val df = Tables.load(spark, sf1, table)
    Sink.writeFormat(df, format, out)
    val back = spark.read
      .option("header", "true")
      .schema(df.schema)
      .format(format).load(out)
    assert(back.count() === df.count(), s"$format count")
    assert(back.exceptAll(df).count() === 0L, s"$format content")
    assert(df.exceptAll(back).count() === 0L, s"$format content rev")
  }

  test("orc round-trips the full customer table exactly") {
    roundTrip("customer", "orc")
  }

  test("csv round-trips the nation table exactly") {
    roundTrip("nation", "csv")
  }

  test("json round-trips the region table exactly") {
    roundTrip("region", "json")
  }

  test("q271 partition pruning: a one-source read touches only that " +
    "source's directory, and the layout loses nothing") {
    import org.apache.spark.sql.functions._
    val audit = graft.operators.Core.q271PartitionedWrite(spark, sf1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val src = Tables.load(spark, sf1, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum("doc_id").as("ids"), sum("n_chars").as("cs"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(audit === src, "partitioned round trip lost or mangled rows")
    val one = audit.keys.head
    val pruned = spark.read.parquet(graft.Sink.scratch("q271_part"))
      .filter(col("source") === one)
    // inputFiles ignores filters; the pruning contract lives in the
    // scan's PartitionFilters — assert it's pushed to the scan and
    // that the scan then reads exactly that partition's rows
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("source"),
      s"source filter not pushed as a partition filter:\n$plan")
    assert(pruned.count() === audit(one)._1,
      "pruned read row count diverged from the partition census")
  }

  test("q272 merged read aligns the evolved column: legacy rows are " +
    "NULL, evolved rows carry n_chars % 100 exactly") {
    import org.apache.spark.sql.functions._
    graft.operators.Core.q272SchemaEvolution(spark, sf1).collect()
    val back = spark.read.option("mergeSchema", "true")
      .parquet(graft.Sink.scratch("q272_evo"))
    assert(back.schema.fieldNames.contains("quality"))
    val joined = back.join(
      Tables.load(spark, sf1, "documents").select("doc_id", "n_chars"),
      "doc_id")
    assert(joined.filter(col("doc_id") % 2 === 0 &&
      col("quality").isNotNull).count() === 0L,
      "a legacy row acquired a quality value")
    assert(joined.filter(col("doc_id") % 2 === 1 &&
      (col("quality").isNull ||
        col("quality") =!= col("n_chars") % 100)).count() === 0L,
      "an evolved row's quality diverged from its source value")
  }

  test("q291 the CSV round trip loses no rows and re-parses every " +
    "text field to its exact original") {
    import org.apache.spark.sql.functions._
    graft.operators.Core.q291CsvRoundtrip(spark, sf1).collect()
    val src = Tables.load(spark, sf1, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text")
    val back = spark.read.option("header", "true").schema(src.schema)
      .csv(graft.Sink.scratch("q291_csv"))
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0L &&
      src.exceptAll(back).count() === 0L,
      "row-level CSV round trip diverged — quoting or parse loss")
  }
}
