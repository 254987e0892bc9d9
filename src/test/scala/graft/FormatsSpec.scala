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
}
