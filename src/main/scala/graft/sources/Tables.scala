package graft.sources

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source stage: parquet binding for the engine's pluggable source model.
  *
  * The reference loads Oracle tables over JDBC (reference README.md:462-467)
  * and reads back from Cassandra (README.md:867-889); in this zero-egress
  * environment the driver substitutes deterministic parquet tables
  * (TESTDATA.md). The one semantic the source boundary owns is **column-name
  * case normalization**: the reference's single real bug surface is the
  * upper-case Oracle schema failing against Cassandra's lower-case columns
  * (README.md:708), fixed there via `toDF(newNames: _*)` (README.md:733-739).
  * We normalize to lower-case once, here, so every downstream operator can
  * assume lower_snake names.
  *
  * Scale note: `spark.read.parquet` is already a distributed, partitioned,
  * vectorized, predicate-pushdown-capable scan — the parquet analog of the
  * reference's stride-partitioned JDBC read (README.md:549-558). Filters and
  * projections applied by callers reach the scan via Catalyst
  * (PushedFilters/ReadSchema), so at 100 TB the scan reads only the row
  * groups and columns a query needs.
  */
object Tables {

  /** All driver-generated tables (FIXTURES.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings", "events")

  /** Load one table from an sf directory, lower-casing column names. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") {
        // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses
        // outright (PARQUET_TYPE_ILLEGAL). Read nanos as raw longs, then
        // truncate to microsecond timestamps (integer `div` — a double
        // division would lose precision above 2^53 ns). Comparisons only
        // ever use day/hour granularity (FIXTURES.md gotchas), so the
        // ns→µs truncation is invisible downstream.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$name.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    normalize(df)
  }

  /** Lower-case every column name (reference README.md:733-739 analog). */
  def normalize(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase(Locale.ROOT)): _*)

  /** Register every table as a temp view (reference README.md:774-776:
    * `registerTempTable` + SQL-over-views entry point). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Pluggable source stage. The reference's source is Oracle over JDBC
  * (README.md:462-467) with optional stride-partitioned parallel reads
  * (README.md:549-558); this environment binds to parquet. Both bindings
  * present the same contract: lazily-planned, case-normalized tables. */
trait SourceBinding {
  def table(spark: SparkSession, name: String): org.apache.spark.sql.DataFrame
}

/** Parquet binding (the in-environment default; used by every query). */
final class ParquetBinding(dir: String) extends SourceBinding {
  def table(spark: SparkSession, name: String) =
    Tables.load(spark, dir, name)
}

/** JDBC binding modeling the reference's S1/S2 scans: plain single-stream
  * read, or stride-partitioned when a partition column + bounds are given
  * (all-or-none, like Spark's JDBC source itself; bounds set STRIDE, not a
  * filter — every row is returned regardless, reference README.md:539-543).
  * Compile-covered only: no database or driver exists in this zero-egress
  * environment. */
final class JdbcBinding(
    url: String,
    driver: String,
    fetchSize: Int = 1000,
    partition: Option[(String, Long, Long, Int)] = None)
  extends SourceBinding {
  def table(spark: SparkSession, name: String) = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", name)
      .option("fetchsize", fetchSize.toString)
    val reader = partition.fold(base) { case (col, lo, hi, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }
    Tables.normalize(reader.load())
  }
}
