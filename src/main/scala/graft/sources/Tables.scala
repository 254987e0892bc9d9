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

  /** Primary-key columns per table (FIXTURES.md). The reference's JDBC
    * source infers `nullable = false` exactly where Oracle declared NOT
    * NULL (reference README.md:480-493); parquet footers carry no such
    * constraint, so the source boundary re-asserts it here — which lets
    * Catalyst's NullPropagation delete `IsNotNull(key)` filters and skip
    * null-handling branches in join codegen. */
  val keyColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id"))

  /** Load one table from an sf directory, lower-casing column names and
    * re-asserting key non-nullability at the relation (the JDBC-metadata
    * inference of reference README.md:480-493, re-applied over parquet —
    * see [[org.apache.spark.sql.GraftSqlBridge.withNonNullableColumns]]).
    * Nullability is applied to the bare relation FIRST so the rename /
    * timestamp projects built on top reference the non-nullable
    * attributes and propagate the flag to the final schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      // Some testdata generations encode events.ts as parquet
      // TIMESTAMP(NANOS), which Spark 4 refuses outright
      // (PARQUET_TYPE_ILLEGAL) unless nanos are surfaced as raw longs.
      // The flag is a no-op for micros/NTZ encodings, so set it
      // unconditionally and branch on what the scan actually yields.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = applyKeyNullability(
      name, spark.read.parquet(s"$sfDir/$name.parquet"))
    val df =
      if (name == "events") normalizeEventTs(raw)
      else raw
    normalize(df)
  }

  /** Normalize `events.ts` to session-zoned [[TimestampType]] REGARDLESS
    * of how the testdata generation encoded it — the encoding has changed
    * between generations (parquet TIMESTAMP(NANOS) vs plain micros
    * TIMESTAMP_NTZ), and every downstream operator assumes one stable
    * type. Branches on the type the scan yields:
    *   - LONG (nanos surfaced via `nanosAsLong`): integer-`div` truncate
    *     to micros — a double division would lose precision above
    *     2^53 ns — then `timestamp_micros`.
    *   - TIMESTAMP_NTZ (plain micros, no zone): cast to TimestampType.
    *     The session zone is pinned to UTC by every entry point, so the
    *     wall-clock reinterpretation is exact and matches DuckDB's naive
    *     read of the same file.
    *   - TIMESTAMP: already the target type.
    * Comparisons only ever use day/hour granularity (FIXTURES.md), so
    * the ns→µs truncation in the first branch is invisible downstream. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — " +
          "extend Tables.normalizeEventTs for this testdata encoding")
    }
  }

  /** Mark a table's key columns `nullable = false` on the source
    * relation itself — the scan stays a pushdown-capable parquet
    * relation (no RDD round-trip), and null-propagation can drop
    * IsNotNull(key) filters plan-wide. */
  private[graft] def applyKeyNullability(
      name: String, df: DataFrame): DataFrame =
    keyColumns.get(name).fold(df) { keys =>
      org.apache.spark.sql.GraftSqlBridge
        .withNonNullableColumns(df, keys.toSet)
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
  require(fetchSize > 0, s"fetchSize must be positive, got $fetchSize")
  partition.foreach { case (col, lo, hi, n) =>
    require(col.nonEmpty, "partitionColumn must be non-empty")
    require(lo < hi,
      s"lowerBound must be < upperBound, got [$lo, $hi] — the bounds set " +
        "STRIDE, not a filter (reference README.md:539-543)")
    require(n > 0, s"numPartitions must be positive, got $n")
  }

  /** The reader's option map — the testable core (no database needed):
    * the four partition options appear all-or-none, mirroring Spark's
    * own JDBC source contract. */
  def readerOptions(name: String): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "driver" -> driver,
      "dbtable" -> name,
      "fetchsize" -> fetchSize.toString)
    partition.fold(base) { case (col, lo, hi, n) =>
      base ++ Map(
        "partitionColumn" -> col,
        "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString,
        "numPartitions" -> n.toString)
    }
  }

  def table(spark: SparkSession, name: String) =
    Tables.normalize(
      spark.read.format("jdbc").options(readerOptions(name)).load())
}
