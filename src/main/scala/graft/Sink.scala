package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sink stage: the Cassandra write contract re-expressed as DataFrame
  * contracts over parquet (reference README.md:839, 902-913; SURVEY.md
  * §1.3).
  *
  * The reference's target tables encode three semantics our sink preserves:
  *  - partition key + clustering column (`PRIMARY KEY (pk, ck)`,
  *    README.md:909): rows co-located by pk, ordered by ck within pk →
  *    `repartition(pk).sortWithinPartitions(pk, ck)`. At scale this is ONE
  *    shuffle that doubles as the sink's physical layout — downstream
  *    readers get partition pruning on pk and ordered scans within.
  *  - numeric narrowing (decimal→bigint, README.md:686 vs 471, observable
  *    on read-back README.md:868-874): `narrowKeys`.
  *  - idempotent re-create (`DROP TABLE IF EXISTS` + re-run,
  *    README.md:683): `SaveMode.Overwrite`.
  */
object Sink {

  /** Env-pinned, per-run-unique scratch root for the declared queries
    * that write before they read back (q213/q271/q272/q291/q453/q477).
    * cwd-relative `target/...` paths collide when a Verify races a
    * Bench from the same cwd and scatter directories when a run is
    * launched elsewhere; this roots them at `SPARK_GRAFT_TMP` (default
    * `target`) and isolates concurrent JVMs by pid — two harness
    * processes can never write the same sink path. Within one JVM the
    * path is stable, so a query re-run overwrites its own output
    * (SaveMode.Overwrite), exactly the D3 idempotent-re-create
    * contract. */
  def scratch(name: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_TMP", "target")
    s"$root/graft_run_p${ProcessHandle.current.pid}/$name"
  }

  /** Write with the partition/clustering contract: data is bucketed by pk
    * (`partitionBy` directory layout for pruning) and sorted by (pk, ck)
    * within each task, mirroring Cassandra's partition+clustering order. */
  def writeClustered(
      df: DataFrame, pk: String, ck: String, out: String): Unit =
    df.repartition(col(pk))
      .sortWithinPartitions(col(pk), col(ck))
      .write.mode(SaveMode.Overwrite)
      .parquet(out)

  /** Read-back audit of [[writeClustered]]'s physical contract, from file
    * geometry alone (the parquet `_metadata` hidden column — no ordering
    * assumption about Spark's scan beyond parquet file row order). Returns
    * one row per partition key: its row count `nr`, the count of adjacent
    * ck-order inversions within its file by `_metadata.row_index` (`inv`),
    * and the number of distinct files holding the key (`nf`). A
    * contract-respecting layout has inv=0 and nf=1 for EVERY key; q213
    * pins both under the cross-engine differential, and SinkSpec shows the
    * audit catches deliberately broken layouts. */
  def auditClustered(
      s: SparkSession, path: String, pk: String, ck: String): DataFrame = {
    val rb = s.read.parquet(path).select(
      col(pk), col(ck),
      col("_metadata.file_path").as("_f"),
      col("_metadata.row_index").as("_ri"))
    val wf = Window.partitionBy("_f", pk).orderBy("_ri")
    rb.withColumn("inv",
        when(lag(ck, 1).over(wf) > col(ck), 1L).otherwise(0L))
      .groupBy(pk)
      .agg(count(lit(1)).as("nr"), sum("inv").as("inv"),
        countDistinct("_f").as("nf"))
  }

  /** Plain entity-table write (hr.employees analog). */
  def writeTable(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(out)

  /** Hive-style directory partitioning on the partition key: readers get
    * partition PRUNING (directories skipped entirely, visible as
    * PartitionFilters in the scan) rather than row-group filtering — the
    * right layout when the key is low-cardinality and queries are
    * partition-restricted, exactly the reference's employees_by_dept
    * access pattern (README.md:1005-1022). */
  def writePartitionedTable(df: DataFrame, pk: String, out: String): Unit =
    df.write.partitionBy(pk).mode(SaveMode.Overwrite).parquet(out)

  /** T1: narrow integral key columns to bigint at the sink boundary, as the
    * connector did (decimal(6,0) → bigint). */
  def narrowKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k).cast(LongType)))

  /** Generic format sink (parquet/orc/json/csv — whatever the Spark
    * DataSource registry knows). CSV keeps a header so a schema-less
    * reader still sees column names. */
  def writeFormat(df: DataFrame, format: String, out: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .format(format).save(out)

  /** Hash-bucketed catalog table: the 100 TB answer to repeated fact⋈fact
    * joins on the same key. Both sides bucketed by the join key into the
    * same bucket count join WITHOUT a shuffle — the exchange that
    * dominates a 100 TB sort-merge join simply isn't in the plan
    * (asserted in SinkSpec). Bucketing requires the session catalog
    * (`saveAsTable`); plain-path parquet has no bucket metadata. */
  def writeBucketedTable(
      df: DataFrame, key: String, numBuckets: Int, table: String): Unit = {
    val s = df.sparkSession
    // Overwrite must also mean "overwrite a stale LOCATION": with the
    // default in-memory catalog a fresh session doesn't know about the
    // warehouse directory a previous session's managed table left
    // behind, and saveAsTable would refuse the non-empty path. A real
    // deployment keeps a persistent metastore and never hits this.
    if (!s.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        s.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
    }
    // Pre-shuffle onto the bucket layout (round 12, guide §6):
    // repartition(numBuckets, key) uses the same pmod(murmur3) hash as
    // the bucket spec, so each writer task holds exactly one bucket
    // and the table lands as numBuckets files. Without it every scan
    // task wrote a file per bucket it touched (32 tasks × 16 buckets
    // = 512 tiny files here; at warehouse scale the same pattern is
    // the classic small-files bug). Table contents are identical.
    df.repartition(numBuckets, df(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
