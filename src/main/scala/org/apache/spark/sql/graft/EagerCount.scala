package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Eager localCheckpoint that also RETURNS the row count from the same
  * materialization job.
  *
  * `Dataset.localCheckpoint(eager = true)` materializes by running
  * `rdd.count()` internally and throws the number away; an iterative
  * loop that needs the cardinality for its convergence check (the
  * star-contraction connected-components family) then pays a second
  * count job per round — trivial work, but each extra job costs a full
  * driver scheduling round-trip, and the CC loop runs ~6 of them per
  * query. This helper replays exactly what Dataset.localCheckpoint
  * does (copy the internal rows, mark the RDD for local checkpointing,
  * materialize with count, wrap the RDD back into a LogicalRDD scan)
  * while keeping the count.
  *
  * Lives under org.apache.spark.sql because LogicalRDD / Dataset.ofRows
  * are private[sql]; uses only stable internals the engine's own
  * checkpoint path uses.
  */
object EagerCount {

  /** (checkpointed frame, row count) in ONE job. */
  def localCheckpointWithCount(df: DataFrame): (DataFrame, Long) = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[ClassicSession]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val cnt = rdd.count()
    // fromDataset carries the source plan's partitioning, ordering,
    // stats and constraints into the scan node, exactly like
    // Dataset.localCheckpoint — without it the wrapped RDD defaults to
    // defaultSizeInBytes and the planner downgrades downstream
    // broadcast joins to sort-merge
    val out = Dataset.ofRows(spark,
      LogicalRDD.fromDataset(rdd, ds, isStreaming = false).newInstance())
    (out.toDF(), cnt)
  }
}
