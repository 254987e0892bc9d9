package org.apache.spark.sql

import java.util.Locale

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Minimal bridge into the `sql` package for the one capability the public
  * API lacks: re-asserting NOT NULL on source-relation columns.
  *
  * A JDBC relation infers `nullable = false` from database metadata
  * (reference README.md:480-493 shows Oracle NOT NULL columns arriving
  * non-nullable); parquet footers carry no such constraint, so every file
  * column surfaces nullable. `Dataset.to` refuses to narrow nullability,
  * and an RDD round-trip would destroy the pushdown-capable scan — the
  * correct seam is the relation's output attributes themselves, which is
  * exactly where the JDBC source records the inference. Rewriting
  * attribute nullability keeps the plan 100% declarative: pushdown,
  * pruning, and codegen all still see a plain file relation, and
  * Catalyst's null-propagation can now delete IsNotNull(key) filters and
  * null branches in join codegen.
  *
  * Like the JDBC inference it mirrors, this is a TRUST assertion: if a
  * marked column does contain nulls, downstream null-elision is undefined
  * — callers must only mark true key columns.
  */
object GraftSqlBridge {

  /** `df` with the named source columns marked `nullable = false`
    * (case-insensitive; applies to every file/JDBC relation leaf in the
    * plan). */
  def withNonNullableColumns(df: DataFrame, cols: Set[String]): DataFrame = {
    val lower = cols.map(_.toLowerCase(Locale.ROOT))
    val plan: LogicalPlan = df.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation =>
        lr.copy(output = lr.output.map(a =>
          if (lower(a.name.toLowerCase(Locale.ROOT))) a.withNullability(false)
          else a))
    }
    classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession], plan)
  }
}
