package graft

import org.apache.spark.sql.SparkSession

/** End-to-end proof of the SparkSessionExtensions wiring: builds a
  * session WITH GraftExtensions (the shared test session can't — it
  * exists before any suite runs) and asserts that (a) the injected
  * native functions resolve from SQL, and (b) the injected optimizer
  * rule fires on an edit-distance filter. Exits non-zero on failure.
  *
  * Run: `sbt "runMain graft.ExtensionsSmoke"`.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-smoke")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // (a) injected functions resolve in plain SQL
      val h = spark.sql("SELECT poly_hash('abc') AS h, " +
        "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head()
      require(h.getLong(0) == ((('a' * 31 + 'b') * 31 + 'c') % 1000000007L),
        s"poly_hash mismatch: ${h.getLong(0)}")
      require(h.getDouble(1) == 11.0, s"vec_dot mismatch: ${h.getDouble(1)}")
      // (b) the optimizer rule guards an edit-distance filter (over a
      // parquet-backed table — a literal LocalRelation would be
      // constant-folded away before the check)
      val plan = graft.sources.Tables
        .load(spark, "/root/testdata/sf0.001", "documents")
        .filter("levenshtein(text, 'probe text') <= 5")
        .queryExecution.optimizedPlan.toString
      require(plan.contains("abs(") && plan.contains("length("),
        s"LevenshteinGuard did not fire:\n$plan")
      println("extensions-smoke OK")
    } finally spark.stop()
  }
}
