package graft

import graft.sources.Tables

/** The engine's SQL entry point (reference E2: registerTempTable +
  * sqlContext.sql) must agree with the DataFrame formulation. The ANSI
  * subset of the declared oracles runs verbatim through spark.sql over
  * registered views and is compared to the DataFrame results. */
class SqlParitySpec extends SparkSpec {

  // oracle SQL that is pure ANSI (no DuckDB list/str functions)
  private val ansiKeys = Seq(
    "q05_point_lookup", "q06_filter_nonkey", "q07_filter_string",
    "q08_partition_scan", "q09_denorm_join", "q10_join_stringkey",
    "q11_self_join", "q12_multiway_join", "q13_count", "q14_distinct",
    "q15_cluster_order", "q21_window_rank", "q22_semi_anti_join",
    "q28_setops", "q39_rollup", "q40_cube", "q44_left_outer",
    "q45_full_outer", "q46_window_frames")

  test("spark.sql over the ANSI oracle subset matches the DataFrame API") {
    Tables.registerAll(spark, sf1)
    ansiKeys.foreach { key =>
      val sql = SparkEntry.oracleSql(key)
      val viaSql = spark.sql(sql)
      val viaDf = SparkEntry.queries(key)(spark, sf1)
      val onlySql = viaSql.exceptAll(viaDf).count()
      val onlyDf = viaDf.exceptAll(viaSql).count()
      assert(onlySql === 0L && onlyDf === 0L,
        s"$key: sql-only=$onlySql df-only=$onlyDf")
    }
  }
}
