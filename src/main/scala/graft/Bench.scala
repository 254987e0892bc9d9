package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every declared query at
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line.
  *
  * Each query is materialized through the `noop` sink rather than
  * `count()` — count lets Catalyst prune the whole projection, which would
  * time a different (cheaper) plan than the one a real consumer runs. A
  * JIT/IO warmup pass runs one query first so the measured numbers aren't
  * dominated by classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      finally spark.catalog.clearCache() // drop per-query cached subframes
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.headOption.foreach(materialize) // warmup: JIT + parquet footer IO
    // min of two runs per query: single-shot timings on a shared box are
    // dominated by GC/scheduler noise in the sub-second tail
    val results = names.map { n =>
      val a = materialize(n)
      val b = materialize(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
