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
  *
  * Noise discipline: two full passes over the suite, min per query. The
  * passes are INTERLEAVED across queries (run all once, then all again)
  * instead of back-to-back per query, so one noisy scheduler/GC window on
  * this shared box can't poison both samples of the same query. Cache
  * teardown between queries runs OUTSIDE the timed region — cached
  * subframes are a per-query implementation detail, their drop cost isn't
  * the query's.
  *
  * Optional args name specific queries (local iteration); the driver runs
  * with no args = the full declared suite.
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
      val dt =
        try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      spark.catalog.clearCache() // drop per-query cached subframes, untimed
      dt
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.headOption.foreach(materialize) // warmup: JIT + parquet footer IO
    val pass1 = names.map(n => n -> materialize(n))
    val pass2 = names.map(n => n -> materialize(n)).toMap
    val results = pass1.map { case (n, a) =>
      val b = pass2(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
    java.nio.file.Files.write(out,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The headline line (the full per-query map) goes FIRST: the
    // driver's parser reads the first JSON line of stdout, and round 8
    // recorded parsed=null because the {"query":...} progress lines
    // preceded it. The compact per-query lines still follow (they
    // survive tail-truncation, round-5 lesson) and the full map is also
    // written to bench_full.json.
    println(line)
    results.foreach { case (k, v) =>
      println(s"""{"query":"$k","sec":$v}""")
    }
    spark.stop()
  }
}
