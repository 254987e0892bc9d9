package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Edge inputs for the native expressions: empty strings/arrays, short
  * arrays, nulls — the cases a 100 TB corpus WILL contain somewhere. */
class ExpressionEdgeSpec extends SparkSpec {

  private def one(sqlExpr: String): org.apache.spark.sql.Row = {
    GraftFunctions.registerAll(spark)
    spark.range(1).selectExpr(sqlExpr + " AS v").head()
  }

  test("poly_hash of empty string is 0; null propagates") {
    assert(one("poly_hash('')").getLong(0) === 0L)
    assert(one("poly_hash(CAST(NULL AS STRING))").isNullAt(0))
  }

  test("simhash32 of empty token array is 0 (all counters tie -> bit 0)") {
    assert(one("simhash32(CAST(array() AS ARRAY<BIGINT>))")
      .getLong(0) === 0L)
  }

  test("minhash16 of empty array yields MaxValue sentinels") {
    val sigs = one("minhash16(CAST(array() AS ARRAY<BIGINT>))")
      .getSeq[Long](0)
    assert(sigs.length === 16 && sigs.forall(_ === Long.MaxValue))
  }

  test("shingle_hashes on arrays shorter than n is empty, length n is one") {
    assert(one("shingle_hashes(array('a', 'b'), 3)")
      .getSeq[Long](0).isEmpty)
    val single = one("shingle_hashes(array('a', 'b', 'c'), 3)")
      .getSeq[Long](0)
    assert(single.length === 1)
    assert(single.head === one("poly_hash('a b c')").getLong(0))
  }

  test("vec_dot of empty arrays is 0; mismatched lengths use the overlap") {
    assert(one("vec_dot(CAST(array() AS ARRAY<DOUBLE>), " +
      "CAST(array() AS ARRAY<DOUBLE>))").getDouble(0) === 0.0)
    assert(one("vec_dot(array(2.0D, 3.0D), array(10.0D))")
      .getDouble(0) === 20.0)
  }

  test("winnow_keys matches the HOF formulation on random hash arrays") {
    GraftFunctions.registerAll(spark)
    val pb = 1048576L
    val w = 4
    val rnd = new scala.util.Random(42)
    // random lengths >= w, random hashes with repeats to exercise the
    // rightmost-position tie rule (the HOF form can't run on n < w:
    // sequence(w, n) counts DOWN and element_at goes out of bounds)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(37) + w)(rnd.nextInt(50).toLong + 1))
    }
    val df = spark.createDataFrame(rows).toDF("id", "wn_h")
    val got = df.selectExpr("id", s"winnow_keys(wn_h, $w, $pb) AS k")
    val want = df.selectExpr("id",
      s"""array_distinct(transform(sequence($w, size(wn_h)),
          wn_e -> array_min(transform(sequence(wn_e - ${w - 1}, wn_e),
            wn_i -> element_at(wn_h, wn_i) * $pb
                    + (${pb - 1} - wn_i))))) AS k""")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // n < w emits the empty fingerprint set (the caller filters these,
    // but the expression's own contract must not depend on that)
    val short = spark.createDataFrame(Seq(
      (0L, Seq.empty[Long]), (1L, Seq(5L)), (2L, Seq(5L, 6L, 7L))))
      .toDF("id", "wn_h")
      .selectExpr(s"winnow_keys(wn_h, $w, $pb) AS k")
    assert(short.filter(size(col("k")) =!= 0).count() === 0)
  }

  test("winnow_keys w=1 keeps every position; throws on oversize docs") {
    val all = one(
      "winnow_keys(array(7L, 7L, 3L), 1, 1048576)").getSeq[Long](0)
    // every window is one element -> one key per position, no collapse
    assert(all.length === 3)
    val err = intercept[Exception] {
      one("winnow_keys(transform(sequence(1, 1048576), " +
        "x -> CAST(x AS BIGINT)), 4, 1048576)")
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("exceed pack capacity") ||
      err.getCause != null &&
        err.getCause.getMessage.contains("exceed pack capacity"))
  }

  test("sum_squares over an empty relation returns the zero buffer") {
    GraftFunctions.registerAll(spark)
    val r = spark.range(0).selectExpr("sum_squares(id) AS s").head()
    assert(r.getLong(0) === 0L)
  }
}
