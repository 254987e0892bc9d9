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

  test("sum_squares over an empty relation returns the zero buffer") {
    GraftFunctions.registerAll(spark)
    val r = spark.range(0).selectExpr("sum_squares(id) AS s").head()
    assert(r.getLong(0) === 0L)
  }
}
