package graft

import org.apache.spark.sql.catalyst.expressions.{Abs, And, LessThanOrEqual}
import org.apache.spark.sql.functions._

import graft.plans.LevenshteinGuard

/** The injected optimizer rule: guard shape, idempotence, and the
  * length-bound property that makes the rewrite semantics-preserving. */
class LevenshteinGuardSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    Seq(("kitten", "sitting"), ("abc", "abcdefghij"), ("same", "same"),
      ("", "xyz"), ("longer string here", "short"))
      .toDF("a", "b")
  }

  test("rule prefixes a length-difference guard and is idempotent") {
    val plan = sample.filter(levenshtein(col("a"), col("b")) <= 2)
      .queryExecution.analyzed
    val once = LevenshteinGuard(plan)
    val conds = once.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    assert(conds.nonEmpty)
    val hasGuard = conds.head match {
      case And(LessThanOrEqual(Abs(_, _), _), _) => true
      case _ => false
    }
    assert(hasGuard, s"expected guarded And, got ${conds.head}")
    // fixed-point safe: a second application changes nothing
    assert(LevenshteinGuard(once).fastEquals(once))
  }

  test("rule leaves non-levenshtein filters untouched") {
    val plan = sample.filter(length(col("a")) <= 5)
      .queryExecution.analyzed
    assert(LevenshteinGuard(plan).fastEquals(plan))
  }

  test("length bound is sound: guard never drops a qualifying pair") {
    // the rewrite is correct iff |len(a)-len(b)| <= k is implied by
    // levenshtein(a,b) <= k — assert it on data, both filter forms agree
    val k = 3
    val plain = sample
      .filter(levenshtein(col("a"), col("b")) <= k).collect().toSet
    val guarded = sample
      .filter(abs(length(col("a")) - length(col("b"))) <= k &&
        levenshtein(col("a"), col("b")) <= k).collect().toSet
    assert(plain === guarded)
  }
}
