package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProductD, PolyHash, SimHash32}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions so SQL users get them too.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: O(1) length-difference guard ahead of O(len²)
    // edit-distance filters (see graft.plans.LevenshteinGuard)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinGuard)
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "vec_dot"),
      exprs => DotProductD(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      exprs => PolyHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      exprs => SimHash32(exprs.head)))
  }
}
