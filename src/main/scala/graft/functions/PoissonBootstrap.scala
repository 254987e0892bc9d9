package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** All B Poisson-bootstrap replicas in ONE typed aggregate (q240's
  * engine): per input row (event_id, vc) the keyed LCG draws B
  * multiplicities in a tight JVM loop and accumulates the 2B running
  * sums (Σ mlt_b·vc, Σ mlt_b) into a fixed 2B-long buffer.
  *
  * Why an Aggregator instead of 2B expression-level `sum(CASE ...)`
  * columns: 64 aggregate expressions blow past whole-stage codegen's
  * generated-method limits, silently dropping the whole stage to
  * interpreted eval (measured 4.1 s at sf0.1); this buffer is a plain
  * long array updated imperatively (0.5 s), still map-side combinable
  * because a TypedImperativeAggregate partially aggregates like any
  * built-in. The arithmetic is bit-identical to the SQL form: Java
  * `*`/`%` semantics (wrap + sign-of-dividend) match Spark SQL and
  * DuckDB BIGINT ops on these magnitudes, and the ppm thresholds are
  * the quantized Poisson(1) CDF shared with the oracle.
  *
  * Buffer layout: [sv_0..sv_{B-1}, sm_0..sm_{B-1}].
  */
class PoissonBootstrap(b: Int, p0: Long, p1: Long, p2: Long, p3: Long)
    extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](2 * b)

  override def reduce(buf: Array[Long], x: (Long, Long)): Array[Long] = {
    val (eid, vc) = x
    var i = 0
    while (i < b) {
      val u = ((eid * 64 + i) * 1103515245L + 12345L) %
        2147483647L % 1000000L
      val mlt =
        if (u < p0) 0L
        else if (u < p1) 1L
        else if (u < p2) 2L
        else if (u < p3) 3L
        else 4L
      buf(i) += mlt * vc
      buf(b + i) += mlt
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 2 * b) { a(i) += c(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
