package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact⋈dim joins whose dim side is too large to
  * broadcast but whose key distribution is hot (SURVEY.md §4.4).
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; explicit
  * salting is the plan-level tool when a known-hot key must be split
  * BEFORE the shuffle (e.g., the null-ish "unknown" key holding 30% of a
  * 100 TB fact table). Mechanics: the fact side gets a per-row salt in
  * [0, n), the dim side is replicated n times, and the join key becomes
  * (key, salt) — the hot key's rows now land on n reducers instead of one.
  * Result is identical to the unsalted join (asserted in SkewSpec);
  * cost is n× the dim shuffle volume, so pick n ≈ hot-key fan-out /
  * average fan-out. */
object Skew {

  /** Inner equi-join with the fact side salted across `numSalts` splits.
    * The salt is derived from a row-local hash (not the key — a key-derived
    * salt would keep the hot key on one reducer). */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      numSalts: Int): DataFrame = {
    val salted = fact.withColumn(
      "_salt", pmod(hash(monotonically_increasing_id()), lit(numSalts)))
    val replicated = dim.withColumn(
      "_salt", explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
