package graft.functions

/** Engine-portable hashing expression builders.
  *
  * The dedup/fingerprint operators need token hashes that DuckDB can
  * reproduce exactly for the driver's differential compare — Spark's
  * `xxhash64`/`hash` and DuckDB's `hash` are different functions, so the
  * portable path is a polynomial character fold computed with the SAME
  * arithmetic (int64, mod 1e9+7) on both engines:
  *
  *   h(s) = fold(c in s) { h = (h * 31 + ascii(c)) mod 1e9+7 }
  *
  * All testdata text is ASCII (verified), so `ascii()` agrees between
  * engines. At production scale the operators take the hash expression as a
  * parameter — swap in `xxhash64(col)` (one codegen'd call per row instead
  * of a per-char fold) when a differential oracle isn't needed; the
  * LSH/banding math is hash-agnostic.
  *
  * Both dialects are generated here, side by side, so they cannot drift.
  */
object PortableHash {

  val Mod = 1000000007L
  val MersennePrime = 2147483647L // 2^31-1, modulus for minhash permutes

  /** Spark SQL: hash a string-valued expression. `filter(... c <> '')`
    * guards Spark's regex split emitting a trailing "" element, which
    * DuckDB's string_split never produces. */
  def sparkCharFold(strExpr: String): String =
    s"aggregate(filter(split($strExpr, ''), pc_c -> pc_c <> ''), 0L, " +
      s"(pc_a, pc_c) -> (pc_a * 31 + ascii(pc_c)) % $Mod)"

  /** DuckDB: same fold. `list_prepend(0, ...)` supplies the init value
    * (list_reduce has no init parameter and errors on empty lists). */
  def duckCharFold(strExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($strExpr, ''), " +
      s"pc_c -> CAST(ascii(pc_c) AS BIGINT))), " +
      s"(pc_a, pc_c) -> (pc_a * 31 + pc_c) % $Mod)"

  /** Minhash permutation params: a_i, b_i derived from LCG constants so
    * both engines can inline them as literals. */
  def minhashA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MersennePrime
  def minhashB(i: Int): Long = (214013L * (i + 1) + 2531011L) % MersennePrime
}
