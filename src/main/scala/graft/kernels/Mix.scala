package graft.kernels

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic SQL-replayable pseudo-random mixer.
  *
  * Engine-side seeded "randomness" (Monte-Carlo walks, LSH plane components,
  * synthetic corpora, quality-harness sampling) needs two properties at
  * once: parallelism-invariance (a pure function of its inputs — no RNG
  * state) and EXTERNAL REPLAYABILITY, so the DuckDB verification oracle can
  * reproduce the exact same draws. xxhash64 fails the second (64-bit
  * wrap-around multiply; DuckDB errors on BIGINT overflow), so the engine
  * uses two rounds of quadratic mixing modulo the Mersenne prime 2^31-1 —
  * every intermediate stays < 2^62.
  */
object Mix {

  val P = 2147483647L // 2^31 - 1

  /** Uniform value in [0, P): quadratic mix of (a, b, c, salt). */
  def mix31(a: Column, b: Column, c: Column, salt: Long): Column = {
    val h = pmod(
      pmod(a, lit(P)) * 48271L + pmod(b, lit(P)) * 16807L + pmod(c, lit(P)) * 69621L + lit(salt),
      lit(P))
    val h2 = pmod(h * h + h + 12345L, lit(P))
    pmod(h2 * h2 + h2 + 67890L, lit(P))
  }

  /** Uniform double in [0, 1). */
  def uniform(a: Column, b: Column, c: Column, salt: Long): Column =
    mix31(a, b, c, salt) / lit(P.toDouble)

  /** The same mixer as a driver-side scalar (pure Long arithmetic — every
    * intermediate stays < 2^63, exactly as in the Column form), so plane
    * matrices / sampled constants can be materialized ONCE as literals
    * instead of re-mixed per row. */
  def mix31Scala(a: Long, b: Long, c: Long, salt: Long): Long = {
    def pm(x: Long): Long = { val m = x % P; if (m < 0) m + P else m }
    val h = pm(pm(a) * 48271L + pm(b) * 16807L + pm(c) * 69621L + salt)
    val h2 = pm(h * h + h + 12345L)
    pm(h2 * h2 + h2 + 67890L)
  }

  /** The same mixer as a single inline DuckDB SQL expression (nested text;
    * `%` is safe because every engine-side input here is nonnegative). */
  def sql(a: String, b: String, c: String, salt: Long): String = {
    val h = s"((($a) % $P) * 48271 + (($b) % $P) * 16807 + (($c) % $P) * 69621 + $salt) % $P"
    val h2 = s"(($h) * ($h) + ($h) + 12345) % $P"
    s"(($h2) * ($h2) + ($h2) + 67890) % $P"
  }
}
