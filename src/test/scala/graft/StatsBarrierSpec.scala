package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.StatsBarrier.statsBarrier

/** Regression spec for the Spark 4 localCheckpoint stats-carry pathology
  * (StatsBarrier's Scaladoc; root-caused in round 5 via jstack —
  * BigInteger.multiplyToomCook3 under rewriteStatsAndConstraints). The
  * assertions are on the carried statistics' BIT LENGTH, which is
  * deterministic, not on wall-clock. */
class StatsBarrierSpec extends AnyFunSuite with GraphFixtures {

  private def sizeBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger.bitLength()

  /** One refinement-shaped round: next state joins THREE descendants of the
    * previous state (the Scc shape: edges ⋈ active ⋈ active feeding the
    * gather) — visitJoin multiplies the carried sizes, so the carried
    * BigInt's bit-length roughly triples per cut. */
  private def round(state: DataFrame): DataFrame = {
    val a = state.select(col("id").as("ida"), col("v").as("va"))
    val b = state.select(col("id").as("idb"), col("v").as("vb"))
    state.join(a, col("id") === col("ida")).join(b, col("id") === col("idb"))
      .select(col("id"), (col("v") + col("va") + col("vb")).as("v"))
  }

  test("localCheckpoint carries join-product stats; the barrier resets them") {
    val s = spark
    import s.implicits._
    var plain = (0L until 50L).map(i => (i, i)).toDF("id", "v").localCheckpoint(true)
    var barred = statsBarrier(plain)
    val bits0 = sizeBits(plain)
    for (_ <- 1 to 6) {
      plain = round(plain).localCheckpoint(true)
      barred = statsBarrier(round(barred).localCheckpoint(true))
    }
    val plainBits = sizeBits(plain)
    val barredBits = sizeBits(barred)
    // un-barriered: the carried product compounds (strictly more bits than
    // the seed frame — on this shape it roughly doubles per cut)
    assert(plainBits > 4 * bits0,
      s"expected compounding stats without the barrier: $bits0 -> $plainBits")
    // barriered: stays at the default estimate's size (<= 64-bit Long)
    assert(barredBits <= 64, s"barrier failed to reset stats: $barredBits bits")
  }

  test("barrier preserves rows, schema, and values") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i, s"row$i")).toDF("id", "txt")
      .repartition(5).localCheckpoint(true)
    val barred = statsBarrier(df)
    assert(barred.schema == df.schema)
    assert(barred.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .sameElements(df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)))
  }
}
