package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One SparkSession for the whole test JVM (suites share it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Graph fixtures from the reference test suites (FIXTURES.md §3) plus
  * local (non-Spark) oracles for independent validation. */
trait GraphFixtures {
  def spark: SparkSession = TestSpark.spark

  def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  def verticesDf(ids: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toDF("id")
  }

  def cycle(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))

  /** leaves -> center (center = 0). */
  def starIn(nLeaves: Int): Seq[(Long, Long)] =
    (1 to nLeaves).map(i => (i.toLong, 0L))

  /** center -> leaves (center = 0). */
  def starOut(nLeaves: Int): Seq[(Long, Long)] =
    (1 to nLeaves).map(i => (0L, i.toLong))

  def complete(n: Int): Seq[(Long, Long)] =
    for { i <- 0 until n; j <- 0 until n if i != j } yield (i.toLong, j.toLong)

  def randomGraph(n: Int, e: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Iterator.continually((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .distinct.take(e).toSeq
  }

  /** Collect a state relation to seed -> node -> score. */
  def baskets(df: DataFrame): Map[Long, Map[Long, Double]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (s, rows) => s -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap }

  /** Plain-Scala exact PPR power iteration — an independent local oracle
    * mirroring include/internal/pprSingleSource.h:29-75 (dangling mass
    * leaks, no redistribution). */
  def localExactPpr(edges: Seq[(Long, Long)], nodes: Seq[Long], source: Long,
      iterations: Int = 100, d: Double = 0.85, tol: Double = 1e-4): Map[Long, Double] = {
    val succ = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var scores = Map(source -> 1.0)
    var it = 0
    var diff = Double.MaxValue
    while (it < iterations && diff >= tol) {
      var next = Map(source -> (1.0 - d))
      for ((node, sc) <- scores; ss <- succ.get(node); s <- ss) {
        next = next.updated(s, next.getOrElse(s, 0.0) + sc * d / ss.size)
      }
      diff = (scores.keySet ++ next.keySet).iterator
        .map(k => math.abs(scores.getOrElse(k, 0.0) - next.getOrElse(k, 0.0))).sum
      scores = next
      it += 1
    }
    scores
  }

  def assertAllClose(a: Map[Long, Map[Long, Double]], b: Map[Long, Map[Long, Double]],
      tol: Double): Unit = {
    assert(a.keySet == b.keySet, s"seed sets differ: ${a.keySet} vs ${b.keySet}")
    for (s <- a.keySet) {
      val (ba, bb) = (a(s), b(s))
      val keys = ba.keySet ++ bb.keySet
      for (k <- keys) {
        val (va, vb) = (ba.getOrElse(k, 0.0), bb.getOrElse(k, 0.0))
        assert(math.abs(va - vb) <= tol,
          f"seed $s node $k: $va%.9f vs $vb%.9f (tol $tol)")
      }
    }
  }
}
