package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Sketch

/** HLL sketch: accuracy envelopes, shard mergeability, branch coverage,
  * partitioning invariance (SQL-replayability is driver-gated by
  * q_hll_registers / q_hll_estimate). */
class SketchSpec extends AnyFunSuite with GraphFixtures {

  private def longs(vs: Seq[Long]) = {
    val s = spark
    import s.implicits._
    vs.toDF("v")
  }

  test("hll: estimate within the published error envelope at n >> m") {
    // 5000 distinct over m=256 buckets: sigma ~ 1.04/sqrt(256) = 6.5%
    val n = 5000L
    val vals = longs(0L until n)
    val est = Sketch.approxDistinct(vals, "v", p = 8).head().getDouble(0)
    assert(math.abs(est - n) / n < 0.2, s"est $est vs exact $n")
  }

  test("hll: duplicates do not move the sketch") {
    val base = longs(0L until 1000L)
    val dup = base.union(base).union(base)
    val a = Sketch.hllRegisters(base, "v", p = 8).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val b = Sketch.hllRegisters(dup, "v", p = 8).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("hll: shard registers merge by bucket-wise max to the whole-input sketch") {
    val whole = longs(0L until 3000L)
    val (s1, s2) = (longs(0L until 2000L), longs(1500L until 3000L)) // overlapping shards
    val merged = Sketch.mergeRegisters(
      Sketch.hllRegisters(s1, "v", p = 8), Sketch.hllRegisters(s2, "v", p = 8))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val direct = Sketch.hllRegisters(whole, "v", p = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(merged == direct)
  }

  test("hll: small-range linear-counting branch engages and stays accurate") {
    val n = 40L // << 2.5 * 256, leaves empty buckets -> ln branch
    val row = Sketch.approxDistinct(longs(0L until n), "v", p = 8).head()
    val (est, filled) = (row.getDouble(0), row.getLong(1))
    assert(filled < 256, "expected empty buckets at n=40")
    assert(math.abs(est - n) / n < 0.15, s"linear-counting est $est vs exact $n")
  }

  test("hll: registers and estimate are partitioning-invariant") {
    val vs = (0L until 1200L)
    def regs(parts: Int) = Sketch.hllRegisters(longs(vs).repartition(parts), "v", p = 8)
    assert(regs(1).collect().toSet == regs(13).collect().toSet)
    val e1 = Sketch.hllEstimate(regs(1), 8).head().getDouble(0)
    val e13 = Sketch.hllEstimate(regs(13), 8).head().getDouble(0)
    assert(e1 == e13) // exact-integer harmonic sum: bit-equal, not just close
  }

  test("hll keyed: each group's sketch equals the unkeyed sketch of that group's subset") {
    val s = spark
    import s.implicits._
    // 3 groups with overlapping value ranges and different cardinalities
    val rows = (0L until 3000L).map(v => (v % 3, v / 3)) // (key, value)
    val df = rows.toDF("k", "v")
    val keyed = Sketch.approxDistinctBy(df, "v", Seq("k"), p = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    for (k <- 0L until 3L) {
      val subset = longs(rows.filter(_._1 == k).map(_._2))
      val solo = Sketch.approxDistinct(subset, "v", p = 8).head()
      assert(keyed(k) == ((solo.getDouble(0), solo.getLong(1))), s"group $k")
    }
  }

  // ---- HyperBall (operators/HyperBall: HLL x iterative engine) ----------
  /** local forward-reachability closure (BFS) */
  private def reach(edges: Seq[(Long, Long)], from: Long): Set[Long] = {
    val succ = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var seen = Set(from); var frontier = List(from)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(n => succ.getOrElse(n, Nil)).filterNot(seen)
      seen ++= next; frontier = next.distinct
    }
    seen
  }

  test("hyperball: fixpoint registers equal the plain HLL sketch of the exact reachable set") {
    val es = randomGraph(30, 80, seed = 9)
    val regs = graft.operators.HyperBall.registers(
      edgesDf(es), verticesDf(0L until 30L), rounds = 40, p = 6)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getInt(2))).toSet }
    for (v <- Seq(0L, 7L, 19L)) {
      val expected = Sketch.hllRegisters(longs(reach(es, v).toSeq), "v", p = 6)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(regs(v) == expected, s"vertex $v")
    }
  }

  test("hyperball: ball estimates track exact ball sizes on a path graph") {
    // path 0 -> 1 -> ... -> 9: ball_3(v) has exactly min(10 - v, 4) nodes
    val es = (0L until 9L).map(i => (i, i + 1))
    val est = graft.operators.HyperBall.neighborhood(
      edgesDf(es), verticesDf(0L until 10L), rounds = 3, p = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (v <- 0L until 10L) {
      val exact = math.min(10 - v, 4).toDouble
      assert(math.abs(est(v) - exact) / exact < 0.25, s"v=$v est=${est(v)} exact=$exact")
    }
  }

  test("harmonic: bit-equal to the fixed-order sum over independent per-round neighborhoods") {
    val es = randomGraph(40, 90, seed = 5)
    val (edges, verts) = (edgesDf(es), verticesDf(0L until 40L))
    val rounds = 4
    val got = graft.operators.HyperBall.centralities(edges, verts, rounds, p = 6)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // independent replay: neighborhood() with exactly t rounds is the
    // radius-t ball by definition, then the same fixed-order expression
    // evaluated on the driver
    val perRound: Map[Int, Map[Long, Double]] =
      (1 to rounds).map { t =>
        t -> graft.operators.HyperBall.neighborhood(edges, verts, rounds = t, p = 6)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }.toMap
    // est_0: every ball is {v}; all single-register sketches share the same
    // linear-counting value m*ln(m/(m-1))
    val m = 64.0
    val e0 = math.round(m * math.log(m / (m - 1)) * 1e6) / 1e6
    for (v <- 0L until 40L) {
      val es0 = e0
      var harmonic = 0.0
      var sumDist = 0.0
      var prev = es0
      for (t <- 1 to rounds) {
        val cur = perRound(t)(v)
        harmonic += (cur - prev) / t.toDouble
        sumDist += (cur - prev) * t.toDouble
        prev = cur
      }
      assert(got(v)._1 == math.round(harmonic * 1e6) / 1e6, s"harmonic v=$v")
      assert(got(v)._2 == math.round(sumDist * 1e6) / 1e6, s"sum_dist v=$v")
    }
  }

  test("harmonic: sinks score 0; path head approximates 1 + 1/2 + 1/3") {
    // path 0 -> 1 -> 2 -> 3 with high p: registers are near-exact
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = graft.operators.HyperBall.centralities(
      edgesDf(es), verticesDf(0L until 4L), rounds = 3, p = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) == 0.0) // sink: N(v,t) constant, exact zero
    val expected = 1.0 + 0.5 + 1.0 / 3.0
    assert(math.abs(got(0L) - expected) < 0.05, s"head=${got(0L)}")
  }
}
