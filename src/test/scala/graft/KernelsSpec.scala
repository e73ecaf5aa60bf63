package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.kernels.{Metrics, TopK}
import graft.model.NodeScore

/** Kernel laws from the reference's unit suites (SURVEY.md §5 tier 1). */
class KernelsSpec extends AnyFunSuite with GraphFixtures {

  private def stateDf(rows: Seq[(Long, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("seed", "node", "score")
  }

  // ---- keepTop laws (test/internal/keepTopTest.cc) ----------------------
  test("topL: L=0 empties the basket") {
    val df = stateDf(Seq((1L, 1L, 1.0), (1L, 2L, 2.0)))
    assert(TopK.pruneTopL(df, 0).count() == 0)
  }

  test("topL: L >= size is a no-op") {
    val df = stateDf(Seq((1L, 1L, 1.0), (1L, 2L, 2.0)))
    val got = baskets(TopK.pruneTopL(df, 5))
    assert(got(1L) == Map(1L -> 1.0, 2L -> 2.0))
  }

  test("topL: exact cut with deterministic ties (score desc, node asc)") {
    val rows = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 3.0), (1L, 13L, 2.0))
    for (fused <- Seq("fused", "bounded", "window")) {
      val got = baskets(TopK.pruneTopL(stateDf(rows), 2, fused))
      assert(got(1L) == Map(10L -> 3.0, 12L -> 3.0), s"fused=$fused")
      val got3 = baskets(TopK.pruneTopL(stateDf(rows), 3, fused))
      assert(got3(1L) == Map(10L -> 3.0, 12L -> 3.0, 13L -> 2.0), s"fused=$fused")
    }
  }

  test("topL: duplicate nodes are summed before the cut (fused mode)") {
    val rows = Seq((1L, 10L, 1.0), (1L, 10L, 1.0), (1L, 11L, 1.5))
    val got = baskets(TopK.pruneTopL(stateDf(rows), 1, "fused"))
    assert(got(1L) == Map(10L -> 2.0))
  }

  test("topL: randomized cut matches local reference law on 500 keys") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (1L, i.toLong, rnd.nextInt(100).toDouble))
    for (fused <- Seq("fused", "bounded", "window"); l <- Seq(1, 50, 499, 500)) {
      val got = baskets(TopK.pruneTopL(stateDf(rows), l, fused))(1L)
      val want = TopK.cut(rows.map(r => NodeScore(r._2, r._3)), l)
        .map(ns => ns.node -> ns.score).toMap
      assert(got == want, s"fused=$fused L=$l")
    }
  }

  // ---- norm1 laws (test/internal/norm1Test.cc) ---------------------------
  test("norm1: shared, disjoint, and empty-key identities") {
    val a = stateDf(Seq((1L, 1L, 1.0), (1L, 2L, 2.0)))
    val b = stateDf(Seq((1L, 1L, 0.5), (1L, 3L, 4.0)))
    // |1.0-0.5| + |2.0-0| + |0-4.0| = 6.5
    assert(Metrics.maxNorm1(a, b) == 6.5)
    assert(Metrics.maxNorm1(a, a) == 0.0)
  }

  test("norm1: per-seed max is taken across seeds") {
    val a = stateDf(Seq((1L, 1L, 1.0), (2L, 1L, 5.0)))
    val b = stateDf(Seq((1L, 1L, 1.0), (2L, 1L, 1.0)))
    assert(Metrics.maxNorm1(a, b) == 4.0)
  }

  // ---- jaccard laws (test/internal/jaccardTest.cc) -----------------------
  test("jaccard: identical -> 1, disjoint -> 0, half -> 1/3, empty-empty -> 1") {
    val a = stateDf(Seq((1L, 1L, 0.0), (1L, 2L, 0.0), (2L, 5L, 0.0), (3L, 7L, 0.0)))
    val b = stateDf(Seq((1L, 1L, 0.0), (1L, 2L, 0.0), (2L, 6L, 0.0), (3L, 7L, 0.0), (3L, 8L, 0.0)))
    val seeds = verticesDf(Seq(1L, 2L, 3L, 4L))
    val got = Metrics.jaccardPerSeed(a.select("seed", "node"), b.select("seed", "node"), Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.5) // |{7}| / |{7} u {7,8}| (pprInternal.h:180-184)
    assert(got(4L) == 1.0) // empty vs empty (pprInternal.h:176-177)
  }

  // ---- kendall laws (include/internal/kendall.h semantics) ---------------
  test("kendall: perfect agreement -> 1, reversal -> -1") {
    assert(Metrics.kendallTauB(Array(1, 2, 3, 4), Array(10, 20, 30, 40)) == 1.0)
    assert(Metrics.kendallTauB(Array(1, 2, 3, 4), Array(40, 30, 20, 10)) == -1.0)
  }

  test("kendall: degenerate cases (kendall.h:179)") {
    // both all-ties -> 1.0
    assert(Metrics.kendallTauB(Array(1, 1, 1), Array(2, 2, 2)) == 1.0)
    // only one all-ties -> 0.0
    assert(Metrics.kendallTauB(Array(1, 1, 1), Array(1, 2, 3)) == 0.0)
    assert(Metrics.kendallTauB(Array(1, 2, 3), Array(7, 7, 7)) == 0.0)
    // empty -> 1.0
    assert(Metrics.kendallTauB(Array.empty[Double], Array.empty[Double]) == 1.0)
  }

  test("kendall: tau-b with ties matches hand computation") {
    // x = [1,2,2,3], y = [1,3,2,4]
    // pairs: (1,2):C (1,2):C (1,3):C (2,2):tx (2,3):C (2,3):C -> c=5,d=0,tx=1,ty=0
    // tau-b = 5 / sqrt(5 * 6)
    val got = Metrics.kendallTauB(Array(1, 2, 2, 3), Array(1, 3, 2, 4))
    assert(math.abs(got - 5.0 / math.sqrt(30.0)) < 1e-12)
  }

  test("kendallPerSeed over a relation") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 1.0, 2.0), (1L, 2.0, 3.0), (2L, 1.0, 5.0), (2L, 2.0, 4.0))
      .toDF("seed", "x", "y")
    val got = Metrics.kendallPerSeed(pairs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> -1.0))
  }
}
