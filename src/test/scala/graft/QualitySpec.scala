package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.PprConfig
import graft.operators.{ExactPpr, GRank, Quality}

/** benchmarkAlgorithm harness semantics (benchmarkAlgorithmTest.cc). */
class QualitySpec extends AnyFunSuite with GraphFixtures {

  test("quality: exact-vs-itself comparison scores 1.0 everywhere") {
    // benchmarkAlgorithmTest.cc:66-100 — comparing an algorithm against the
    // oracle it equals gives jaccard = kendall = 1.0
    val es = edgesDf(cycle(6)); val vs = verticesDf(0L until 6L)
    val exact = ExactPpr.run(es, vs, 100, 0.85, 1e-4)
    val m = Quality.evaluate(exact, es, vs, testNodes = 6, strict = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("jaccard average") == 1.0 && m("jaccard min") == 1.0)
    assert(m("kendall average") == 1.0 && m("kendall min") == 1.0)
    assert(m("average map size") == 6.0)
  }

  test("quality: partial precomputed oracle falls back per uncovered seed, same metrics") {
    val es = edgesDf(cycle(6)); val vs = verticesDf(0L until 6L)
    val exact = ExactPpr.run(es, vs, 100, 0.85, 1e-4)
    def metrics(pre: Option[org.apache.spark.sql.DataFrame]) =
      Quality.evaluate(exact, es, vs, testNodes = 6, strict = true,
        precomputedOracle = pre)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = metrics(None)
    // precomputed oracle covering only half the seeds (same params): the
    // uncovered half is computed on the fly instead of require-failing
    val half = exact.where(col("seed") < 3)
    assert(metrics(Some(half)) == full)
    // and a fully-covering precomputed oracle still short-circuits
    assert(metrics(Some(exact)) == full)
  }

  test("quality: zero sampled nodes (strict on edgeless) -> all -1 sentinels") {
    // benchmarkAlgorithmTest.cc:43-53
    val es = edgesDf(Nil); val vs = verticesDf(0L until 4L)
    val approx = ExactPpr.run(es, vs, 10, 0.85, 1e-4)
    val m = Quality.evaluate(approx, es, vs, testNodes = 3, strict = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.toSet == Set(-1.0))
  }

  test("quality: grank at production-ish params reaches thesis-envelope jaccard on a random graph") {
    // thesis §5.2: jaccard 0.90-0.98 for L = 2x K
    val es = randomGraph(40, 400, seed = 17)
    val e = edgesDf(es); val vs = verticesDf(0L until 40L)
    val approx = GRank.run(e, vs, PprConfig(10, 40, 50, tolerance = 1e-6))
    val m = Quality.evaluate(approx, e, vs, testNodes = 10, strict = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("jaccard average") >= 0.85, s"jaccard avg ${m("jaccard average")}")
    assert(m("kendall average") >= 0.7, s"kendall avg ${m("kendall average")}")
  }

  test("quality: sampling is capped at available candidates and seeded-deterministic") {
    val es = edgesDf(cycle(4)); val vs = verticesDf(0L until 4L)
    val exact = ExactPpr.run(es, vs, 50, 0.85, 1e-6)
    val a = Quality.evaluate(exact, es, vs, testNodes = 100, strict = true).collect()
    val b = Quality.evaluate(exact, es, vs, testNodes = 100, strict = true).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }
}
