package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.PprConfig
import graft.operators.{GRank, Quality}
import graft.sources.EdgeSource

/** End-to-end parity on the reference's own dataset (src/main.cc:30-76) —
  * SLOW (minutes at local[4]): gated behind SPARK_GRAFT_EAT=1; run manually
  * or via EatRun (whose measured numbers live in BASELINE.md). The
  * assertion encodes the thesis §5.2 quality envelope: GRank at production
  * params reaches Jaccard >= 0.90 vs the exact oracle on the Eat graph. */
class EatSpec extends AnyFunSuite with GraphFixtures {

  test("Eat graph: grank(K=50,L=100,iter=30,tol=1e-4) reaches thesis-envelope jaccard") {
    assume(sys.env.get("SPARK_GRAFT_EAT").contains("1"),
      "slow end-to-end run; enable with SPARK_GRAFT_EAT=1")
    val edges = EdgeSource.readCsv(spark, "/root/reference/example.txt").persist()
    val vertices = EdgeSource.vertices(edges).persist()
    assert(vertices.count() == 23132L) // thesis §5.1 dataset table
    assert(edges.count() == 312310L)   // unique edges after import dedup

    val grank = GRank.run(edges, vertices,
      PprConfig(K = 50, L = 100, iterations = 30, tolerance = 1e-4,
        topLStrategy = "window"))
    val q = Quality.evaluate(grank, edges, vertices, testNodes = 200, strict = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q("jaccard average") >= 0.90, s"quality: $q") // thesis §5.2 envelope
    edges.unpersist(); vertices.unpersist()
  }
}
