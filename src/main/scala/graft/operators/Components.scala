package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.EdgeSource

/** Connected components, label propagation, and the reference's approximate
  * 2-coloring — all iterative label fixpoints over the UNDIRECTED closure
  * (the reference's BFS walks successors AND predecessors:
  * include/internal/pprInternal.h:76-94).
  */
object Components {

  /** Connected components by iterative min-id propagation: comp(v) starts at
    * v; each superstep takes min(comp(v), min over neighbors comp(u));
    * fixpoint when nothing changes. Exact, deterministic. Returns (id, comp).
    *
    * Scale note: rounds = graph diameter; each round is one join + one
    * hash-agg on the persisted undirected edge relation. For 100TB graphs a
    * large-star/small-star contraction halves round count, but min-id keeps
    * the exact-match contract trivially and each round is shuffle-minimal. */
  def connectedComponents(edges: DataFrame, vertices: DataFrame, maxIterations: Int = 100): DataFrame = {
    val und = EdgeSource.undirected(edges).persist()
    var state = vertices.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIterations) {
      val nbrMin = state.join(und, state("id") === und("src"))
        .groupBy(col("dst").as("id2")).agg(min(col("comp")).as("nbrComp"))
      val next = state.join(nbrMin, state("id") === nbrMin("id2"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .localCheckpoint(true)
      changed = next.where(col("comp") =!= col("prev")).count()
      state = next.select(col("id"), col("comp"))
      i += 1
    }
    und.unpersist()
    state
  }

  /** Synchronous label propagation: label(v) starts at v; each round every
    * vertex adopts the most frequent label among its undirected neighbors
    * (ties -> smallest label; isolated vertices keep their label). Runs a
    * fixed number of rounds — LP on synchronous schedules can oscillate, so
    * the round count IS part of the operator's contract. Deterministic.
    * Returns (id, label). */
  def labelPropagation(edges: DataFrame, vertices: DataFrame, rounds: Int): DataFrame = {
    val und = EdgeSource.undirected(edges).persist()
    var state = vertices.select(col("id"), col("id").as("label")).localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val freq = state.join(und, state("id") === und("src"))
        .groupBy(col("dst").as("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("v")).orderBy(col("cnt").desc, col("label").asc)
      val winner = freq.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("v"), col("label").as("newLabel"))
      state = state.join(winner, state("id") === winner("v"), "left")
        .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
        .localCheckpoint(true)
      i += 1
    }
    und.unpersist()
    state
  }

  /** findPartitions — approximate 2-coloring by BFS over the undirected
    * closure (include/internal/pprInternal.h:30-99): every unvisited root
    * gets color 0 ("partition 1", :58-63); each newly visited neighbor takes
    * the complement of its discoverer's color (:74-75). A proper 2-coloring
    * iff the graph is bipartite, an approximation otherwise (thesis §4.1.1).
    *
    * Distributed formulation with identical results on bipartite graphs:
    * color(v) = parity of the BFS distance from v's component's minimum-id
    * vertex. On non-bipartite graphs a vertex reachable at both parities is
    * assigned its SHORTEST-distance parity (deterministic; the reference's
    * choice depends on hash-map iteration order — its own tests only assert
    * partition SIZES on bipartite/star/complete fixtures). Returns (id, color).
    */
  def twoColoring(edges: DataFrame, vertices: DataFrame, maxIterations: Int = 100): DataFrame = {
    val und = EdgeSource.undirected(edges).persist()
    // dist(v) starts at 0 for every vertex paired with root candidate = own id;
    // propagate (root=min comp id, dist) — equivalent to multi-source BFS from
    // all vertices where only the minimum root survives per vertex.
    var state = vertices.select(col("id"), col("id").as("root"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIterations) {
      val prop = state.join(und, state("id") === und("src"))
        .select(col("dst").as("id"), col("root"), (col("dist") + 1).as("dist"))
      val next = state.select(col("id"), col("root"), col("dist")).union(prop)
        .groupBy(col("id"))
        .agg(min(struct(col("root"), col("dist"))).as("best"))
        .select(col("id"), col("best.root").as("root"), col("best.dist").as("dist"))
        .localCheckpoint(true)
      changed = next.join(state.withColumnsRenamed(Map("root" -> "pRoot", "dist" -> "pDist")), Seq("id"))
        .where(col("root") =!= col("pRoot") || col("dist") =!= col("pDist")).count()
      state = next
      i += 1
    }
    und.unpersist()
    state.select(col("id"), pmod(col("dist"), lit(2L)).cast("int").as("color"))
  }
}
