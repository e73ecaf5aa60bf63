package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kernels.Mix

/** HyperBall (Boldi & Vigna, "In-core computation of geometric centralities
  * with HyperBall", 2013): per-vertex HyperLogLog sketches of the forward
  * ball — ball_{t+1}(v) = {v} ∪ ⋃_{v→w} ball_t(w) — iterated by bucket-wise
  * register max until the fixpoint (registers = sketch of the full forward
  * reachable set). The per-round per-vertex estimates give the neighborhood
  * function N(v, t) ≈ |ball_t(v)|, the standard way to estimate average
  * distance / effective diameter on web-scale graphs where exact all-pairs
  * BFS is impossible.
  *
  * Composition of two existing pieces: functions.Sketch's SQL-replayable
  * HLL register layout (same mixer hash, same bin/ltrim rho idiom — INTEGER
  * state throughout, so every round replays hash-exactly with no grid) and
  * the shared IterativeEngine loop. State is relational (one row per
  * non-empty (vertex, bucket)): |V|·2^p rows at most, merged with MAX —
  * fully map-side combinable, the same property that makes plain HLL
  * shard-mergeable. The engine column mapping is seed=vertex, node=bucket,
  * score=rho, which makes the engine's L1 convergence norm equal the total
  * register movement per round — 0 exactly at the ball fixpoint, so the
  * standard tolerance gate (0.5 on integer registers) stops the loop.
  *
  * 100-TB shape per round: one join of the register table against the
  * src-partitioned adjacency (gather successors' registers) + one
  * max-aggregation exchange on (vertex, bucket). Register rows, not
  * payloads, shuffle.
  */
object HyperBall {

  /** Per-vertex register table of ball_rounds: (id, bucket, rho). */
  def registers(edges: DataFrame, vertices: DataFrame, rounds: Int,
      p: Int = 6, salt: Long = 42L, tolerance: Double = 0.5): DataFrame = {
    require(rounds > 0, "rounds must be > 0")
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    // forward-ball gather joins successors' registers on edge src
    val adj = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("dst")).persist()

    val h = Mix.mix31(col("id"), lit(0L), lit(1L), salt)
    val w = shiftright(h.cast("long"), p)
    val rho = lit(31 - p + 1) - length(ltrim(bin(w), "0"))
    // engine mapping: seed = vertex id, node = bucket, score = rho
    val init = vertices.select(col("id").as("seed"),
      pmod(h, lit(m.toLong)).cast("long").as("node"), rho.cast("double").as("score"))

    def superstep(state: DataFrame, i: Int): DataFrame = {
      val gathered = adj.join(state, adj("dst") === state("seed"))
        .select(adj("src").as("seed"), col("node"), col("score"))
      state.union(gathered)
        .groupBy(col("seed"), col("node"))
        .agg(max(col("score")).as("score"))
    }

    val res = IterativeEngine.run(init, superstep, rounds, tolerance)
    adj.unpersist()
    res.state.select(col("seed").as("id"), col("node").cast("int").as("bucket"),
      col("score").cast("int").as("rho"))
  }

  /** Per-vertex ball-size estimates: (id, est DOUBLE on the 1e-6 grid,
    * filled) — Sketch's shared estimate math, grouped per vertex. */
  def estimates(registers: DataFrame, p: Int): DataFrame =
    graft.functions.Sketch.estimateFrom(registers, p, Seq("id"))

  /** Convenience: ball_rounds size estimate per vertex. */
  def neighborhood(edges: DataFrame, vertices: DataFrame, rounds: Int,
      p: Int = 6, salt: Long = 42L): DataFrame =
    estimates(registers(edges, vertices, rounds, p, salt), p)
}
