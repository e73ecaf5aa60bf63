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

  /** Per-vertex register table of ball_rounds: (id, bucket, rho).
    *
    * Choosing p: each per-vertex ball estimate carries HLL's ±1.04/√2^p
    * standard error (p=6 → ±13%, p=8 → ±6.5%, p=10 → ±3.25% — see
    * Sketch.hllRegisters and the measured sweep in BASELINE.md §HLL), and
    * state is |V|·2^p register rows — the p knob trades one directly for
    * the other (Boldi & Vigna run p=4..12 at web scale for this reason). */
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

  /** ONE register sweep shared by the whole HyperBall family (r7
    * optimization, the scc+bowtie composition pattern): the per-round
    * estimate frames est_0..est_rounds as (id, est, filled), each
    * localCheckpointed. `sweep(...).last` equals [[neighborhood]] (the
    * register fixpoint is reached at or before `rounds`, so running the
    * loop without the engine's early-stop probe yields the same registers
    * and hence the same estimates — test-gated), and
    * [[centralitiesFrom]] / [[neighborhoodFunctionFrom]] consume the same
    * frames — a caller wanting all three artifacts pays for one sweep
    * instead of three. */
  def sweep(edges: DataFrame, vertices: DataFrame, rounds: Int,
      p: Int = 6, salt: Long = 42L): Seq[DataFrame] =
    graft.kernels.IterTuning.withoutRuntimeFilters(edges.sparkSession) {
      estimatesPerRound(edges, vertices, rounds, p, salt)
    }

  /** [[centralities]] over a precomputed [[sweep]] (est_0..est_rounds). */
  def centralitiesFrom(ests: Seq[DataFrame], rounds: Int): DataFrame = {
    require(ests.length == rounds + 1, s"sweep must carry ${rounds + 1} frames")
    val joined = ests.zipWithIndex
      .map { case (df, t) => df.select(col("id"), col("est").as(s"est_$t")) }
      .reduce(_.join(_, Seq("id")))
    val harmonic = (1 to rounds)
      .map(t => (col(s"est_$t") - col(s"est_${t - 1}")) / lit(t.toDouble))
      .reduce(_ + _)
    val sumDist = (1 to rounds)
      .map(t => (col(s"est_$t") - col(s"est_${t - 1}")) * lit(t.toDouble))
      .reduce(_ + _)
    joined.select(col("id"),
      (round(harmonic * lit(1e6)) / 1e6).as("harmonic"),
      (round(sumDist * lit(1e6)) / 1e6).as("sum_dist"))
  }

  /** [[neighborhoodFunction]] over a precomputed [[sweep]]. */
  def neighborhoodFunctionFrom(ests: Seq[DataFrame], rounds: Int): DataFrame = {
    require(ests.length == rounds + 1, s"sweep must carry ${rounds + 1} frames")
    val nf = ests.zipWithIndex.map { case (df, t) =>
      df.agg((coalesce(sum(round(col("est") * 1e6).cast("long")), lit(0L)) / 1e6)
        .as("pairs")).select(lit(t).as("t"), col("pairs"))
    }.reduce(_ union _)
    val pmax = nf.where(col("t") === rounds).select(col("pairs").as("pmax"))
    nf.crossJoin(broadcast(pmax))
      .select(col("t"), col("pairs"),
        (round(col("pairs") / col("pmax") * lit(1e6)) / 1e6).as("frac"))
  }

  /** Geometric centralities from the per-round neighborhood function — the
    * actual purpose of HyperBall (Boldi & Vigna 2013, §4): with
    * N(v, t) = |ball_t(v)| estimated per round,
    *
    *   harmonic(v) = Σ_{t=1..rounds} (N(v,t) − N(v,t−1)) / t
    *   sum_dist(v) = Σ_{t=1..rounds} (N(v,t) − N(v,t−1)) · t   (closeness
    *                 denominator)
    *
    * over distances along the EDGE DIRECTION GIVEN — pass reversed edges
    * for the standard incoming-paths harmonic centrality. `rounds` is part
    * of the contract (balls truncate at that radius), matching how a
    * bounded HyperBall sweep reports centralities at web scale.
    *
    * Determinism: each N(v,t) is the 1e-6-grid HLL estimate (integer
    * registers, one float division — Sketch.estimateFrom); the two sums
    * are FIXED-ORDER expression trees over the per-round columns (t
    * ascending), so every IEEE operation replays bit-identically in the
    * DuckDB oracle — no aggregation-order nondeterminism anywhere.
    *
    * 100-TB shape: the register loop is [[registers]]'s (gather + max-merge,
    * |V|·2^p rows); each per-round estimate is one map-side-combinable
    * aggregation; the final assembly is `rounds` narrow joins on id. */
  def centralities(edges: DataFrame, vertices: DataFrame, rounds: Int,
      p: Int = 6, salt: Long = 42L): DataFrame =
    centralitiesFrom(sweep(edges, vertices, rounds, p, salt), rounds)

  /** Global neighborhood function and (discrete) effective diameter — the
    * OTHER HyperBall headline (Boldi & Vigna 2013 §1): pairs(t) =
    * Σ_v N(v, t) estimates the number of ordered pairs within distance t;
    * the table (t, pairs, frac = pairs(t)/pairs(rounds)) makes the
    * alpha-effective diameter (min t with frac ≥ alpha) readable off the
    * result. All sums are order-free 1e-6-grid integer sums and the one
    * division per row has exact grid operands — the DuckDB oracle replays
    * the table hash-exactly. */
  def neighborhoodFunction(edges: DataFrame, vertices: DataFrame, rounds: Int,
      p: Int = 6, salt: Long = 42L): DataFrame =
    neighborhoodFunctionFrom(sweep(edges, vertices, rounds, p, salt), rounds)

  /** The per-round ball-size estimate frames est_0..est_rounds as
    * (id, est, filled), each materialized (small: |V| rows) so the register
    * state backing it can be freed as the ball advances. */
  private def estimatesPerRound(edges: DataFrame, vertices: DataFrame,
      rounds: Int, p: Int, salt: Long): Seq[DataFrame] = {
    require(rounds > 0, "rounds must be > 0")
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    val adj = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("dst")).persist()
    val h = Mix.mix31(col("id"), lit(0L), lit(1L), salt)
    val w = shiftright(h.cast("long"), p)
    val rho = lit(31 - p + 1) - length(ltrim(bin(w), "0"))
    var state = vertices.select(col("id"),
      pmod(h, lit(m.toLong)).cast("long").as("bucket"), rho.cast("int").as("rho"))
      .localCheckpoint(true)
    def est(): DataFrame =
      graft.functions.Sketch.estimateFrom(state, p, Seq("id"))
        .localCheckpoint(true)
    // EXACT fixpoint probe (r7): registers only ever GROW under max-merge
    // (rho per (id, bucket) is non-decreasing; rows are only added), so
    // the state is unchanged iff (row count, Σrho) is unchanged — and a
    // round that changes nothing proves the ball fixpoint, after which
    // every further round is the identity. Stagnant tail rounds are
    // skipped and their est frames reuse the fixpoint frame (identical
    // values — the unrolled oracle replays the skipped rounds as no-ops).
    def fingerprint(): (Long, Long) = {
      val r = state.agg(count(lit(1)), coalesce(sum(col("rho")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint()
    val out = Seq.newBuilder[DataFrame]
    var last = est()
    out += last
    var t = 1
    var fixed = false
    while (t <= rounds && !fixed) {
      val gathered = adj.join(state, adj("dst") === state("id"))
        .select(adj("src").as("id"), col("bucket"), col("rho"))
      val prev = state
      state = state.union(gathered)
        .groupBy(col("id"), col("bucket"))
        .agg(max(col("rho")).as("rho"))
        .localCheckpoint(true)
      IterativeEngine.freeCheckpointBlocks(prev)
      val nfp = fingerprint()
      if (nfp == fp) fixed = true // est unchanged too — reuse `last`
      else { fp = nfp; last = est() }
      out += last
      t += 1
    }
    while (t <= rounds) { out += last; t += 1 } // fixpoint tail: identity rounds
    IterativeEngine.freeCheckpointBlocks(state)
    adj.unpersist()
    out.result()
  }
}
