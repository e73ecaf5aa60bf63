package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kernels.TopK
import graft.model.PprConfig

/** MCCompletePathV2 — Monte-Carlo complete-path all-sources PPR
  * (include/mccompletepathv2.h:183-258): estimate per-seed visit frequencies
  * with R random walks per node, then run ONE gather superstep that combines
  * each node's successors' baskets.
  *
  * Reference semantics preserved:
  *  - `iterations` = R = walks per node (mccompletepathv2.h:186)
  *  - every walk counts its origin: basket[origin] = R/R = 1.0 (:124)
  *  - only floor(R*d) walks are actually simulated — walks whose first
  *    teleport would fire before traversing any edge are pre-discounted, and
  *    the first edge is always traversed (:127-132)
  *  - a walk continues while uniform(0,1) <= d (:155) and dies at a node
  *    with no successors (:144-145)
  *  - visit counts are divided by R (:159-160)
  *  - dangling origins get basket {origin: 1.0} (:162-163)
  *  - combine phase (:211-250): final[s] = factor_s * (self 1/factor_s +
  *    sum of successors' baskets), factor_s = d/outdeg(s) (1.0 if dangling),
  *    pruned to L before scaling, truncated to K at the end (:252-256).
  *    The pre-divided self entry makes the final self-score exactly 1.0
  *    before successor contributions land on it.
  *
  * Deliberate deviations (SURVEY.md §2.5 C2-C4, §7.4.4 — the reference MC is
  * itself nondeterministic, seeded from std::random_device at :32-34):
  *  - successor choice: the reference rotates ONE global per-node index
  *    (:149) shared across all walks — order-dependent state that cannot
  *    exist under parallel execution. Here the first hop of walk w from a
  *    node with outdeg o is `w mod o` (exactly the same even spread
  *    round-robin produces) and later hops pick by seeded hash — fully
  *    deterministic and parallelism-invariant.
  *  - the sequential `executionOrder` reuse chain (:37-113, :230-241) is a
  *    single-machine variance trick; all nodes are walked in parallel and
  *    combined uniformly (same estimator expectation).
  *  - the capped-L basket insert during a walk (:152-153, first-seen
  *    priority) becomes a top-L-by-count truncation at aggregation time.
  */
object MonteCarloPpr {

  def run(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long = 42L, maxSteps: Int = 200): DataFrame = {
    val r = cfg.iterations
    val d = cfg.damping

    val adjList = edges.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("dsts"))
      .select(col("src"), col("dsts"), size(col("dsts")).as("outdeg"))
      .persist()

    // ---- phase 1: walk simulation --------------------------------------
    val effective = math.floor(r * d).toLong // floor(R*d), :127-132
    var walkers = vertices
      .join(adjList, vertices("id") === adjList("src"), "inner") // dangling origins never walk
      .select(col("id").as("seed"), col("id").as("cur"))
      .where(lit(effective) > 0)
      .select(col("seed"), col("cur"),
        explode(sequence(lit(0L), lit(math.max(effective - 1, 0L)))).as("walkId"))
      .localCheckpoint(true)

    var visitParts = List.empty[DataFrame]
    var step = 1
    var alive = walkers.count()
    while (alive > 0 && step <= maxSteps) {
      val survivors =
        if (step == 1) walkers // first edge always traversed
        else walkers.where(
          (pmod(xxhash64(col("seed"), col("walkId"), lit(step), lit(salt)), lit(1000000L))
            .cast("double") / 1000000.0) <= d)
      val pick =
        if (step == 1) pmod(col("walkId"), col("outdeg"))
        else pmod(col("walkId") + xxhash64(col("seed"), col("cur"), lit(step), lit(salt)),
          col("outdeg"))
      val moved = survivors.join(adjList, survivors("cur") === adjList("src"))
        .select(col("seed"), col("walkId"),
          element_at(col("dsts"), (pick + 1).cast("int")).as("cur"))
        .localCheckpoint(true)
      // derived from the already-checkpointed `moved`: no extra materialization
      visitParts ::= moved.groupBy(col("seed"), col("cur").as("node"))
        .agg(count(lit(1)).as("visits"))
      walkers = moved
      alive = walkers.count()
      step += 1
    }

    val selfVisits = vertices.select(col("id").as("seed"), col("id").as("node"),
      lit(r.toLong).as("visits")) // origin counted R times (:124, :162-163)
    val allVisits = (selfVisits :: visitParts).reduce(_ union _)
    // visit frequencies, pruned to L per origin (capped-insert deviation)
    val walkBaskets = TopK.pruneTopL(
      allVisits.groupBy(col("seed"), col("node"))
        .agg((sum(col("visits")) / lit(r.toDouble)).as("score")),
      cfg.L, "bounded").localCheckpoint(true)

    // ---- phase 2: one gather superstep over walk baskets (:211-250) -----
    val factor = vertices.join(adjList, vertices("id") === adjList("src"), "left")
      .select(col("id"),
        when(col("outdeg").isNull || col("outdeg") === 0, lit(1.0))
          .otherwise(lit(d) / col("outdeg")).as("factor"))
    val selfRows = factor.select(col("id").as("seed"), col("id").as("node"),
      (lit(1.0) / col("factor")).as("score"))
    val succRows = edges.join(walkBaskets, edges("dst") === walkBaskets("seed"))
      .select(edges("src").as("seed"), col("node"), col("score"))
    val combined = TopK.pruneTopL(selfRows.union(succRows), cfg.L, cfg.topLStrategy)
      .join(factor.withColumnRenamed("id", "seed"), Seq("seed"))
      .select(col("seed"), col("node"), (col("score") * col("factor")).as("score"))

    val result = TopK.topKWindow(combined, cfg.K).localCheckpoint(true)
    adjList.unpersist()
    result
  }
}
