package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kernels.{IterTuning, TopK}
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
  *    node with outdeg o is `w mod o` (exactly the even spread round-robin
  *    produces) and later hops pick by a seeded deterministic mix — fully
  *    parallelism-invariant. The mixer ([[mix31]]) is two rounds of
  *    quadratic mixing mod the Mersenne prime 2^31-1, chosen over xxhash64
  *    so an external SQL oracle (DuckDB) can replay every walk bit-exactly
  *    (no 64-bit wrap-around multiply exists there).
  *  - the sequential `executionOrder` reuse chain (:37-113, :230-241) is a
  *    single-machine variance trick; all nodes are walked in parallel and
  *    combined uniformly (same estimator expectation).
  *  - the capped-L basket insert during a walk (:152-153, first-seen
  *    priority) becomes a top-L-by-count truncation at aggregation time.
  *
  * Scale design: the walk loop materializes once per `stepBatch` steps, not
  * per step — each batch chains `stepBatch` join+project steps lazily with a
  * per-step persist (every step computed exactly once), then runs ONE
  * action. Driver round-trips are steps/stepBatch, not ~2*steps; visit
  * counts fold into a single bounded accumulator per batch (constant plan
  * depth), never an O(steps)-deep union. Walker VOLUME is bounded by
  * `walkerBudget`: the walkId range [0, floor(R*d)) is split into chunks of
  * <= walkerBudget/|origins| ids and walked chunk-by-chunk into the shared
  * visit accumulator — peak in-flight rows <= walkerBudget instead of
  * |V|*floor(R*d) (at R=1000 that is 850 rows PER VERTEX), bit-identically
  * (every draw is a pure function of seed/absolute-walkId/step).
  */
object MonteCarloPpr {

  import graft.kernels.Mix.{mix31, P}

  /** Walk-phase volume evidence: peak walker rows in flight at any step,
    * walk chunks executed, walking origins, and the UNchunked peak
    * (origins * floor(R*d)) the budget protected against. */
  final case class McWalkStats(maxInFlight: Long, chunks: Int, origins: Long, unchunkedPeak: Long)

  /** Salt constants shared with the DuckDB oracle (OracleSql.mcPpr). */
  private[graft] def survivalSalt(salt: Long): Long = salt * 7919L + 1234567L
  private[graft] def pickSalt(salt: Long): Long = salt * 7919L + 7654321L

  def run(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long = 42L, maxSteps: Int = 200, stepBatch: Int = 8,
      broadcastEdgeLimit: Long = 4000000L,
      walkerBudget: Long = 100000000L): DataFrame =
    runWithStats(edges, vertices, cfg, salt, maxSteps, stepBatch,
      broadcastEdgeLimit, walkerBudget)._1

  def runWithStats(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long = 42L, maxSteps: Int = 200, stepBatch: Int = 8,
      broadcastEdgeLimit: Long = 4000000L,
      walkerBudget: Long = 100000000L): (DataFrame, McWalkStats) =
    IterTuning.withoutRuntimeFilters(edges.sparkSession) {
      runInner(edges, vertices, cfg, salt, maxSteps, stepBatch, broadcastEdgeLimit, walkerBudget)
    }

  private def runInner(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long, maxSteps: Int, stepBatchRaw: Int, broadcastEdgeLimit: Long,
      walkerBudget: Long): (DataFrame, McWalkStats) = {
    // Catalyst cost grows super-linearly with chained join depth: a 16-step
    // lazy chain was measured to take minutes to PLAN where 8 executes in
    // seconds — cap the batch size.
    val stepBatch = math.min(math.max(stepBatchRaw, 1), 10)
    val r = cfg.iterations
    val d = cfg.damping
    val spark = edges.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    // The walk is a traversal: every step joins walkers (keyed by the NEW
    // position) against the adjacency, so the walker side must re-exchange
    // each step — but the adjacency side must not. Below the broadcast
    // limit the whole walk chain becomes broadcast-hash joins (a step batch
    // is ONE narrow stage — the per-step shuffle latency was the dominant
    // cost at small scale); above it, the adjacency is hash-partitioned by
    // src once and reused every step.
    val adjBase = edges.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("dsts"))
      .select(col("src"), col("dsts"), size(col("dsts")).as("outdeg"))
    val smallAdj = edges.count() <= broadcastEdgeLimit
    val adjPersisted =
      (if (smallAdj) adjBase else adjBase.repartition(shufflePartitions, col("src"))).persist()
    val adjList = if (smallAdj) broadcast(adjPersisted) else adjPersisted

    // ---- phase 1: walk simulation --------------------------------------
    val effective = math.floor(r * d).toLong // floor(R*d), :127-132
    // 100-TB walker-volume bound: all |V|*floor(R*d) walks at once is the
    // one shape the single-machine reference never faces (its walkNode is
    // lazy per node, include/mccompletepathv2.h:230-241). The walkId range
    // is split into chunks of <= walkerBudget/|origins| ids, and the walk
    // loop runs once per chunk — every mix31 draw is a pure function of
    // (seed, ABSOLUTE walkId, step), so chunked and unchunked runs are
    // bit-identical; only peak in-flight rows change.
    val walkOrigins = vertices
      .join(adjList, vertices("id") === adjList("src"), "inner") // dangling origins never walk
      .select(col("id").as("seed"), col("id").as("cur"))
      .persist()
    val nOrigins = walkOrigins.count()
    val chunkSize =
      if (walkerBudget <= 0 || nOrigins == 0) math.max(effective, 1L)
      else math.max(1L, math.min(effective, walkerBudget / nOrigins))

    def oneStep(cur: DataFrame, step: Int): DataFrame = {
      val survivors =
        if (step == 1) cur // first edge always traversed (:127-132)
        else cur.where(
          (mix31(col("seed"), col("walkId"), lit(step), survivalSalt(salt))
            / lit(P.toDouble)) <= d)
      val pick =
        if (step == 1) pmod(col("walkId"), col("outdeg"))
        else pmod(col("walkId") + mix31(col("seed"), col("cur"), lit(step), pickSalt(salt)),
          col("outdeg"))
      survivors.join(adjList, survivors("cur") === adjList("src"))
        .select(col("seed"), col("walkId"),
          element_at(col("dsts"), (pick + 1).cast("int")).as("cur"))
    }

    // Per batch: chain `stepBatch` steps lazily with a per-step persist;
    // the batch-end checkpoint materializes every step once (the persists
    // keep the chain from recomputing), then visit counts fold into one
    // bounded accumulator. ~3 jobs per `stepBatch` steps instead of ~2 per
    // step — driver round-trips were the round-1 MC bottleneck.
    var visitAgg: DataFrame = null // (seed, node, visits) — bounded accumulator
    var maxInFlight = 0L
    var nChunks = 0
    var chunkLo = 0L
    while (chunkLo < effective) {
      val chunkHi = math.min(effective, chunkLo + chunkSize)
      nChunks += 1
      var walkers = walkOrigins
        .select(col("seed"), col("cur"),
          explode(sequence(lit(chunkLo), lit(chunkHi - 1))).as("walkId"))
        .localCheckpoint(true)
      var step = 1
      var alive = walkers.count()
      maxInFlight = math.max(maxInFlight, alive)
      while (alive > 0 && step <= maxSteps) {
        val end = math.min(step + stepBatch - 1, maxSteps)
        var stepFrames = List.empty[DataFrame]
        var cur = walkers
        var s = step
        while (s <= end) {
          cur = oneStep(cur, s).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          stepFrames ::= cur
          s += 1
        }
        walkers = cur.localCheckpoint(true) // ONE action materializes the batch
        alive = walkers.count()             // cheap on the checkpointed blocks
        val batchVisits = stepFrames
          .map(_.groupBy(col("seed"), col("cur").as("node")).agg(count(lit(1)).as("visits")))
          .reduce(_ union _)
        visitAgg = (if (visitAgg == null) batchVisits else visitAgg.union(batchVisits))
          .groupBy(col("seed"), col("node")).agg(sum(col("visits")).as("visits"))
          .localCheckpoint(true) // reads the cached step frames; bounded depth
        stepFrames.foreach(_.unpersist(false))
        step = end + 1
      }
      chunkLo = chunkHi
    }
    walkOrigins.unpersist()

    val selfVisits = vertices.select(col("id").as("seed"), col("id").as("node"),
      lit(r.toLong).as("visits")) // origin counted R times (:124, :162-163)
    val allVisits = if (visitAgg == null) selfVisits else selfVisits.union(visitAgg)
    // visit frequencies, pruned to L per origin (capped-insert deviation);
    // scores are exact small rationals (LONG sums / R) — cross-engine stable
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
    val combined = TopK.pruneTopL(selfRows.union(succRows), cfg.L, cfg.topLStrategy, cfg.quantize)
      .join(factor.withColumnRenamed("id", "seed"), Seq("seed"))
      .select(col("seed"), col("node"), (col("score") * col("factor")).as("score"))

    val result = TopK.topKWindow(combined, cfg.K).localCheckpoint(true)
    adjPersisted.unpersist()
    (result, McWalkStats(maxInFlight, nChunks, nOrigins, nOrigins * effective))
  }
}
