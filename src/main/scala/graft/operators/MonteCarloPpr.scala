package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale design — TWO walk engines behind one draw function (`walkMode`):
  *
  *  - "local" (auto-chosen when the adjacency fits `broadcastEdgeLimit`):
  *    the whole multi-step walk runs INSIDE one mapPartitions pass over the
  *    origin vertices against a broadcast adjacency map — the Spark analog
  *    of the reference's lazy per-node walkNode
  *    (include/mccompletepathv2.h:230-241). ONE job for the entire walk
  *    phase, zero walker rows materialized, zero shuffles; each task emits
  *    already-combined (seed, node, visits) partials (an origin's walks
  *    never leave its task, so no cross-partition merge is needed). This is
  *    the genuine per-partition imperative case where mapPartitions beats
  *    the declarative form: ~64 sequential join stages collapse into one
  *    stage, which also removes the per-stage scheduling latency that
  *    dominated the join path's wall at bench scale (~2.5x measured).
  *  - "join" (auto-chosen above the broadcast limit — the 100-TB path):
  *    per `stepBatch` steps, chain join+project steps lazily with a
  *    per-step persist, then ONE action; visit counts fold into a bounded
  *    accumulator (constant plan depth). Walker VOLUME is bounded by
  *    `walkerBudget`: the walkId range [0, floor(R*d)) is split into chunks
  *    of <= walkerBudget/|origins| ids walked chunk-by-chunk — peak
  *    in-flight rows <= walkerBudget instead of |V|*floor(R*d) (at R=1000
  *    that is 850 rows PER VERTEX).
  *
  * Every draw is a pure function of (seed, ABSOLUTE walkId, step) through
  * the same mix31 mixer, so local, join, chunked and unchunked runs are all
  * bit-identical (test-gated) and the DuckDB oracle replays any of them.
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

  /** A/B gate for the weighted successor draw (default: binary search; the
    * two paths pick IDENTICAL successors — WeightedHubBench measures them
    * against each other on a 10^4-outdeg hub and the numbers land in
    * BASELINE.md). Read at plan/closure build time. */
  private[graft] def linearWeightedPick: Boolean =
    sys.props.getOrElse("graft.wpick",
      sys.env.getOrElse("SPARK_GRAFT_WPICK", "auto")) == "linear"

  /** Weight contract for the walk family (VERDICT r5 next #4): a `weight`
    * edge column switches every successor draw from uniform to
    * weight-proportional via an INTEGER cumulative-weight pick — adjacency
    * lists carry prefix sums cws of the (long) weights in dst order, a draw
    * lands on r ∈ [0, totw) and selects the successor whose interval
    * [cws(i-1), cws(i)) contains r. Exact integer arithmetic end to end, so
    * the DuckDB oracle replays every weighted draw bit-identically (the
    * node2vec-on-the-host-graph corpus case: Coarsen.project output is a
    * drop-in input). Non-positive weights drop; duplicate (src,dst) rows
    * sum their weights. */
  /** Positive-weight (src, dst, w) aggregation — computed ONCE per run and
    * shared by the adjacency build and the weighted combine factor. */
  private[graft] def weightedEw(edges: DataFrame): DataFrame =
    edges.where(col("weight") > 0)
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).cast("long").as("w"))

  private def buildWeightedAdj(ew: DataFrame): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    ew.withColumn("cw", sum(col("w")).over(win))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(struct(col("dst"), col("cw")))).as("pairs"))
      .select(col("src"),
        transform(col("pairs"), p => p.getField("dst")).as("dsts"),
        transform(col("pairs"), p => p.getField("cw")).as("cws"),
        size(col("pairs")).as("outdeg"))
      .withColumn("totw", element_at(col("cws"), -1))
  }

  private[graft] def buildAdj(edges: DataFrame, weighted: Boolean, dedup: Boolean): DataFrame =
    if (weighted) buildWeightedAdj(weightedEw(edges))
    else {
      val e = if (dedup) edges.dropDuplicates("src", "dst") else edges
      e.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("dsts"))
        .select(col("src"), col("dsts"), size(col("dsts")).as("outdeg"))
    }

  /** 1-based successor index for the step-`step` draw, to feed element_at
    * over `dsts`. Columns in scope: seed, walkId, cur (pre-move), and the
    * joined adjacency's outdeg (+ cws/totw when weighted). Step 1 always
    * traverses with the round-robin base `walkId` (run: :127-132). */
  private def pickIdx(step: Int, salt: Long, weighted: Boolean): Column = {
    val base =
      if (step == 1) col("walkId")
      else col("walkId") + mix31(col("seed"), col("cur"), lit(step), pickSalt(salt))
    if (weighted) {
      val r = pmod(base, col("totw"))
      // the answer is 1 + #{i : cws(i) <= r}. For short adjacency rows a
      // linear filter wins; hub rows (outdeg >> 64) get an O(log outdeg)
      // binary search — cws is strictly increasing (positive integer
      // weights), expressed as a fixed 32-step fold over (lo, hi) with
      // invariant cws(lo-1) <= r < cws(hi) (0-based; cws(n-1) = totw > r,
      // so hi = n-1 is valid); converged states are no-ops. Identical
      // result to the linear scan on every row (VERDICT r6 next #2).
      val n = size(col("cws"))
      val linear = size(filter(col("cws"), c => c <= r)) + 1
      if (linearWeightedPick) return linear.cast("int")
      val bsearch = aggregate(
        sequence(lit(1), lit(32)),
        struct(lit(0).as("lo"), (n - 1).as("hi")),
        (acc, _) => {
          val lo = acc.getField("lo")
          val hi = acc.getField("hi")
          val mid = ((lo + hi) / 2).cast("int") // Column `/` is double division; lo+hi >= 0 so the cast truncation is floor
          val goRight = lo < hi && element_at(col("cws"), mid + 1) <= r
          val goLeft = lo < hi && element_at(col("cws"), mid + 1) > r
          struct(when(goRight, mid + 1).otherwise(lo).as("lo"),
            when(goLeft, mid).otherwise(hi).as("hi"))
        },
        acc => acc.getField("lo") + 1)
      when(n > 64, bsearch).otherwise(linear).cast("int")
    } else (pmod(base, col("outdeg")) + 1).cast("int")
  }

  def run(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long = 42L, maxSteps: Int = 200, stepBatch: Int = 8,
      broadcastEdgeLimit: Long = 4000000L,
      walkerBudget: Long = 100000000L, walkMode: String = "auto",
      checkpoint: Option[CheckpointManager] = None, checkpointEvery: Int = 0,
      resume: Boolean = false): DataFrame =
    runWithStats(edges, vertices, cfg, salt, maxSteps, stepBatch,
      broadcastEdgeLimit, walkerBudget, walkMode, checkpoint, checkpointEvery,
      resume)._1

  /** Random-walk CORPUS generator — the walk TRACE rather than the visit
    * counts: one row (seed, walk_id, step, node) per position of every
    * walk, i.e. the DeepWalk/node2vec-(p=q=1) training corpus for graph
    * embeddings, generated with the SAME deterministic draw functions as
    * the MC PPR engine (one mix31 survival draw + one mix31 pick per step,
    * pure functions of (seed, walkId, step) — so traces are reproducible,
    * partitioning-invariant, and SQL-replayable). damping < 1 gives the MC
    * engine's geometric-length walks; damping = 1.0 gives fixed-length
    * DeepWalk walks (every survival draw passes; walks still stop at
    * dangling nodes). Step 0 rows carry the origin.
    *
    * 100-TB shape: the walker frame re-exchanges each step against the
    * src-partitioned adjacency (the join engine's traversal shape) and the
    * trace accumulates as per-step frames unioned at the end — walk count
    * bounds peak rows the same way `walkerBudget` does in [[run]] (cap
    * walksPerNode per job and union jobs for more).
    *
    * A `weight` edge column switches the draws to weight-proportional
    * cumulative-integer picks (see [[buildAdj]]) — walkTrace over
    * Coarsen.project output is the weighted host-graph walk corpus. */
  def walkTrace(edges: DataFrame, vertices: DataFrame, walksPerNode: Int,
      maxSteps: Int, damping: Double = 0.85, salt: Long = 42L): DataFrame = {
    require(walksPerNode > 0, "walksPerNode must be > 0")
    require(maxSteps > 0, "maxSteps must be > 0")
    require(damping > 0 && damping <= 1, "damping must be in (0, 1]")
    val weighted = edges.columns.contains("weight")
    IterTuning.withoutRuntimeFilters(edges.sparkSession) {
      val adjList = buildAdj(edges, weighted, dedup = true).persist()
      var walkers = vertices.join(adjList, vertices("id") === adjList("src"))
        .select(col("id").as("seed"),
          explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("walkId"),
          col("id").as("cur"))
        .localCheckpoint(true)
      // per-step trace frames read the checkpointed walker frames — those
      // blocks stay alive through the final union (bounded by maxSteps)
      var traces = List(walkers.select(col("seed"), col("walkId").as("walk_id"),
        lit(0).as("step"), col("cur").as("node")))
      var alive = walkers.count()
      var step = 1
      while (alive > 0 && step <= maxSteps) {
        val survivors =
          if (step == 1) walkers // first edge always traversed (run: :127-132)
          else walkers.where(
            (mix31(col("seed"), col("walkId"), lit(step), survivalSalt(salt))
              / lit(P.toDouble)) <= damping)
        walkers = survivors.join(adjList, survivors("cur") === adjList("src"))
          .select(col("seed"), col("walkId"),
            element_at(col("dsts"), pickIdx(step, salt, weighted)).as("cur"))
          .localCheckpoint(true)
        traces ::= walkers.select(col("seed"), col("walkId").as("walk_id"),
          lit(step).as("step"), col("cur").as("node"))
        alive = walkers.count()
        step += 1
      }
      adjList.unpersist()
      traces.reduce(_ union _)
    }
  }

  /** Checkpoint/resume (the engine-wide contract, here for the walk
    * engine): the walk-id CHUNK is the natural snapshot unit — with
    * `checkpointEvery` > 0 and a [[CheckpointManager]], every Nth finished
    * chunk saves the merged (seed, node, visits) partial with the usual
    * per-partition lineage manifest; `resume = true` restarts from the
    * latest committed chunk. Every draw is a pure function of the ABSOLUTE
    * walkId, so resumed and straight-through runs are bit-identical
    * (test-gated) — PROVIDED the resumed call passes the same cfg, salt,
    * walkerBudget and graph (chunk boundaries are derived from them).
    * Applies to the join engine's chunk loop; the local engine is a single
    * job with nothing to snapshot (checkpoint args are ignored there). */
  def runWithStats(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long = 42L, maxSteps: Int = 200, stepBatch: Int = 8,
      broadcastEdgeLimit: Long = 4000000L,
      walkerBudget: Long = 100000000L, walkMode: String = "auto",
      checkpoint: Option[CheckpointManager] = None, checkpointEvery: Int = 0,
      resume: Boolean = false): (DataFrame, McWalkStats) =
    IterTuning.withoutRuntimeFilters(edges.sparkSession) {
      runInner(edges, vertices, cfg, salt, maxSteps, stepBatch, broadcastEdgeLimit,
        walkerBudget, walkMode, checkpoint, checkpointEvery, resume)
    }

  private def runInner(edges: DataFrame, vertices: DataFrame, cfg: PprConfig,
      salt: Long, maxSteps: Int, stepBatchRaw: Int, broadcastEdgeLimit: Long,
      walkerBudget: Long, walkMode: String,
      checkpoint: Option[CheckpointManager], checkpointEvery: Int,
      resume: Boolean): (DataFrame, McWalkStats) = {
    require(Set("auto", "local", "join")(walkMode),
      s"walkMode must be auto|local|join, got '$walkMode'")
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
    val weighted = edges.columns.contains("weight")
    // the weighted (src,dst,w) aggregation is shared by the adjacency AND
    // the combine-phase edge factor — persisted so it runs once, not twice
    val ewOpt = if (weighted) Some(weightedEw(edges).persist()) else None
    val adjBase = ewOpt.map(buildWeightedAdj)
      .getOrElse(buildAdj(edges, weighted = false, dedup = false))
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
    val useLocalWalk = walkMode match {
      case "local" =>
        // forced local collects the whole adjacency to the driver — refuse
        // above the broadcast limit rather than risk a driver OOM ("auto"
        // already falls back to the join engine there)
        require(smallAdj, s"walkMode=local forced but the adjacency " +
          s"(> $broadcastEdgeLimit edges) exceeds broadcastEdgeLimit; " +
          "use walkMode=auto or join")
        true
      case "join"  => false
      case _       => smallAdj // "auto": local walk iff the adjacency broadcasts
    }

    if (useLocalWalk && effective > 0) {
      val visitAgg = localWalk(walkOrigins, adjPersisted, effective, d, salt, maxSteps, weighted)
      walkOrigins.unpersist()
      return finishFromVisits(edges, vertices, adjList, adjPersisted, cfg, visitAgg,
        McWalkStats(0L, 0, nOrigins, nOrigins * effective), ewOpt)
    }

    def oneStep(cur: DataFrame, step: Int): DataFrame = {
      val survivors =
        if (step == 1) cur // first edge always traversed (:127-132)
        else cur.where(
          (mix31(col("seed"), col("walkId"), lit(step), survivalSalt(salt))
            / lit(P.toDouble)) <= d)
      survivors.join(adjList, survivors("cur") === adjList("src"))
        .select(col("seed"), col("walkId"),
          element_at(col("dsts"), pickIdx(step, salt, weighted)).as("cur"))
    }

    // Per batch: chain `stepBatch` steps lazily with a per-step persist;
    // the batch-end checkpoint materializes every step once (the persists
    // keep the chain from recomputing), then visit counts PARTIAL-aggregate
    // within the batch. Batch partials merge ONCE per chunk, chunk partials
    // union once at the end (finishFromVisits runs the final (seed,node)
    // sum) — total shuffle volume ~2x the visit count. The r2 design
    // instead re-shuffled a single ever-growing accumulator every batch:
    // at R=1000 x 300k origins that is ~27 re-shuffles of an up-to-600M-row
    // frame, and the un-freed superseded checkpoints exhausted execution
    // memory (measured SparkOutOfMemoryError). Superseded block sets are
    // freed as soon as their successor materializes; live frames are
    // bounded by batches-per-chunk + chunks.
    var chunkAggs = List.empty[DataFrame] // one (seed, node, visits) partial per chunk
    var maxInFlight = 0L
    var nChunks = 0
    var chunkLo = 0L
    var ckptHistory = Vector.empty[IterMetrics]
    if (resume && checkpoint.isDefined) checkpoint.get.latest(spark).foreach { case (i, df) =>
      chunkAggs = List(df.localCheckpoint(true))
      nChunks = i
      chunkLo = math.min(effective, i.toLong * chunkSize)
    }
    while (chunkLo < effective) {
      val tChunk = System.nanoTime()
      val chunkHi = math.min(effective, chunkLo + chunkSize)
      nChunks += 1
      var walkers = walkOrigins
        .select(col("seed"), col("cur"),
          explode(sequence(lit(chunkLo), lit(chunkHi - 1))).as("walkId"))
        .localCheckpoint(true)
      var step = 1
      var alive = walkers.count()
      maxInFlight = math.max(maxInFlight, alive)
      var batchAggs = List.empty[DataFrame]
      while (alive > 0 && step <= maxSteps) {
        val end = math.min(step + stepBatch - 1, maxSteps)
        var stepFrames = List.empty[DataFrame]
        val prevWalkers = walkers
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
          .groupBy(col("seed"), col("node")).agg(sum(col("visits")).as("visits"))
          .localCheckpoint(true) // reads the cached step frames; bounded depth
        batchAggs ::= batchVisits
        stepFrames.foreach(_.unpersist(false))
        IterativeEngine.freeCheckpointBlocks(prevWalkers)
        step = end + 1
      }
      IterativeEngine.freeCheckpointBlocks(walkers) // chunk done: all dead
      val chunkAgg = batchAggs match {
        case Nil         => null
        case one :: Nil  => one
        case many => // merge the <= ceil(maxSteps/stepBatch) batch partials once
          val merged = many.reduce(_ union _)
            .groupBy(col("seed"), col("node")).agg(sum(col("visits")).as("visits"))
            .localCheckpoint(true)
          many.foreach(IterativeEngine.freeCheckpointBlocks)
          merged
      }
      if (chunkAgg != null) chunkAggs ::= chunkAgg
      chunkLo = chunkHi
      if (checkpointEvery > 0 && checkpoint.isDefined && nChunks % checkpointEvery == 0) {
        // fold the partials into ONE frame (also bounds the final union
        // fan-in on long runs), snapshot it as chunk `nChunks`. Nil happens
        // on a walk-free graph (empty adjacency): nothing to snapshot — a
        // resume then correctly restarts from chunk 0, whose work is nil
        val merged = chunkAggs match {
          case Nil        => null
          case one :: Nil => one
          case many =>
            val m = many.reduce(_ union _)
              .groupBy(col("seed"), col("node")).agg(sum(col("visits")).as("visits"))
              .localCheckpoint(true)
            many.foreach(IterativeEngine.freeCheckpointBlocks)
            m
        }
        if (merged != null) {
          chunkAggs = List(merged)
          val met = IterMetrics(nChunks, Double.NaN, merged.count(),
            (System.nanoTime() - tChunk) / 1000000)
          ckptHistory :+= met
          checkpoint.get.save(merged, nChunks, met, ckptHistory)
        }
      }
    }
    walkOrigins.unpersist()
    // raw union of chunk partials — the final (seed,node) sum happens in
    // finishFromVisits together with the origin self-visits
    val visitAgg = chunkAggs match {
      case Nil        => null
      case one :: Nil => one
      case many       => many.reduce(_ union _)
    }
    finishFromVisits(edges, vertices, adjList, adjPersisted, cfg, visitAgg,
      McWalkStats(maxInFlight, nChunks, nOrigins, nOrigins * effective), ewOpt)
  }

  /** The whole walk phase as ONE mapPartitions pass over the origins
    * against a broadcast adjacency map — same draws (mix31Scala is the
    * Column mixer's scalar twin), same per-step semantics as [[oneStep]]:
    * step 1 always traverses with round-robin pick walkId mod outdeg; later
    * steps survive iff mix/P <= d and pick (walkId + mix) mod outdeg; a
    * walk dies at a node with no successors. Emits (seed, node, visits)
    * partials — an origin's walks all live in its task, so the partials
    * are already per-seed-complete. */
  private def localWalk(walkOrigins: DataFrame, adjPersisted: DataFrame,
      effective: Long, d: Double, salt: Long, maxSteps: Int,
      weighted: Boolean): DataFrame = {
    import graft.kernels.Mix.mix31Scala
    val spark = walkOrigins.sparkSession
    import spark.implicits._
    // weighted entries carry the cumulative-weight array next to the dsts
    // (null when unweighted) — the scalar twin of the Column-side pickIdx
    val adjRows =
      (if (weighted) adjPersisted.select(col("src"), col("dsts"), col("cws"))
       else adjPersisted.select(col("src"), col("dsts"))).collect()
    val amap = new java.util.HashMap[Long, (Array[Long], Array[Long])](adjRows.length * 2)
    adjRows.foreach(row => amap.put(row.getLong(0),
      (row.getSeq[Long](1).toArray, if (weighted) row.getSeq[Long](2).toArray else null)))
    val bc = spark.sparkContext.broadcast(amap)
    val sSalt = survivalSalt(salt)
    val pSalt = pickSalt(salt)
    val linearPick = linearWeightedPick // captured driver-side into the closure
    // spread origins over the full task width — walk cost is proportional to
    // origins-per-task, and the upstream origins frame may sit in few
    // partitions (e.g. a 2-file parquet scan)
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val visits = walkOrigins.select(col("seed"))
      .repartition(parts, col("seed")).as[Long].mapPartitions { origins =>
      val adj = bc.value
      origins.flatMap { seed =>
        val mine = scala.collection.mutable.LongMap.empty[Long]
        var w = 0L
        while (w < effective) {
          var cur = seed
          var s = 1
          var alive = true
          while (alive && s <= maxSteps) {
            if (s > 1 && (mix31Scala(seed, w, s, sSalt) / P.toDouble) > d) alive = false
            else {
              val entry = adj.get(cur)
              if (entry == null || entry._1.length == 0) alive = false
              else {
                val (dsts, cws) = entry
                val base = if (s == 1) w else w + mix31Scala(seed, cur, s, pSalt)
                val idx =
                  if (cws == null) (base % dsts.length).toInt
                  else { // cumulative-weight interval containing r:
                    // first i with cws(i) > r via binary search — cws is
                    // strictly increasing, so a found r sits at j with
                    // cws(j) = r <= r (answer j+1) and a miss returns the
                    // insertion point (the first element > r) directly.
                    // Bit-identical to the linear scan, O(log outdeg) per
                    // draw instead of O(outdeg) (VERDICT r6 next #2).
                    val r = base % cws(cws.length - 1)
                    if (linearPick) {
                      var i = 0
                      while (cws(i) <= r) i += 1
                      i
                    } else {
                      val j = java.util.Arrays.binarySearch(cws, r)
                      if (j >= 0) j + 1 else -(j + 1)
                    }
                  }
                cur = dsts(idx)
                mine(cur) = mine.getOrElse(cur, 0L) + 1L
                s += 1
              }
            }
          }
          w += 1
        }
        mine.iterator.map { case (node, n) => (seed, node, n) }
      }
    }.toDF("seed", "node", "visits")
    // materialize before the broadcast can be dropped by downstream actions
    val out = visits.localCheckpoint(true)
    bc.unpersist(false)
    out
  }

  /** Phase 1.5 + 2, shared by both walk engines: fold origin self-visits
    * in, prune to L, then the one gather superstep (:211-250).
    *
    * Weighted combine: the per-node factor d/outdeg generalizes to the
    * PER-EDGE factor d·w(s,t)/Σ_out w(s), so scaling moves from after the
    * prune to inside the gather (for the unweighted case the two orders are
    * equivalent — the factor is a positive per-seed constant, so pre- and
    * post-scale top-L agree; per-edge factors force scale-then-prune). The
    * self entry is exactly 1.0 either way (:124's origin-counts-itself). */
  private def finishFromVisits(edges: DataFrame, vertices: DataFrame,
      adjList: DataFrame, adjPersisted: DataFrame, cfg: PprConfig,
      visitAgg: DataFrame, stats: McWalkStats,
      ewOpt: Option[DataFrame] = None): (DataFrame, McWalkStats) = {
    val r = cfg.iterations
    val d = cfg.damping
    val selfVisits = vertices.select(col("id").as("seed"), col("id").as("node"),
      lit(r.toLong).as("visits")) // origin counted R times (:124, :162-163)
    val allVisits = if (visitAgg == null) selfVisits else selfVisits.union(visitAgg)
    // visit frequencies, pruned to L per origin (capped-insert deviation);
    // scores are exact small rationals (LONG sums / R) — cross-engine stable
    val walkBaskets = TopK.pruneTopL(
      allVisits.groupBy(col("seed"), col("node"))
        .agg((sum(col("visits")) / lit(r.toDouble)).as("score")),
      cfg.L, "bounded").localCheckpoint(true)
    // walkBaskets is materialized: every chunk/batch partial reachable from
    // visitAgg is now superseded — free the blocks instead of waiting for
    // the ContextCleaner (the same pileup class the per-batch fix removed;
    // a many-chunk budget-bound run otherwise keeps nChunks frames cached)
    if (visitAgg != null) IterativeEngine.freeCheckpointBlocks(visitAgg)

    // ---- phase 2: one gather superstep over walk baskets (:211-250) -----
    // combine prune: under the "window" strategy use the ALIGNED shape —
    // one repartition(seed) reused by the (seed,node) sum, the top-L rank
    // AND the final top-K rank (GrankPruneBench measured aligned 10.0 s vs
    // agg-then-window 13.9-14.7 s interleaved on the same gather volume)
    val shufflePartitions = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    def combinePrune(df: DataFrame): DataFrame =
      if (cfg.topLStrategy == "window")
        TopK.pruneTopLAligned(df, cfg.L, shufflePartitions, cfg.quantize)
      else TopK.pruneTopL(df, cfg.L, cfg.topLStrategy, cfg.quantize)
    val combined = if (ewOpt.isDefined) {
      val ew = ewOpt.get // the run-wide persisted (src,dst,w) aggregation
      val ws = ew.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
      val edgeFactor = ew.join(ws, "src")
        .select(col("src"), col("dst"), (lit(d) * col("w") / col("wsum")).as("efactor"))
      val selfRows = vertices.select(col("id").as("seed"), col("id").as("node"),
        lit(1.0).as("score"))
      val succRows = edgeFactor.join(walkBaskets, edgeFactor("dst") === walkBaskets("seed"))
        .select(edgeFactor("src").as("seed"), col("node"),
          (col("score") * col("efactor")).as("score"))
      combinePrune(selfRows.union(succRows))
    } else {
      val factor = vertices.join(adjList, vertices("id") === adjList("src"), "left")
        .select(col("id"),
          when(col("outdeg").isNull || col("outdeg") === 0, lit(1.0))
            .otherwise(lit(d) / col("outdeg")).as("factor"))
      val selfRows = factor.select(col("id").as("seed"), col("id").as("node"),
        (lit(1.0) / col("factor")).as("score"))
      val succRows = edges.join(walkBaskets, edges("dst") === walkBaskets("seed"))
        .select(edges("src").as("seed"), col("node"), col("score"))
      combinePrune(selfRows.union(succRows))
        .join(factor.withColumnRenamed("id", "seed"), Seq("seed"))
        .select(col("seed"), col("node"), (col("score") * col("factor")).as("score"))
    }

    val result = TopK.topKWindow(combined, cfg.K).localCheckpoint(true)
    IterativeEngine.freeCheckpointBlocks(walkBaskets) // result materialized
    adjPersisted.unpersist()
    ewOpt.foreach(_.unpersist())
    (result, stats)
  }
}
