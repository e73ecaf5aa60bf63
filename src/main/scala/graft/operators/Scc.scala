package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kernels.IterTuning

/** Strongly connected components and the web bow-tie decomposition
  * (Broder et al., "Graph structure in the web", 2000) — the directed-graph
  * structure analysis the reference's undirected toolkit (CC / 2-coloring,
  * include/internal/pprInternal.h:30-99) has no answer to, and the first
  * question asked of any crawl-derived link graph: how big is the CORE, who
  * can reach it (IN), who does it reach (OUT)?
  *
  * Algorithm: iterated forward/backward min-label refinement (the coloring
  * scheme of Orzan 2004 / FW-BW with the minimum vertex as implicit pivot).
  * Every vertex starts in one class; each refinement round computes, WITHIN
  * its current class,
  *
  *   f(v) = min id over {v} ∪ {in-class ancestors of v}   (forward min-label
  *          fixpoint along edges)
  *   b(v) = min id over {v} ∪ {in-class descendants of v} (same along
  *          reversed edges)
  *
  * Vertices with f(v) = b(v) = m are FINALIZED with scc = m: m ⇝ v and
  * v ⇝ m inside the class, so v ∈ SCC(m). This finalization is atomic per
  * SCC — if any member of SCC(m) observes (m, m) then every member does
  * (ancestors/descendants of one member are ancestors/descendants of all) —
  * so no SCC is ever split across rounds. Survivors re-partition by the
  * (f, b) pair — refinement only splits classes and never separates an SCC
  * (an SCC's members always share (f, b)) — and the next round recomputes
  * labels with edges RESTRICTED to same-class endpoints. At a fixpoint a
  * class with uniform (m, m2) forces m = m2 (m is the class minimum and its
  * own min in-class descendant), i.e. the only fixpoint classes are exactly
  * the SCCs; each round finalizes at least the class-minimum's SCC in every
  * class, so the loop terminates.
  *
  * 100-TB shape: per refinement round, two hash joins restrict the edge set
  * to same-class endpoints (the restricted set only SHRINKS as components
  * finalize — like star-contraction's geometric edge decay), then ONE
  * fused min-propagation fixpoint — forward and backward labels ride the
  * same direction-tagged state frame, so each superstep is a single gather
  * exchange with a map-side-combinable min aggregation (a 10^7-in-degree
  * hub's incoming labels partial-aggregate before the shuffle — no hub
  * funnels its in-degree into one sorter). Propagation rounds are bounded
  * by the in-class forward diameter — small for web graphs (effective
  * diameter O(log n)); refinement rounds by the reachability-class
  * structure, which for the web's bow tie is a handful (the giant CORE
  * finalizes as soon as its class minimum lands inside it — on the driver
  * fixture: 6 refinement rounds, ≤23 propagation rounds). The convergence
  * probes are 1-row count actions on checkpointed frames, the audited
  * pattern every other iterative operator here uses.
  */
object Scc {

  /** (id, scc) with scc = minimum vertex id of v's strongly connected
    * component. Self-loops are irrelevant to SCC membership and dropped. */
  def scc(edges: DataFrame, vertices: DataFrame, maxRefineRounds: Int = 30,
      maxPropagateRounds: Int = 500): DataFrame =
    IterTuning.withoutRuntimeFilters(edges.sparkSession) {
      val e0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .dropDuplicates("src", "dst")
        .localCheckpoint(true)
      var active = vertices.select(col("id").cast("long").as("id"),
        lit(0L).as("cf"), lit(0L).as("cb")).localCheckpoint(true)
      var finalized = List.empty[DataFrame]
      var activeCount = active.count()
      var round = 0
      while (activeCount > 0 && round < maxRefineRounds) {
        val a1 = active.select(col("id").as("sid"), col("cf").as("scf"), col("cb").as("scb"))
        val a2 = active.select(col("id").as("did"), col("cf").as("dcf"), col("cb").as("dcb"))
        val eAct = e0
          .join(a1, e0("src") === a1("sid"))
          .join(a2, e0("dst") === a2("did"))
          .where(col("scf") === col("dcf") && col("scb") === col("dcb"))
          .select(col("src"), col("dst"))
          .localCheckpoint(true)
        val cand = biMinPropagate(eAct, active.select(col("id")), maxPropagateRounds)
          .localCheckpoint(true)
        IterativeEngine.freeCheckpointBlocks(eAct)
        finalized ::= cand.where(col("f") === col("b"))
          .select(col("id"), col("f").as("scc")).localCheckpoint(true)
        val prevActive = active
        active = cand.where(col("f") =!= col("b"))
          .select(col("id"), col("f").as("cf"), col("b").as("cb"))
          .localCheckpoint(true)
        IterativeEngine.freeCheckpointBlocks(prevActive)
        IterativeEngine.freeCheckpointBlocks(cand)
        activeCount = active.count()
        round += 1
      }
      require(activeCount == 0,
        s"SCC refinement did not converge within $maxRefineRounds rounds ($activeCount vertices open)")
      IterativeEngine.freeCheckpointBlocks(e0)
      finalized.reduce(_ union _)
    }

  /** Bow-tie decomposition: (id, region) with region in
    * CORE (the largest SCC, ties to the smallest scc id), IN (reaches the
    * core, outside it), OUT (reached from the core, outside it), OTHER
    * (tendrils, tubes, disconnected). IN/OUT are one fused reachability
    * flood seeded at the core representative — legitimate because the core
    * is strongly connected, so reaching ANY member is reaching all. */
  def bowtie(edges: DataFrame, vertices: DataFrame, maxRefineRounds: Int = 30,
      maxPropagateRounds: Int = 500): DataFrame =
    IterTuning.withoutRuntimeFilters(edges.sparkSession) {
      val comp = scc(edges, vertices, maxRefineRounds, maxPropagateRounds)
        .localCheckpoint(true)
      // largest SCC, ties to min id — combinable min-struct argmax, then one
      // 1-row action (the audited driver-scalar pattern)
      val coreRow = comp.groupBy(col("scc")).agg(count(lit(1)).as("n"))
        .agg(min(struct((-col("n")).as("negN"), col("scc").as("s"))).as("best"))
        .head()
      val core = coreRow.getStruct(0).getLong(1)
      val e0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .dropDuplicates("src", "dst")
        .localCheckpoint(true)
      val ids = vertices.select(col("id").cast("long").as("id"))
      // dir 0: flood along edges (descendants of core = OUT ∪ CORE);
      // dir 1: flood along reversed edges (ancestors = IN ∪ CORE)
      val reach = biReachableFrom(e0, ids, core, maxPropagateRounds)
      IterativeEngine.freeCheckpointBlocks(e0)
      comp
        .join(reach, Seq("id"), "left")
        .select(col("id"),
          when(col("scc") === core, "CORE")
            .when(coalesce(col("toCore"), lit(false)), "IN")
            .when(coalesce(col("fromCore"), lit(false)), "OUT")
            .otherwise("OTHER").as("region"))
    }

  /** Direction-tagged edge closure: dir 0 = as given, dir 1 = reversed. */
  private def biEdges(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst"), lit(0).as("dir"))
      .union(e.select(col("dst").as("src"), col("src").as("dst"), lit(1).as("dir")))

  /** Fused forward/backward min-label propagation: lab(v, dir) starts at v;
    * each superstep lab(v, dir) ← min over dir-tagged in-neighbors. One
    * gather exchange per superstep covers BOTH directions; min partial-
    * aggregates map-side. Returns (id, f, b). */
  private def biMinPropagate(e: DataFrame, verts: DataFrame, maxRounds: Int): DataFrame = {
    val eBi = biEdges(e).localCheckpoint(true)
    var state = verts.select(col("id"), explode(array(lit(0), lit(1))).as("dir"))
      .select(col("id"), col("dir"), col("id").as("lab"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxRounds) {
      val nbrMin = state.join(eBi, state("id") === eBi("src") && state("dir") === eBi("dir"))
        .groupBy(eBi("dst").as("id2"), eBi("dir").as("dir2"))
        .agg(min(col("lab")).as("nbrLab"))
      val next = state.join(nbrMin,
          state("id") === nbrMin("id2") && state("dir") === nbrMin("dir2"), "left")
        .select(col("id"), col("dir"),
          least(col("lab"), coalesce(col("nbrLab"), col("lab"))).as("lab"),
          col("lab").as("prev"))
        .localCheckpoint(true)
      changed = next.where(col("lab") =!= col("prev")).count()
      IterativeEngine.freeCheckpointBlocks(state)
      state = next.select(col("id"), col("dir"), col("lab"))
      i += 1
    }
    require(changed == 0, s"min-label propagation still moving after $maxRounds rounds")
    IterativeEngine.freeCheckpointBlocks(eBi)
    state.groupBy(col("id"))
      .agg(min(when(col("dir") === 0, col("lab"))).as("f"),
        min(when(col("dir") === 1, col("lab"))).as("b"))
  }

  /** Fused bidirectional reachability flood from `root`:
    * (id, fromCore BOOLEAN, toCore BOOLEAN). Frontier-based: only newly
    * reached vertices scatter, so per-round work is proportional to the
    * frontier, not the reached set. */
  private def biReachableFrom(e: DataFrame, verts: DataFrame, root: Long,
      maxRounds: Int): DataFrame = {
    val eBi = biEdges(e).localCheckpoint(true)
    // reached set as (id, dir) rows; frontier = rows added last round
    var reached = verts.where(col("id") === root)
      .select(col("id"), explode(array(lit(0), lit(1))).as("dir"))
      .localCheckpoint(true)
    var frontier = reached
    var frontierCount = frontier.count()
    var i = 0
    while (frontierCount > 0 && i < maxRounds) {
      val nxt = frontier.join(eBi, frontier("id") === eBi("src") && frontier("dir") === eBi("dir"))
        .select(eBi("dst").as("id"), eBi("dir").as("dir"))
        .distinct()
      val newFrontier = nxt.join(reached, Seq("id", "dir"), "left_anti").localCheckpoint(true)
      val prevReached = reached
      reached = reached.union(newFrontier).localCheckpoint(true)
      IterativeEngine.freeCheckpointBlocks(prevReached)
      IterativeEngine.freeCheckpointBlocks(frontier)
      frontier = newFrontier
      frontierCount = frontier.count()
      i += 1
    }
    IterativeEngine.freeCheckpointBlocks(eBi)
    verts.join(reached.where(col("dir") === 0).select(col("id"), lit(true).as("fromCore")),
        Seq("id"), "left")
      .join(reached.where(col("dir") === 1).select(col("id"), lit(true).as("toCore")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("fromCore"), lit(false)).as("fromCore"),
        coalesce(col("toCore"), lit(false)).as("toCore"))
  }
}
