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
  */
object PageRank {

  def run(edges: DataFrame, vertices: DataFrame,
      iterations: Int = 100, damping: Double = 0.85,
      tolerance: Double = 1e-6, quantize: Double = 0.0): DataFrame = {
    val spark = edges.sparkSession
    val n = vertices.count()
    if (n == 0) return vertices.select(col("id").as("node"), lit(0.0).as("score"))

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val adj = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (lit(damping) / col("outdeg")).as("factor"))
      .persist()
    // dangling (outdeg-0) vertex set, computed once — the per-superstep leak
    // aggregate only semi-joins against THIS (usually small) relation
    // instead of the full degree table
    val dangling = vertices.join(outdeg, vertices("id") === outdeg("src"), "left_anti")
      .select(col("id")).persist()

    val init = vertices.select(lit(0L).as("seed"), col("id").as("node"),
      lit(1.0 / n).as("score"))

    // sum that (when quantize > 0) is addend-order-free and oracle-exact
    def leakSum = if (quantize > 0)
      (coalesce(sum(round(col("score") * quantize).cast("long")), lit(0L)) / quantize).as("leak")
    else coalesce(sum(col("score")), lit(0.0)).as("leak")

    def superstep(state: DataFrame, i: Int): DataFrame = {
      // the dangling-mass scalar is folded INTO the plan as a broadcast
      // 1-row aggregate (no driver-side action: each superstep is ONE job;
      // a .head() here would serialize an extra full pass per iteration)
      val leak = state.join(dangling, state("node") === dangling("id"), "left_semi")
        .agg(leakSum)
      val base = vertices.crossJoin(broadcast(leak))
        .select(col("id").as("node"),
          (lit((1.0 - damping) / n) + lit(damping / n) * col("leak")).as("score"))
      val contribs = state.join(adj, state("node") === adj("src"))
        .select(col("dst").as("node"), (col("score") * col("factor")).as("score"))
      base.union(contribs)
        .groupBy(col("node"))
        .agg(graft.kernels.TopK.sumScore(quantize))
        .select(lit(0L).as("seed"), col("node"), col("score"))
    }

    val res = IterativeEngine.run(init, superstep, iterations, tolerance)
    adj.unpersist(); dangling.unpersist()
    res.state.select(col("node"), col("score"))
  }
}
