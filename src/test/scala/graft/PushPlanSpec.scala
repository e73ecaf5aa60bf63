package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Plan-shape gate for the forward-push superstep: from a checkpointed
  * state and the two pre-partitioned loop-invariant frames (degs on node,
  * adj on src), one superstep must plan exactly TWO live exchanges — the
  * state shuffle onto the degree-join key and the (seed, node)
  * re-aggregation after the union. The frontier-adjacency join must reuse
  * the first join's hash(node) output partitioning and adj's cached
  * hash(src) partitioning (no third exchange). Broadcast is disabled so
  * the asserted shape is the large-data one, not the small-fixture one. */
class PushPlanSpec extends AnyFunSuite with GraphFixtures {
  test("push superstep plans exactly two live exchanges (the 100-TB shape)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = edgesDf(randomGraph(30, 150, seed = 31))
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val adj = e.join(outdeg, "src")
        .select(col("src"), col("dst"), (lit(0.85) / col("deg")).as("factor"))
        .repartition(col("src")).persist()
      adj.count()
      val degs = outdeg.select(col("src").as("node"), col("deg"))
        .repartition(col("node")).persist()
      degs.count()
      val state = verticesDf(0L until 30L)
        .select(col("id").as("seed"), col("id").as("node"), lit(0.0).as("score"), lit(1.0).as("residual"))
        .localCheckpoint(true)
      val st = state.join(degs, Seq("node"), "left")
        .select(col("seed"), col("node"), col("score"), col("residual"),
          coalesce(col("deg"), lit(0L)).as("deg"))
      val fires = col("residual") > 0 && col("residual") >= lit(1e-4) * col("deg")
      val kept = st.select(col("seed"), col("node"),
        when(fires, col("score") + lit(0.15) * col("residual")).otherwise(col("score")).as("score"),
        when(fires, lit(0.0)).otherwise(col("residual")).as("residual"))
      val fired = st.where(fires)
      val pushes = fired.join(adj, fired("node") === adj("src"))
        .select(col("seed"), col("dst").as("node"), lit(0.0).as("score"),
          (col("residual") * col("factor")).as("residual"))
      val next = kept.union(pushes).groupBy(col("seed"), col("node"))
        .agg(sum(col("score")).as("score"), sum(col("residual")).as("residual"))
      val plan = next.queryExecution.executedPlan.toString
      val live = plan.split("InMemoryTableScan").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(live).size
      assert(exchanges == 2, s"expected 2 live exchanges, got $exchanges:\n$plan")
      adj.unpersist(); degs.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("weighted walk adjacency plans the minimal TWO exchanges (window shuffle reused by groupBy)") {
    // buildAdj(weighted): the prefix-sum window partitions by src and the
    // collect_list groupBy keys on src — the second must REUSE the first's
    // hash(src) partitioning, or every adjacency build at 100 TB pays a
    // gratuitous |E|-row shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val s = spark
      import s.implicits._
      val e = randomGraph(30, 150, seed = 7)
        .map { case (a, b) => (a, b, 1L + (a + b) % 5) }
        .toDF("src", "dst", "weight")
        .localCheckpoint(true)
      val adj = graft.operators.MonteCarloPpr.buildAdj(e, weighted = true, dedup = false)
      val plan = adj.queryExecution.executedPlan.toString
      val live = plan.split("InMemoryTableScan").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(live).size
      // (src,dst) pre-aggregation + window + final groupBy all key on src
      // (the pair agg keys (src,dst) — hash(src,dst) cannot be reused by
      // the window's hash(src), so the honest minimum is 2)
      assert(exchanges == 2, s"expected 2 live exchanges, got $exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
