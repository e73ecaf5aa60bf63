package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnosis tool (not part of the driver contract): times isolated
  * stages at two parallelism levels to find what refuses to scale. */
object Tune {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"tune-$cores")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(name: String, cores: Int)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"TUNE $name cores=$cores%2d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val graphDir = "/tmp/graft-bench-graph-100000"
    for (cores <- Seq(8, 32)) {
      val spark = session(cores)
      import graft.kernels.TopK
      // 1. pure CPU+shuffle baseline: does Spark scale at all on this box?
      time("baseline-agg", cores) {
        spark.range(200_000_000L, 0, -1, 64)
          .select((col("id") % 1000000).as("k"), (col("id") * 2654435761L).as("v"))
          .groupBy("k").agg(sum("v"), max("v")).count()
      }
      val edges = spark.read.parquet(s"$graphDir/edges").persist()
      val vertices = spark.read.parquet(s"$graphDir/vertices").persist()
      edges.count(); vertices.count()
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val adj = edges.join(outdeg, "src")
        .select(col("src"), col("dst"), (lit(0.85) / col("outdeg")).as("factor"))
        .repartition(64, col("dst")).persist()
      adj.count()
      val teleport = vertices.select(col("id").as("seed"), col("id").as("node"), lit(0.15).as("score"))
      val init = TopK.pruneTopL(
        teleport.union(edges.join(outdeg, "src")
          .select(col("src").as("seed"), col("dst").as("node"), (lit(0.85) / col("outdeg")).as("score"))),
        100, "fused").localCheckpoint(true)
      // 2. gather join alone
      time("gather-join", cores) {
        init.join(adj, init("seed") === adj("dst"))
          .select(col("src").as("seed"), col("node"), (col("score") * col("factor")).as("score"))
          .count()
      }
      // 3. join + fused topL
      time("join+fusedTopL", cores) {
        TopK.pruneTopL(
          init.join(adj, init("seed") === adj("dst"))
            .select(col("src").as("seed"), col("node"), (col("score") * col("factor")).as("score"))
            .union(teleport), 100, "fused").count()
      }
      // 4. join + (seed,node) hash agg only (Tungsten)
      time("join+hashagg", cores) {
        init.join(adj, init("seed") === adj("dst"))
          .select(col("src").as("seed"), col("node"), (col("score") * col("factor")).as("score"))
          .union(teleport)
          .groupBy("seed", "node").agg(sum("score")).count()
      }
      // 5. localCheckpoint of the superstep result
      time("superstep+localCkpt", cores) {
        TopK.pruneTopL(
          init.join(adj, init("seed") === adj("dst"))
            .select(col("src").as("seed"), col("node"), (col("score") * col("factor")).as("score"))
            .union(teleport), 100, "fused").localCheckpoint(true).count()
      }
      // 6. full grank run with per-iteration breakdown
      for (strat <- Seq("fused", "window")) {
        val t0 = System.nanoTime()
        val res = graft.operators.GRank.runWithMetrics(edges, vertices,
          graft.model.PprConfig(K = 50, L = 100, iterations = 3, tolerance = -1,
            topLStrategy = strat))
        res.state.count()
        println(f"TUNE full-grank($strat) cores=$cores%2d ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
          res.history.map(h => s"it${h.iteration}=${h.wallMs}ms/r${h.rows}").mkString(" "))
      }
      spark.stop()
    }
  }
}
