package graft

import org.apache.spark.sql.SparkSession

import graft.model.PprConfig
import graft.operators.MonteCarloPpr

/** Evidence for the MC walker-volume bound (VERDICT r2 missing #2): run the
  * reference's R=1000 walk config on the prebuilt 1.17M-edge bench web graph
  * with a walker budget, and print the measured peak in-flight walker rows
  * vs the |origins| * floor(R*d) peak the unchunked plan would materialize.
  * One `MCSCALE {json}` line; the numbers land in BASELINE.md.
  *
  * Env knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_PAGES (graph dir key),
  * SPARK_GRAFT_MC_R, SPARK_GRAFT_MC_STEPS, SPARK_GRAFT_MC_BUDGET.
  */
object McScaleRun {

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAGES", "300000").toLong
    val r = sys.env.getOrElse("SPARK_GRAFT_MC_R", "1000").toInt
    val maxSteps = sys.env.getOrElse("SPARK_GRAFT_MC_STEPS", "64").toInt
    val budget = sys.env.getOrElse("SPARK_GRAFT_MC_BUDGET", "32000000").toLong
    // default to REAL disk, not tmpfs: this run spills tens of GB of step
    // frames + chunk partials, and tmpfs spill competes with the heap for
    // the same physical RAM (an 80g-heap run was OOM-killed exactly so)
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-spark-mcscale")
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-mc-scale")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val graphDir = s"/tmp/graft-bench-graph-$nPages"
    require(new java.io.File(s"$graphDir/_READY").exists(),
      s"bench graph missing — run graft.Bench once to build $graphDir")
    val edges = spark.read.parquet(s"$graphDir/edges").persist()
    val vertices = spark.read.parquet(s"$graphDir/vertices").persist()
    val (nE, nV) = (edges.count(), vertices.count())

    val t0 = System.nanoTime()
    // walkMode=join (default): this runner evidences the WALKER-VOLUME
    // bound of the 100-TB (non-broadcastable adjacency) path — the
    // local-walk engine that "auto" would pick here materializes no walker
    // rows at all. SPARK_GRAFT_MC_WALKMODE=local records the same config on
    // the local engine for comparison.
    val walkMode = sys.env.getOrElse("SPARK_GRAFT_MC_WALKMODE", "join")
    val (res, stats) = MonteCarloPpr.runWithStats(edges, vertices,
      PprConfig(K = 50, L = 200, iterations = r, topLStrategy = "window"),
      maxSteps = maxSteps, walkerBudget = budget, walkMode = walkMode)
    val rows = res.count()
    val total = (System.nanoTime() - t0) / 1e9
    println(s"""MCSCALE {"nodes":$nV,"edges":$nE,"r":$r,"max_steps":$maxSteps,""" +
      s""""walker_budget":$budget,"origins":${stats.origins},"chunks":${stats.chunks},""" +
      s""""max_in_flight":${stats.maxInFlight},"unchunked_peak":${stats.unchunkedPeak},""" +
      s""""result_rows":$rows,"total_sec":$total}""")
    spark.stop()
  }
}
