package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.PprConfig
import graft.operators.MonteCarloPpr
import graft.sources.EdgeSource

/** Evidence main for the weighted-draw binary search (VERDICT r6 next #2):
  * a weighted HUB graph — one host H with out-degree `hubOutdeg` whose
  * successors all link straight back to H — so every second walk step draws
  * a successor from a 10^4-interval cumulative-weight array. Runs the MC
  * visit engine (scalar pick, local walk) and the walk-trace engine
  * (Column pick) under both draw implementations (linear scan vs binary
  * search; identical successors — asserted here on the trace) and prints
  * one line per leg. Numbers land in BASELINE.md §WHUB.
  *
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_HUB_OUTDEG (default 10000),
  * SPARK_GRAFT_HUB_WALKS (R for the MC engine, default 20).
  */
object WeightedHubBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outdeg = sys.env.getOrElse("SPARK_GRAFT_HUB_OUTDEG", "10000").toLong
    val walks = sys.env.getOrElse("SPARK_GRAFT_HUB_WALKS", "20").toInt
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-whub-bench")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hub = 0L
    // H -> s_i with weight (i mod 10) + 1; s_i -> H with weight 1: every
    // walk alternates H, s_i, H, ... so half of all steps draw from H's
    // outdeg-wide cumulative-weight array (the weighted-hub worst case).
    val out = spark.range(outdeg)
      .select(lit(hub).as("src"), (col("id") + 1L).as("dst"),
        (pmod(col("id"), lit(10L)) + 1L).as("weight"))
    val back = spark.range(outdeg)
      .select((col("id") + 1L).as("src"), lit(hub).as("dst"), lit(1L).as("weight"))
    val edges = out.union(back).localCheckpoint(true)
    val vertices = EdgeSource.vertices(edges.select(col("src"), col("dst")))
      .localCheckpoint(true)
    println(s"WHUB graph nodes=${vertices.count()} edges=${edges.count()} hubOutdeg=$outdeg")

    def leg(mode: String): Unit = {
      sys.props("graft.wpick") = mode
      val t0 = System.nanoTime()
      MonteCarloPpr.run(edges, vertices, PprConfig(K = 10, L = 20,
        iterations = walks, topLStrategy = "window"), maxSteps = 16).count()
      val mcSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val trace = MonteCarloPpr.walkTrace(edges, vertices, walksPerNode = 1,
        maxSteps = 8, damping = 1.0, salt = 42L)
      val traceHash = trace.agg(
        count(lit(1)), coalesce(expr("bit_xor(xxhash64(seed, walk_id, step, node))"), lit(0L)))
        .head()
      val traceSec = (System.nanoTime() - t1) / 1e9
      println(f"""WHUB {"mode":"$mode","mc_sec":$mcSec%.3f,"trace_sec":$traceSec%.3f,"trace_rows":${traceHash.getLong(0)},"trace_hash":${traceHash.getLong(1)}}""")
      sys.props.remove("graft.wpick")
    }
    // warmup leg (JIT), then measured legs, linear first
    leg("warmup")
    leg("linear")
    leg("auto")
    spark.stop()
  }
}
