package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ExactPpr, PushPpr}

/** At-scale evidence for the forward-push engine's claim (PushPpr scaladoc):
  * per-superstep work decays with the remaining pushable mass, while power
  * iteration pays the full frontier every superstep. Runs both engines on
  * the prebuilt WebCorpus bench graph with the same seed batch and the same
  * convergence-norm instrumentation, and prints one `PUSHSCALE {...}` JSON
  * line with per-superstep wall/rows/maxDiff histories.
  *
  * Usage: PushScaleRun [graphDir] [nSeeds] [rmax] [iters]
  */
object PushScaleRun {
  def main(args: Array[String]): Unit = {
    val graphDir = args.lift(0).getOrElse("/tmp/graft-bench-graph-300000")
    val nSeeds = args.lift(1).map(_.toInt).getOrElse(500)
    val rmax = args.lift(2).map(_.toDouble).getOrElse(1e-4)
    val iters = args.lift(3).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-push-scale")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = spark.read.parquet(s"$graphDir/edges").persist()
    val vertices = spark.read.parquet(s"$graphDir/vertices").persist()
    val (ne, nv) = (edges.count(), vertices.count())
    val seeds = vertices.orderBy(col("id")).limit(nSeeds).persist()
    seeds.count()

    def hist(h: Seq[graft.operators.IterMetrics]): String =
      h.map(m => s"""{"it":${m.iteration},"wallMs":${m.wallMs},"rows":${m.rows},"maxDiff":${if (m.maxDiff.isNaN) "null" else m.maxDiff}}""")
        .mkString("[", ",", "]")

    val t0 = System.nanoTime()
    val push = PushPpr.run(edges, seeds, rmax = rmax, iterations = iters,
      damping = 0.85, tolerance = 1e-12, quantize = 1e12)
    val pushRows = push.state.count()
    val pushSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val exact = ExactPpr.run(edges, seeds.select(col("id")), iterations = 10,
      damping = 0.85, tolerance = 1e-12, quantize = 1e12)
    val exactRows = exact.count()
    val exactSec = (System.nanoTime() - t1) / 1e9
    // ExactPpr.run returns only the state; re-run metrics come from the push
    // history vs the flat per-superstep cost visible in exactSec/10

    println(s"""PUSHSCALE {"graph":"$graphDir","edges":$ne,"vertices":$nv,"seeds":$nSeeds,"rmax":$rmax,
      |"push_total_sec":$pushSec,"push_supersteps":${push.history.size},"push_state_rows":$pushRows,
      |"push_history":${hist(push.history)},
      |"exact_total_sec":$exactSec,"exact_supersteps":10,"exact_state_rows":$exactRows}"""
      .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
