package graft

import org.apache.spark.sql.SparkSession

import graft.operators.PageRank
import graft.sources.EdgeSource

/** Focused measurement main for the q_pagerank bench regression (VERDICT r2
  * #1: 18.4 s -> 36.0 s at sf0.1/40 iterations). Runs the SAME operator
  * under a labeled config matrix in one JVM (warm JIT after run 1) and
  * prints per-config wall + per-superstep history, so the regression is
  * attributed to a measured dimension (tolerance / quantize / leak plan /
  * lineage policy), not guessed.
  *
  * Usage: runMain graft.PrBench [sfDir] (SPARK_GRAFT_ITER_DEBUG=1 for
  * per-superstep mat/norm/count breakdown).
  */
object PrBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prbench")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true") // match Bench phase A
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = EdgeSource.fromLineitem(spark, sfDir).persist()
    val vertices = EdgeSource.vertices(edges).persist()
    println(s"PRBENCH graph nodes=${vertices.count()} edges=${edges.count()}")

    def run(label: String, tol: Double, quantize: Double,
        lineageCutEvery: Int, leakPlan: String): Unit = {
      val t0 = System.nanoTime()
      val res = PageRank.runWithMetrics(edges, vertices, iterations = 40,
        tolerance = tol, quantize = quantize,
        lineageCutEvery = lineageCutEvery, leakPlan = leakPlan)
      val n = res.state.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hist = res.history.map(_.wallMs)
      val steady = hist.drop(1)
      println(f"PRBENCH $label%-34s wall=$sec%7.2f s iters=${hist.size}%d " +
        f"rows=$n%d steadyAvgMs=${if (steady.nonEmpty) steady.sum / steady.size else -1}%d " +
        s"first5=${hist.take(5).mkString(",")} last5=${hist.takeRight(5).mkString(",")}")
    }

    val all = Map(
      // the r2 bench config, as measured 36.0 s in BENCH_r02
      "A" -> (() => run("A:r2  tol=-1   q=1e12 cut=1 sub", -1, 1e12, 1, "subquery")),
      // isolate quantize
      "B" -> (() => run("B:    tol=-1   q=0    cut=1 sub", -1, 0.0, 1, "subquery")),
      // isolate tolerance (r1 ran tol=1e-8: norm job + count per superstep)
      "C" -> (() => run("C:r1  tol=1e-8 q=0    cut=1 sub", 1e-8, 0.0, 1, "subquery")),
      // persist-chain state (keeps hash partitioning; the GRank r2 fix)
      "D" -> (() => run("D:    tol=-1   q=1e12 cut=8 sub", -1, 1e12, 8, "subquery")),
      // leak as a driver literal from the cached state (no subquery node)
      "E" -> (() => run("E:    tol=-1   q=1e12 cut=1 lit", -1, 1e12, 1, "literal")),
      "F" -> (() => run("F:    tol=-1   q=1e12 cut=8 lit", -1, 1e12, 8, "literal")))
    val picks = sys.env.getOrElse("SPARK_GRAFT_PR_CONFIGS", "A,B,C,D,E,F").split(",")
    // warmup (JIT, codegen cache) — discard
    run("warmup(tol=-1,q=1e12)", -1, 1e12, 1, "subquery")
    picks.foreach(p => all(p.trim)())

    spark.stop()
  }
}
