package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PprConfig
import graft.operators._
import graft.sources.EdgeSource

/** Larger-scale anchor for the 100x story (VERDICT r3 #7): run the graph
  * operator suite with IDENTICAL configs on two deterministic WebCorpus
  * bench graphs (300k pages / 1.17M edges and 1M pages / 3.9M edges, both
  * prebuilt by Bench) and print per-query walls, so per-operator scaling
  * with DATA SIZE (not parallelism) is on the record and any super-linear
  * query gets a named cause. One `SCALESUITE {json}` line per graph dir.
  *
  * Env knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_SUITE_PAGES (comma-separated
  * graph dir keys, default "300000,1000000").
  */
object ScaleSuite {

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val pageList = sys.env.getOrElse("SPARK_GRAFT_SUITE_PAGES", "300000,1000000")
      .split(',').map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-scale-suite")
      .config("spark.local.dir", "/tmp/graft-spark-suite")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("/tmp/graft-spark-suite").mkdirs()

    def loadavg(): Double =
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble

    pageList.foreach { nPages =>
      val graphDir = s"/tmp/graft-bench-graph-$nPages"
      require(new java.io.File(s"$graphDir/_READY").exists(),
        s"bench graph missing — run graft.Bench once to build $graphDir")
      val edges = spark.read.parquet(s"$graphDir/edges").persist()
      val vertices = spark.read.parquet(s"$graphDir/vertices").persist()
      val (nE, nV) = (edges.count(), vertices.count())
      val load0 = loadavg()

      // fixed iteration counts (tolerance = -1 where applicable) so both
      // graphs do the same NUMBER of supersteps and the ratio isolates
      // per-superstep data scaling; configs mirror the bench suite's shape
      val suite: Seq[(String, () => DataFrame)] = Seq(
        "degrees" -> (() => EdgeSource.outDegrees(edges, vertices)
          .join(EdgeSource.inDegrees(edges, vertices), Seq("id"))),
        "triangles" -> (() => Triangles.countByDegreeOrder(edges)),
        "grank_i4" -> (() => GRank.run(edges, vertices,
          PprConfig(K = 50, L = 100, iterations = 4, tolerance = -1,
            topLStrategy = "window"))),
        "exact_ppr_i10" -> (() => ExactPpr.run(edges,
          vertices.orderBy(col("id")).limit(10), iterations = 10,
          damping = 0.85, tolerance = -1)),
        "mc_ppr_r30" -> (() => MonteCarloPpr.run(edges, vertices,
          PprConfig(K = 10, L = 20, iterations = 30, topLStrategy = "window"),
          maxSteps = 64)),
        "pagerank_i10" -> (() => PageRank.run(edges, vertices,
          iterations = 10, tolerance = -1)),
        "cc_star" -> (() => Components.connectedComponentsStar(edges, vertices)),
        "label_prop_r4" -> (() => Components.labelPropagation(edges, vertices, rounds = 4)),
        "two_coloring_contract" -> (() => Components.twoColoringContract(edges, vertices)),
        // round-4 additions: fixed rounds, same reasoning as above
        "kcore_r8" -> (() => KCore.coreness(edges, vertices, rounds = 8, tolerance = -1)),
        "push_ppr_i8" -> (() => PushPpr.run(edges,
          vertices.orderBy(col("id")).limit(10), rmax = 1e-4, iterations = 8,
          damping = 0.85, tolerance = -1).state),
        "clustering_coeff" -> (() => Triangles.clusteringCoefficient(edges, vertices)),
        // round-5 additions
        "scc" -> (() => Scc.scc(edges, vertices)), // doubling default (r6)
        "scc_nodouble" -> (() => Scc.scc(edges, vertices, labelDoubling = false)),
        "hits_i8" -> (() => Hits.run(edges, vertices, iterations = 8, tolerance = -1)),
        "harmonic_r4" -> (() => HyperBall.centralities(edges, vertices, rounds = 4)),
        "trustrank_i10" -> (() => ExactPpr.runVector(edges,
          vertices.where(pmod(col("id"), lit(97)) === 0)
            .select(col("id"), lit(1e-4).as("mass")),
          iterations = 10, damping = 0.85, tolerance = -1)),
        "host_pagerank_i10" -> (() => {
          val m = vertices.select(col("id"), pmod(col("id"), lit(9973)).as("grp"))
          PageRank.run(Coarsen.project(edges, m),
            m.select(col("grp").as("id")).distinct(), iterations = 10, tolerance = -1)
        }),
        // round-6 additions: the walk-corpus family, uniform and weighted
        // (deterministic integer weights planted on the bench edges)
        "walk_trace_r2" -> (() =>
          MonteCarloPpr.walkTrace(edges, vertices, walksPerNode = 2, maxSteps = 8)),
        "walk_trace_weighted_r2" -> (() =>
          MonteCarloPpr.walkTrace(
            edges.withColumn("weight", pmod(xxhash64(col("src"), col("dst")), lit(5L)) + 1),
            vertices, walksPerNode = 2, maxSteps = 8)),
        "mc_ppr_weighted_r30" -> (() => MonteCarloPpr.run(
          edges.withColumn("weight", pmod(xxhash64(col("src"), col("dst")), lit(5L)) + 1),
          vertices, PprConfig(K = 10, L = 20, iterations = 30, topLStrategy = "window"),
          maxSteps = 64)))

      // optional name filter for re-measuring individual operators
      val only = sys.env.get("SPARK_GRAFT_SUITE_ONLY").map(_.split(',').toSet)
      val walls = suite.filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn().count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[scalesuite] $nPages $name ${f"$sec%.1f"}s")
        name -> sec
      }
      val qs = walls.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      println(s"""SCALESUITE {"pages":$nPages,"nodes":$nV,"edges":$nE,""" +
        s""""load_before":$load0,"load_after":${loadavg()},"queries":$qs}""")
      edges.unpersist(); vertices.unpersist()
    }
    spark.stop()
  }
}
