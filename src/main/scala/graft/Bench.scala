package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.PprConfig
import graft.operators.GRank
import graft.sources.WebCorpus

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  *  - headline queries at SPARK_GRAFT_SF_DIR (wall seconds each)
  *  - north-rule scaling evidence (BASELINE.md protocol): the SAME GRank
  *    job — identical parquet input, identical shuffle partitioning — at
  *    local[8] and local[32]; reports supersteps/sec, edges-processed/sec
  *    (|E| adjacency rows consulted per superstep) and scaling efficiency
  *    (throughput32 / throughput8) / 4.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SCALING=0 to skip phase B, SPARK_GRAFT_SCALE_PAGES.
  */
object Bench {

  private val headline = Seq(
    "q_edges_dedup", "q_degrees", "q_topk_per_seed", "q_triangle_count",
    "q_grank", "q_exact_ppr", "q_mc_ppr", "q_pagerank",
    "q_connected_components", "q_label_propagation",
    "q_minhash_neardup", "q_simhash_neardup", "q_ann_lsh", "q_ann_brute",
    "q_token_count", "q_sessionize")

  /** Round-4 additions, timed identically but reported under
    * `queries_extra` and excluded from `headline_total`, which stays
    * round-over-round comparable on the original 16-query set. */
  private val extra = Seq(
    "q_push_ppr", "q_kcore", "q_clustering_coeff", "q_hll_estimate",
    "q_ann_ivf", "q_two_coloring_contract", "q_pagerank_weighted",
    "q_sessionize_stream", "q_hyperball", "q_reciprocity", "q_transitivity",
    "q_exact_ppr_weighted",
    // round-5 additions
    "q_grank_weighted", "q_push_ppr_weighted", "q_ann_recall",
    "q_scc", "q_hits", "q_harmonic", "q_trustrank", "q_host_pagerank",
    "q_dedup_clusters", "q_corpus_prep", "q_neighborhood_function",
    "q_bowtie", "q_walk_trace", "q_assortativity", "q_degree_hist",
    "q_unigram_logprob",
    // round-6 additions
    "q_mc_ppr_weighted", "q_walk_trace_weighted", "q_host_walk_corpus",
    "q_tfidf", "q_sample_stratified", "q_pmi_bigrams", "q_repetition",
    "q_window_distinct")

  private def session(cores: Int, shufflePartitions: Int): SparkSession = {
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.local.dir", "/dev/shm/graft-spark") // shuffle on tmpfs
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed GRank run: (totalSec, steadySec, steadySupersteps).
    * Steady-state excludes the first superstep (JIT compile + cold caches)
    * so the scaling ratio measures the per-superstep compute, not JVM
    * warmup that only the first-run parallelism level pays. */
  private def grankRun(spark: SparkSession, graphDir: String, cfg: PprConfig): (Double, Double, Int) = {
    val edges = spark.read.parquet(s"$graphDir/edges").persist()
    val vertices = spark.read.parquet(s"$graphDir/vertices").persist()
    edges.count(); vertices.count() // warm the input cache before timing
    val t0 = System.nanoTime()
    val res = GRank.runWithMetrics(edges, vertices, cfg)
    res.state.count()
    val sec = (System.nanoTime() - t0) / 1e9
    edges.unpersist(); vertices.unpersist()
    val steady = res.history.drop(1)
    (sec, steady.map(_.wallMs).sum / 1000.0, steady.size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val doHeadline = sys.env.getOrElse("SPARK_GRAFT_HEADLINE", "1") == "1"
    val topLStrategy = sys.env.getOrElse("SPARK_GRAFT_TOPL", "window")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAGES", "300000").toLong

    // ---- phase A: headline queries at the driver's SF dir ----------------
    val sparkA = session(cpus, math.max(cpus, 8))
    var errors = Map.empty[String, String]
    def timed(names: Seq[String]): Seq[(String, Double)] = names.flatMap { name =>
      SparkEntry.queries.get(name).flatMap { fn =>
        val t0 = System.nanoTime()
        // a failed headline query must be VISIBLE in the JSON (errors map)
        // and must NOT contribute a (fast-failing) time to queries/total —
        // a driver reading only the metric would score a crash as a win
        try {
          fn(sparkA, sfDir).count()
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
            None
        }
      }
    }
    val results = if (doHeadline) timed(headline) else Seq.empty
    val extraResults = if (doHeadline) timed(extra) else Seq.empty

    // ---- phase B input: deterministic web graph, built once ---------------
    var scalingJson = "null"
    if (doScaling) {
      val graphDir = s"/tmp/graft-bench-graph-$nPages"
      val marker = new java.io.File(s"$graphDir/_READY")
      if (!marker.exists()) {
        val pages = WebCorpus.synthesize(sparkA, nPages, seed = 42L)
        val edges = WebCorpus.edges(pages)
        val vertices = WebCorpus.vertices(pages)
        edges.write.mode("overwrite").parquet(s"$graphDir/edges")
        vertices.write.mode("overwrite").parquet(s"$graphDir/vertices")
        java.nio.file.Files.writeString(marker.toPath, "ok")
      }
      val nEdges = sparkA.read.parquet(s"$graphDir/edges").count()

      // identical job + partitioning; only the worker-thread count differs.
      // saltThreshold: per-key gather output is indeg*L rows; splitting pays
      // off when that exceeds ~10M rows per key (true web hubs) — at this
      // bench's max indeg (~1.2k) it would be pure overhead (measured 3x),
      // so the threshold is set above the bench graph's max in-degree.
      // (Semantics-equivalence of the salted path is test-gated.)
      val salt = sys.env.getOrElse("SPARK_GRAFT_SALT", "100000").toInt
      val cfg = PprConfig(K = 50, L = 100, iterations = 4, tolerance = -1,
        topLStrategy = topLStrategy, saltThreshold = salt, saltBuckets = 8)
      // 256 partitions: bounds per-task aggregation state so the last
      // (largest) superstep doesn't spill at 32 concurrent tasks
      val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64").toInt
      val iters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "8").toInt

      // each level in its own CPU-pinned JVM (own GC/IO threads): the
      // closest local analog of running N vs 4N executors
      def spawn(cores: Int, cpuRange: String, itersN: Int = iters): Map[String, Double] = {
        import scala.jdk.CollectionConverters._
        val javaBin = System.getProperty("java.home") + "/bin/java"
        val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
          .getInputArguments.asScala.filterNot(_.startsWith("-Xmx")).toSeq :+ "-Xmx40g"
        val cp = System.getProperty("java.class.path")
        val taskset =
          if (new java.io.File("/usr/bin/taskset").exists()) Seq("/usr/bin/taskset", "-c", cpuRange)
          else Seq.empty
        val cmd = taskset ++ Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.ScalingRun",
          cores.toString, graphDir, topLStrategy, salt.toString, shuffleParts.toString, itersN.toString)
        def once(): Option[String] = {
          val pb = new ProcessBuilder(cmd: _*)
          pb.redirectError(ProcessBuilder.Redirect.INHERIT) // spark logs -> stderr, keep pipe drained
          val proc = pb.start()
          val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
          proc.waitFor()
          out.find(_.startsWith("SCALING "))
        }
        // one retry: a transiently failed child (OOM-killed under a co-tenant
        // burst, truncated pipe) must not abort the whole unattended bench
        val line = once().orElse(once())
          .getOrElse(sys.error(s"no SCALING line from $cores-core leg after retry"))
        val json = line.stripPrefix("SCALING ")
        def field(k: String): Double =
          ("\"" + k + "\":([0-9.Ee+-]+)").r.findFirstMatchIn(json).map(_.group(1).toDouble)
            .getOrElse(sys.error(s"missing $k in $json"))
        Map("total" -> field("total_sec"), "min" -> field("min_superstep_sec"),
          "supersteps" -> field("steady_supersteps"))
      }
      sparkA.stop()
      // co-tenant load bursts on this VM only ever ADD wall time, so the
      // headline number is min over `repeats` interleaved runs per level
      // (plus the min-of-steady-supersteps inside each run). Load averages
      // are recorded alongside so the noise context is in the evidence.
      def loadavg(): Double =
        scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      // calm-window gate: don't START a measured leg during an ambient load
      // burst (r2's 2->8 pair recorded one 2-core leg at 95.9 s vs the
      // protocol's 34 s because it launched into loadavg 20). Bounded wait
      // per leg AND a global budget across the whole run (an unattended
      // driver bench must not stall through a long burst) —
      // min-over-repeats remains the backstop if the burst outlasts it.
      var calmBudget = sys.env.getOrElse("SPARK_GRAFT_CALM_BUDGET", "480").toInt
      def waitForCalm(): Unit = {
        val limit = sys.env.getOrElse("SPARK_GRAFT_CALM_LOAD", "6.0").toDouble
        var waited = 0
        while (loadavg() > limit && waited < 240 && calmBudget > 0) {
          Thread.sleep(20000); waited += 20; calmBudget -= 20
        }
      }
      val repeats = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPEATS", "2").toInt
      var r8s = Vector.empty[Map[String, Double]]
      var r32s = Vector.empty[Map[String, Double]]
      var loads = Vector.empty[Double]
      for (_ <- 1 to repeats) {
        waitForCalm(); loads :+= loadavg(); r8s :+= spawn(8, "0-7")
        waitForCalm(); loads :+= loadavg(); r32s :+= spawn(32, "0-31")
      }
      val r8 = r8s.minBy(_("min"))
      val r32 = r32s.minBy(_("min"))
      val (m8, m32) = (r8("min"), r32("min"))
      val tp8 = nEdges.toDouble / m8
      val tp32 = nEdges.toDouble / m32
      val eff = (tp32 / tp8) / 4.0
      // PRIMARY N -> 4N pair: 2 -> 8 cores, the UNSATURATED region of this
      // single shared-DRAM box. At 32 threads the box caps ANY shuffle+
      // hash-agg job at ~0.6 efficiency — vanilla Spark's own groupBy/sum
      // control measures that ceiling (BASELINE.md) — so 8 -> 32 above is
      // reported as the saturated-region secondary with the control
      // attached, and the engine's own scaling is read off 2 -> 8. Same
      // protocol as the main pair: `repeats` interleaved pinned JVMs,
      // min-of-steady-supersteps per run, min across runs (4-iteration runs
      // keep the 2-core leg's wall bounded; steady excludes superstep 1).
      val doSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_SMALL", "1") == "1"
      var smallJson = ""
      if (doSmall) {
        var r2s = Vector.empty[Map[String, Double]]
        var r8bs = Vector.empty[Map[String, Double]]
        for (_ <- 1 to repeats) {
          waitForCalm(); loads :+= loadavg(); r2s :+= spawn(2, "0-1", 4)
          waitForCalm(); loads :+= loadavg(); r8bs :+= spawn(8, "0-7", 4)
        }
        val (m2, m8b) = (r2s.map(_("min")).min, r8bs.map(_("min")).min)
        val eff28 = ((nEdges.toDouble / m8b) / (nEdges.toDouble / m2)) / 4.0
        // FIXED repeat count — no result-conditioned resampling (a loop that
        // re-measures until the ratio lands in a plausibility band biases
        // the published number; ADVICE r3). Efficiency outside (0.5, 1.02)
        // is unphysical for this workload on this box (no cache-capacity
        // cliff between 2 and 8 cores at this state size) and means a leg
        // was noise-inflated despite the calm gate + min estimator — the
        // JSON flags it for the reader instead of hiding the evidence.
        val noiseSuspect = eff28 > 1.02 || eff28 < 0.5
        smallJson = s""","primary_pair":"2->8","min_superstep_sec_2_short":$m2,"min_superstep_sec_8_short":$m8b,
                       |"runs_2":${r2s.map(_("min")).mkString("[", ",", "]")},
                       |"runs_8_short":${r8bs.map(_("min")).mkString("[", ",", "]")},
                       |"scaling_efficiency_2_to_8":$eff28,"eff_2_8_noise_suspect":$noiseSuspect""".stripMargin.replace("\n", "")
      }
      scalingJson =
        s"""{"edges":$nEdges,"repeats":$repeats,
           |"total_sec_8":${r8("total")},"total_sec_32":${r32("total")},
           |"min_superstep_sec_8":$m8,"min_superstep_sec_32":$m32,
           |"runs_8":${r8s.map(_("min")).mkString("[", ",", "]")},
           |"runs_32":${r32s.map(_("min")).mkString("[", ",", "]")},
           |"loadavg":${loads.mkString("[", ",", "]")},
           |"supersteps_per_sec_8":${1.0 / m8},"supersteps_per_sec_32":${1.0 / m32},
           |"edges_per_sec_8":$tp8,"edges_per_sec_32":$tp32,
           |"scaling_efficiency_8_to_32":$eff$smallJson}""".stripMargin.replace("\n", "")
    } else {
      sparkA.stop()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qsExtra = extraResults.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"queries_extra":$qsExtra,"errors":$errs,"sf":"$sfDir","scaling":$scalingJson}""")
  }
}
