package graft

import org.apache.spark.sql.SparkSession

/** A/B of the GRank per-superstep prune shape (guide §2.3 vs §2.4 trade):
  * "aligned" = one repartition(seed) exchange carrying RAW gather rows,
  * reused by the (seed,node) aggregation and the rank window;
  * "agg2" = groupBy(seed,node) with map-side partial aggregation (smaller
  * exchange) followed by a second hash(seed) exchange for the window.
  * Same fixpoint either way (the sum/cut law is identical). Interleaved
  * same-JVM legs on the bench query; warmup leg discarded.
  */
object GrankPruneBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-grank-prune")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries("q_grank")
    def leg(mode: String): Unit = {
      if (mode == "agg2") sys.props("graft.grank.prune") = "agg2"
      else sys.props.remove("graft.grank.prune")
      def load() = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      val l0 = load()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"GPRUNE mode=$mode wall=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n load0=$l0 load1=${load()}")
    }
    leg("warmup")
    for (_ <- 1 to 2) { leg("aligned"); leg("agg2") }
    spark.stop()
  }
}
