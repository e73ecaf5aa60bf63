package graft

import org.apache.spark.sql.SparkSession

/** Focused repeat-measurement of ONE headline query (default q_mc_ppr) in a
  * fresh session — separates code regressions from phase-A session noise.
  * Usage: runMain graft.McBench [queryName] [repeats] [sfDir]
  */
object McBench {

  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_mc_ppr"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-mcbench")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg(): String = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val l0 = loadavg()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"MCBENCH $name run=$i wall=$sec%.2f s rows=$n load0=$l0 load1=${loadavg()}")
    }
    spark.stop()
  }
}
