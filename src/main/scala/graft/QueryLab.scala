package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): times individual
  * declared queries OUTSIDE the frozen Bench main, with repeats, and
  * captures `.explain("formatted")` plans for the evidence files under
  * plans/r07/. The timed action is the same `.count()` the driver's Bench
  * uses, so numbers are comparable; a `noop` mode (guide §1.4) is available
  * to time full-row materialization instead.
  *
  * Usage: runMain graft.QueryLab [q_name ...|all] — env knobs:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     cores (default 32)
  *   SPARK_GRAFT_REPEATS  timed repeats per query (default 1)
  *   SPARK_GRAFT_PLAN_DIR if set, write <dir>/<query>.txt with the final
  *                        frame's formatted plan (iterative operators also
  *                        dump their per-superstep plan via the engine's
  *                        SPARK_GRAFT_EXPLAIN_DIR hook)
  *   SPARK_GRAFT_NOOP     "1" = noop-sink write instead of count()
  */
object QueryLab {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "1").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val useNoop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")

    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-querylab")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names =
      if (args.isEmpty || args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    planDir.foreach(d => new java.io.File(d).mkdirs())

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"LAB $name MISSING")
        case Some(fn) =>
          var r = 0
          while (r < repeats) {
            spark.sparkContext.setJobDescription(name)
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            if (useNoop) df.write.format("noop").mode("overwrite").save()
            else df.count()
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"LAB $name $sec%.3f")
            if (r == 0) planDir.foreach { d =>
              val plan = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              java.nio.file.Files.writeString(
                java.nio.file.Paths.get(s"$d/$name.txt"), plan)
            }
            r += 1
          }
      }
    }
    spark.stop()
  }
}
