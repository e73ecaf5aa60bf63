package graft

import org.apache.spark.sql.SparkSession

import graft.sources.WebCorpus

/** Build (once) the deterministic WebCorpus bench graph for a given page
  * count — the same artifact Bench's scaling phase builds lazily — so
  * ScalingRun legs at OTHER sizes (the scale-sweep evidence in BASELINE.md)
  * can be driven individually without rerunning the whole Bench protocol.
  *
  * Usage: runMain graft.GraphBuild <nPages>
  */
object GraphBuild {

  def main(args: Array[String]): Unit = {
    val nPages = args(0).toLong
    val graphDir = s"/tmp/graft-bench-graph-$nPages"
    val marker = new java.io.File(s"$graphDir/_READY")
    if (marker.exists()) { println(s"GRAPHBUILD exists $graphDir"); return }
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-graph-build")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = WebCorpus.synthesize(spark, nPages, seed = 42L)
    WebCorpus.edges(pages).write.mode("overwrite").parquet(s"$graphDir/edges")
    WebCorpus.vertices(pages).write.mode("overwrite").parquet(s"$graphDir/vertices")
    java.nio.file.Files.writeString(marker.toPath, "ok")
    val nE = spark.read.parquet(s"$graphDir/edges").count()
    val nV = spark.read.parquet(s"$graphDir/vertices").count()
    println(s"GRAPHBUILD done $graphDir nodes=$nV edges=$nE")
    spark.stop()
  }
}
