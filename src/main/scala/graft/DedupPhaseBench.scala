package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}

/** Phase-level timing of the q_dedup_clusters pipeline (guide §1: find
  * where the time goes before touching anything): rebuilds the chain
  * corpus exactly as SparkEntry does and times shingling, inverted index +
  * df cap, candidate self-join, verify, and the star-contraction CC
  * separately (each isolated with a count on a checkpointed frame).
  * Usage: runMain graft.DedupPhaseBench [sfDir]
  */
object DedupPhaseBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-phase")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val tail1 = " graft near duplicate pad tail"
    val tail2 = " second graft pad chunk extra"
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val d = d0
      .union(d0.select(col("doc_id") + 1000000L, concat(col("text"), lit(tail1))))
      .union(d0.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(tail1), lit(tail2)).as("text")))
    val docs = timed("chain_docs")(d.localCheckpoint(true))
    println(s"  docs=${docs.count()}")

    val shingled = timed("shingle+persist") {
      val s = docs.select(col("doc_id").as("id"),
        array_distinct(Dedup.tokenShingles(col("text"), 3)).as("sh")).persist()
      s.count(); s
    }
    val invR = timed("inv+dfcap") {
      val inv = shingled.select(col("id"), explode(col("sh")).as("s0"))
        .select(col("id"), xxhash64(col("s0")).as("s"))
      val rare = inv.groupBy("s").agg(count(lit(1)).as("df_s"))
        .where(col("df_s") <= 50).select("s")
      val r = inv.join(rare, "s").localCheckpoint(true)
      println(s"  invR rows=${r.count()}"); r
    }
    val cand = timed("cand self-join") {
      val c = invR.as("x").join(invR.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
        .localCheckpoint(true)
      println(s"  cand pairs=${c.count()}"); c
    }
    val candS = timed("size filter") {
      val hashedSet = array_distinct(transform(array_distinct(col("sh")), s => xxhash64(s)))
      val sizes = shingled.select(col("id"), size(hashedSet).as("n"))
      val c = cand
        .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
        .where(least(col("na"), col("nb")).cast("double") >=
          lit(0.7) * greatest(col("na"), col("nb")).cast("double"))
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      println(s"  size-filtered pairs=${c.count()}"); c
    }
    val pairs = timed("verify") {
      val hashedSet = array_distinct(transform(array_distinct(col("sh")), s => xxhash64(s)))
      val a = shingled.select(col("id").as("id_a"), hashedSet.as("sha"))
      val b = shingled.select(col("id").as("id_b"), hashedSet.as("shb"))
      val p = candS.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))).cast("double")).as("jaccard"))
        .where(col("jaccard") >= 0.7)
        .localCheckpoint(true)
      println(s"  verified pairs=${p.count()}"); p
    }
    timed("clusters CC") {
      println("  rows=" + Dedup.clusters(pairs, docs).count())
    }
    spark.stop()
  }
}
