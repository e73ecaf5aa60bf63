package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.kernels.Mix

/** ANN recall/throughput evidence main (VERDICT r4 #1): measures recall@k of
  * lshTopK and ivfTopK against bruteForceTopK at production-ish parameters
  * over a deterministic clustered corpus (synthesized in-engine from the
  * SQL-replayable mixer — no external data), printing one
  * `ANNRECALL {json}` line per configuration. This is the ANN family's
  * tuning table — the analog of the reference's quality-harness numbers
  * (include/benchmarkAlgorithm.h, thesis §5.2) for ITS approximation: a
  * user picking `planes` / `nCells` / `nProbe` reads recall-vs-wall here.
  *
  * Corpus: `nClusters` mixer-random centers in the unit cube; vector i =
  * center(i mod nClusters) + amp * jitter(i). The planted cluster structure
  * makes top-k recall a meaningful target — i.i.d. random vectors are
  * near-orthogonal at dims = 64 and every method (including brute force
  * re-ranked by meaningless ties) degenerates.
  *
  * Env knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_ANN_N (corpus size).
  */
object AnnRecallRun {

  def synthEmbeddings(spark: SparkSession, n: Long, dims: Int, nClusters: Int,
      amp: Double, seed: Long): DataFrame = {
    val cluster = pmod(col("id"), lit(nClusters.toLong))
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (Mix.uniform(cluster, i, lit(0), seed * 7919L + 101L) * 2.0 - 1.0) +
          (Mix.uniform(col("id"), i, lit(1), seed * 7919L + 202L) * 2.0 - 1.0) * amp
      ).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "100000").toLong
    val dims = 64
    val k = 10
    val nQ = 200
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = synthEmbeddings(spark, n, dims, nClusters = 256, amp = 0.25,
      seed = 42L).persist()
    corpus.count()
    val queries = corpus.where(col("vec_id") < nQ).persist()
    queries.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, bruteSec) = timed {
      Similarity.bruteForceTopK(queries, corpus, k).localCheckpoint(true)
    }
    println(s"""ANNRECALL {"method":"brute","n":$n,"k":$k,"queries":$nQ,"sec":$bruteSec,"avg_recall":1.0,"min_recall":1.0}""")

    def report(method: String, cfg: String, df: => DataFrame): Unit = {
      val (res, sec) = timed { df.localCheckpoint(true) }
      val r = Similarity.recallAtK(res, exact, k, method).head()
      println(s"""ANNRECALL {"method":"$method","cfg":$cfg,"n":$n,"k":$k,"sec":$sec,"avg_recall":${r.getDouble(3)},"min_recall":${r.getDouble(4)}}""")
    }
    for (planes <- Seq(8, 12, 16))
      report("lsh", s"""{"planes":$planes}""",
        Similarity.lshTopK(queries, corpus, k, planes = planes, dims = dims))
    // 256 cells x 64 dims is exactly the codebook size the pre-r5
    // literal-expression assignment could not plan — the broadcast-join
    // codebook runs it as an ordinary small-dim join
    for ((nc, np) <- Seq((64, 4), (64, 8), (64, 16), (256, 8), (256, 32)))
      report("ivf", s"""{"nCells":$nc,"nProbe":$np}""",
        Similarity.ivfTopK(queries, corpus, k, nCells = nc, nProbe = np, dims = dims))
    spark.stop()
  }
}
