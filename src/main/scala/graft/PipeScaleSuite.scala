package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.sources.Synth
import graft.streaming.EventStream

/** Second scale anchor for the NON-GRAPH families (VERDICT r5 #1):
  * dedup / ANN / text / streaming queries run with IDENTICAL configs on two
  * deterministic synthetic corpora (base ≈ sf0.1 shape and `factor`× it),
  * so per-operator scaling with DATA SIZE is on the record for the
  * pipeline families the way ScaleSuite records it for the graph families.
  * One `PIPESCALE {json}` line per size.
  *
  * Also (one run each, base size):
  *  - `ANNGRID {json}`: recall@10 for LSH planes ∈ {8,10,12} and IVF
  *    nProbe ∈ {2,4,8} against brute force — the published knob/tradeoff
  *    curve next to q_ann_recall's single point (VERDICT r5 #8).
  *  - `STATEGROWTH {json}`: streaming sessionization over a 10× events
  *    table staged as ts-ordered files, one micro-batch per file
  *    (maxFilesPerTrigger = 1) — StateStore rows/bytes per batch with the
  *    advancing watermark, the state-eviction evidence (VERDICT r5 #7).
  *
  * Env knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_PIPE_DOCS (base doc count,
  * default 5000), SPARK_GRAFT_PIPE_FACTOR (default 4),
  * SPARK_GRAFT_PIPE_SKIP (comma-separated sections to skip:
  * suite,anngrid,hllsweep,stategrowth), SPARK_GRAFT_PIPE_ONLY
  * (comma-separated suite query names to run, default all).
  */
object PipeScaleSuite {

  private val nearDupTail = " graft near duplicate pad tail"
  private val nearDupTail2 = " second graft pad chunk extra"

  private def loadavg(): Double =
    scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val baseDocs = sys.env.getOrElse("SPARK_GRAFT_PIPE_DOCS", "5000").toLong
    val factor = sys.env.getOrElse("SPARK_GRAFT_PIPE_FACTOR", "4").toInt
    val skip = sys.env.getOrElse("SPARK_GRAFT_PIPE_SKIP", "").split(',').toSet
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-pipe-scale")
      .config("spark.local.dir", "/tmp/graft-spark-pipe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("/tmp/graft-spark-pipe").mkdirs()

    if (!skip("suite")) Seq(1, factor).foreach(f => runSuite(spark, baseDocs, f))
    if (!skip("anngrid")) annGrid(spark, nVecs = 2000L)
    if (!skip("hllsweep")) hllSweep(spark)
    if (!skip("stategrowth")) stateGrowth(spark, nEvents = 1000000L)
    spark.stop()
  }

  /** Measured HLL error across p (VERDICT r5 #5): estimate vs exact
    * distinct count on a known-cardinality multiset, next to the published
    * ±1.04/√2^p standard error each p buys. */
  private def hllSweep(spark: SparkSession): Unit = {
    val distinct = 1234567L
    val vals = spark.range(4000000L).select(pmod(xxhash64(col("id")), lit(distinct)).as("v"))
      .persist()
    val exact = vals.select(col("v")).distinct().count() // hash misses a few residues
    val rows = Seq(4, 6, 8, 10, 12, 14).map { p =>
      val est = graft.functions.Sketch.approxDistinct(vals, "v", p = p)
        .collect()(0).getAs[Double]("est")
      val relErr = math.abs(est - exact) / exact
      val bound = 1.04 / math.sqrt((1 << p).toDouble)
      s"""{"p":$p,"est":$est,"rel_err":$relErr,"stderr_bound":$bound}"""
    }
    println(s"""HLLSWEEP {"exact":$exact,"rows":[${rows.mkString(",")}]}""")
    vals.unpersist()
  }

  /** Synthesize at `f`× base, persist as parquet (so every query reads the
    * same on-disk shape the driver queries read), time the suite. */
  private def runSuite(spark: SparkSession, baseDocs: Long, f: Int): Unit = {
    val nDocs = baseDocs * f
    val nVecs = 2000L * (baseDocs / 5000.0).toLong.max(1L) * f
    val nEvents = 100000L * f
    // cache key carries ALL table sizes + a generator version tag: a dir
    // keyed on nDocs alone silently served wrong-size embeddings/events
    // when base/factor combinations collided on the same doc count
    val dir = s"/tmp/graft-pipe-g2-$nDocs-$nVecs-$nEvents"
    if (!new java.io.File(s"$dir/_READY").exists()) {
      Synth.documents(spark, nDocs).write.mode("overwrite").parquet(s"$dir/documents")
      Synth.embeddings(spark, nVecs).write.mode("overwrite").parquet(s"$dir/embeddings")
      Synth.events(spark, nEvents).write.mode("overwrite").parquet(s"$dir/events")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/_READY"), "ok")
    }
    val docs = spark.read.parquet(s"$dir/documents").persist()
    val emb = spark.read.parquet(s"$dir/embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .persist()
    val events = spark.read.parquet(s"$dir/events").persist()
    docs.count(); emb.count(); events.count()
    val load0 = loadavg()

    // planted near-dup corpora, exactly the SparkEntry shapes
    def dupDocs = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 10000000L, col("text")))
    def nearDocs = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 10000000L, concat(col("text"), lit(nearDupTail))))
    def chainDocs = nearDocs.union(docs.select((col("doc_id") + 20000000L).as("doc_id"),
      concat(col("text"), lit(nearDupTail), lit(nearDupTail2)).as("text")))
    val q = emb.where(col("vec_id") < 100)

    val suite: Seq[(String, () => DataFrame)] = Seq(
      "dedup_exact" -> (() => Dedup.exact(dupDocs)),
      "minhash_t07" -> (() => Dedup.minhashLshMix(nearDocs, "doc_id", "text", threshold = 0.7)),
      "ngram_capped" -> (() => Dedup.ngramJaccard(nearDocs, "doc_id", "text",
        threshold = 0.7, maxShingleFreq = 50)),
      "dedup_clusters" -> (() => {
        val pairs = Dedup.ngramJaccard(chainDocs, "doc_id", "text",
          threshold = 0.7, maxShingleFreq = 50)
        Dedup.clusters(pairs, chainDocs)
      }),
      "ann_brute" -> (() => Similarity.bruteForceTopK(q, emb, k = 10)),
      "ann_lsh" -> (() => Similarity.lshTopK(q, emb, k = 10, planes = 10, dims = 64)),
      "ann_ivf" -> (() => Similarity.ivfTopK(q, emb, k = 10, nCells = 64, nProbe = 8, dims = 64)),
      "text_annotate" -> (() => TextAnalysis.annotate(docs)),
      "unigram_logprob" -> (() => TextAnalysis.unigramLogprob(docs)),
      "corpus_prep" -> (() => {
        val d0 = docs.select(col("doc_id"), col("text"), col("source"))
        val dup = d0.union(d0.select(col("doc_id") + 10000000L, col("text"), col("source")))
        val keep = Dedup.exact(dup, "doc_id", "text").select(col("keep_id").as("doc_id"))
        val ann = TextAnalysis.annotate(dup.join(keep, "doc_id"))
        ann.where(col("lang_pred") === "en" && col("quality") >= 0.5)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      }),
      // round-6 text/sampling additions
      "tfidf" -> (() => TextAnalysis.tfidfTopTerms(docs, topN = 5)),
      "pmi_bigrams" -> (() => TextAnalysis.pmiBigrams(docs, minCount = 5, topN = 100)),
      "repetition" -> (() => TextAnalysis.repetitionStats(docs)),
      "sample_stratified" -> (() => graft.functions.Sampling.stratifiedSample(
        docs, "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), defaultFraction = 0.1)),
      "window_agg" -> (() => EventStream.windowedAgg(events, quantize = 1e6)),
      "sessionize" -> (() => EventStream.sessionizeBatch(events, gapMinutes = 30)),
      "window_agg_stream" -> (() =>
        EventStream.windowedAggStreamOnce(spark, s"$dir/events", quantize = 1e6)),
      "sessionize_stream" -> (() =>
        EventStream.sessionizeStreamOnce(spark, s"$dir/events", gapMinutes = 30)))

    val only = sys.env.get("SPARK_GRAFT_PIPE_ONLY").map(_.split(',').toSet)
    val walls = suite.filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // force EVERY output column to evaluate: a bare count() lets
        // Catalyst prune projection-only queries (text_annotate would time
        // a metadata scan, not the annotation) — the all-columns hash sum
        // defeats pruning while staying one cheap aggregation
        val df = fn()
        val rows = df
          .select(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L)).as("h"))
          .agg(count(lit(1)).as("n"), sum(col("h"))) // bounded terms: no ANSI overflow
          .collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[pipescale] $nDocs $name ${f"$sec%.1f"}s ($rows rows)")
        name -> sec
      }
    val qs = walls.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""PIPESCALE {"docs":$nDocs,"vecs":${emb.count()},"events":${events.count()},""" +
      s""""load_before":$load0,"load_after":${loadavg()},"queries":$qs}""")
    docs.unpersist(); emb.unpersist(); events.unpersist()
  }

  /** Recall@10 grid vs brute force: LSH planes sweep, IVF nProbe sweep. */
  private def annGrid(spark: SparkSession, nVecs: Long): Unit = {
    val emb = Synth.embeddings(spark, nVecs)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .persist()
    val q = emb.where(col("vec_id") < 100)
    val exact = Similarity.bruteForceTopK(q, emb, k = 10).localCheckpoint(true)
    def recallOf(approx: DataFrame, m: String): Double =
      Similarity.recallAtK(approx, exact, k = 10, method = m)
        .collect()(0).getAs[Double]("avg_recall")
    val lsh = Seq(8, 10, 12).map { p =>
      s""""lsh_planes_$p":${recallOf(Similarity.lshTopK(q, emb, k = 10, planes = p, dims = 64), "lsh")}"""
    }
    val ivf = Seq(2, 4, 8).map { np =>
      s""""ivf_nprobe_$np":${recallOf(Similarity.ivfTopK(q, emb, k = 10, nCells = 64, nProbe = np, dims = 64), "ivf")}"""
    }
    println(s"""ANNGRID {"vecs":$nVecs,"k":10,${(lsh ++ ivf).mkString(",")}}""")
    emb.unpersist()
  }

  /** Streaming sessionization state growth: 10× events staged as
    * ts-ordered files, one micro-batch per file; per-batch StateStore rows
    * and bytes with the advancing watermark — rows must stop growing once
    * eviction engages (the watermark horizon covers a bounded slice of
    * users' open sessions). */
  private def stateGrowth(spark: SparkSession, nEvents: Long): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stategrowth").toString
    val ev = Synth.events(spark, nEvents, nUsers = 20000L, horizonHours = 72).persist()
    val schema = ev.schema
    // stage in EVENT-TIME order, one file per 2-hour bucket, sequential
    // writes (ascending mod times) so the file source replays time order
    (0 until 36).foreach { b =>
      ev.where(floor((unix_timestamp(col("ts")) - 1704067200L) / 7200L) === b)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    ev.unpersist()
    val stream = EventStream.sessionizeStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir),
      gapMinutes = 30, watermark = "1 hour")
    val sink = java.nio.file.Files.createTempDirectory("graft-stategrowth-sink").toString
    val qy = stream.toDF().writeStream.format("parquet")
      .option("path", s"$sink/out").option("checkpointLocation", s"$sink/ckpt")
      .outputMode("append").start()
    try qy.processAllAvailable() finally qy.stop()
    val progress = qy.recentProgress.toSeq
      .filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
      .map { p =>
        val so = p.stateOperators(0)
        s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
          s""""state_rows":${so.numRowsTotal},"state_bytes":${so.memoryUsedBytes},""" +
          s""""evicted_rows":${so.numRowsRemoved},"watermark":"${p.eventTime.get("watermark")}"}"""
      }
    println(s"""STATEGROWTH {"events":$nEvents,"batches":[${progress.mkString(",")}]}""")
  }
}
