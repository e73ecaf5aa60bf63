package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Multimodal, Similarity, TextAnalysis}

class FunctionsSpec extends AnyFunSuite with GraphFixtures {

  private def docs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- text analysis ------------------------------------------------------
  test("tokenCount / subwordCount") {
    val d = docs(Seq((1L, "Hello, wonderful world! 42 times."), (2L, ""), (3L, "a b c")))
    val got = d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.subwordCount(col("text")).as("sw"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got(1L)._1 == 5) // hello wonderful world 42 times
    assert(got(2L)._1 == 0 && got(2L)._2 == 0)
    assert(got(3L)._1 == 3 && got(3L)._2 == 3)
    // subwords: hello(2) wonderful(3) world(2) 42(1) times(2) + , ! . = 13
    assert(got(1L)._2 == 13)
  }

  test("langId picks the language whose stopwords dominate; 'und' when none") {
    val d = docs(Seq(
      (1L, "the cat and the dog was in the house for the winter and it was warm"),
      (2L, "der Hund und die Katze sind nicht mit dem Mann auf der Strasse"),
      (3L, "le chat est dans la maison avec les enfants pour le diner"),
      (4L, "xyzzy plugh qwerty")))
    val got = d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("qualityScore ranks clean prose above junk") {
    val clean = "The quick brown fox jumps over the lazy dog and it was a fine day in the park. " * 5
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( )))) ;;;; @@@@ ####"
    val d = docs(Seq((1L, clean), (2L, junk)))
    val got = d.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) + 0.3, s"clean=${got(1L)} junk=${got(2L)}")
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fingerprint: exact hash flags identity; min-shingle hash survives a far-away edit") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4 + "zzzz unique minimal window"
    val d = docs(Seq((1L, base), (2L, base), (3L, base.replace("alpha", "ALPHA-EDIT"))))
    val got = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.exact_hash"), col("fp.min_shingle_hash"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == got(2L))
    assert(got(1L)._1 != got(3L)._1)
  }

  // ---- dedup family --------------------------------------------------------
  private val dupCorpus = Seq(
    (1L, "spark streaming joins aggregate window state checkpoint shuffle partition codegen catalyst tungsten"),
    (2L, "spark streaming joins aggregate window state checkpoint shuffle partition codegen catalyst tungsten"), // exact dup of 1
    (3L, "spark streaming joins aggregate window state checkpoint shuffle partition codegen catalyst EDITED"), // near dup of 1
    (4L, "completely different content about cooking pasta with tomatoes basil garlic olive oil and parmesan cheese"),
    (5L, "entirely unrelated text on alpine skiing snow conditions avalanche safety and mountain weather forecasts"))

  test("exact dedup keeps min id per identical text") {
    val got = Dedup.exact(docs(dupCorpus)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2L) // ids 1,2 collapse onto keep_id 1 with 2 copies
    assert(got.keySet == Set(1L, 3L, 4L, 5L))
  }

  test("exact dedup: escalation path survives forced h1 collisions (exact result regardless)") {
    // h1 = constant: EVERY text lands in one bucket; the independent h2
    // disagrees, so the full-text re-group must reproduce the exact answer
    val got = Dedup.exactWithHashes(docs(dupCorpus), "doc_id", "text",
      lit(7L), xxhash64(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // and the production hash pair gives the same answer
    val prod = Dedup.exact(docs(dupCorpus)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prod == got)
  }

  test("minhash LSH finds exact+near dup pairs and nothing across topics") {
    val got = Dedup.minhashLsh(docs(dupCorpus), "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L))
  }

  test("mix-hashed minhash LSH separates at threshold 0.7 with the exact verify value") {
    val longBody = (0 until 60).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, longBody), (2L, longBody + " graft near duplicate pad tail"), // 58/63 shared shingles
      (3L, "tiny doc here"), (4L, "tiny doc here graft near duplicate pad tail")) // 1/6
    val got = Dedup.minhashLshMix(docs(corpus), "doc_id", "text", threshold = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set((1L, 2L)), s"got $got")
    assert(got((1L, 2L)) == 58.0 / 63.0)
  }

  test("ngram jaccard (exact inverted index) agrees on the planted pairs") {
    val got = Dedup.ngramJaccard(docs(dupCorpus), "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got.contains((1L, 3L)))
    assert(!got.keySet.exists(p => p._1 >= 4L))
  }

  test("ngram jaccard hot-shingle cap: flood pairs vanish when capped, rare pairs unchanged") {
    // 12 identical flood docs share ONLY hot shingles (df = 12); the rare
    // pair (1, 2) shares doc-specific shingles (df = 2)
    val flood = (100L until 112L).map(i => (i, "zq hot flood alpha beta"))
    val corpus = docs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight")) ++ flood)
    def pairs(cap: Int) =
      Dedup.ngramJaccard(corpus, "doc_id", "text", threshold = 0.7, maxShingleFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.contains((1L, 2L)))
    assert(uncapped.count(p => p._1 >= 100L) == 12 * 11 / 2) // flood all-pairs
    val capped = pairs(10) // cap < flood df, >= rare df
    assert(capped == Set((1L, 2L)), s"got $capped") // flood dropped, rare kept
  }

  test("simhash near-dup: identical -> hamming 0; near -> small; cross-topic absent") {
    // simhash needs token mass: short texts flip many bits on one edit, so
    // the near-dup fixture repeats its body (realistic doc length)
    // 13 distinct tokens (odd -> per-bit sums never 0) repeated 20x; a
    // single-occurrence edit then moves each bit sum by <=2 of >=20: no flip
    val body = dupCorpus(0)._2 + " optimizer "
    val long1 = (body * 20).trim
    val simCorpus = Seq(
      (1L, long1), (2L, long1),
      (3L, long1.replaceFirst("tungsten", "EDITED")),
      (4L, (dupCorpus(3)._2 + " ") * 20), (5L, (dupCorpus(4)._2 + " ") * 20))
    val got = Dedup.simhashNearDup(docs(simCorpus), "doc_id", "text", maxHamming = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((1L, 2L)) == 0)
    assert(got.contains((1L, 3L)))
    assert(!got.keySet.exists(p => p._1 >= 4L))
  }

  // ---- embeddings ----------------------------------------------------------
  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine / dot column math matches local computation") {
    val d = vecs(Seq((1L, Seq(1f, 0f, 2f)), (2L, Seq(2f, 1f, 0f))))
    val got = d.as("a").crossJoin(d.as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(_.getDouble(0))
    val want = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(got.exists(v => math.abs(v - want) < 1e-7))
    assert(got.count(v => math.abs(v - 1.0) < 1e-7) == 2) // self-cosine
  }

  test("ANN recall floors on the deterministic synthetic corpus (ANNGRID anchors)") {
    // the BASELINE.md ANNGRID table's measured points, asserted as floors
    // just below the deterministic values (uniform random embeddings — the
    // HARD case for bucketed ANN: near-orthogonal neighbors; recall knobs
    // still must move the needle in the documented direction)
    val emb = graft.sources.Synth.embeddings(spark, 500)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .localCheckpoint(true)
    val q = emb.where(col("vec_id") < 40)
    val exact = Similarity.bruteForceTopK(q, emb, k = 10).localCheckpoint(true)
    def recall(approx: org.apache.spark.sql.DataFrame, m: String): Double =
      Similarity.recallAtK(approx, exact, k = 10, method = m)
        .collect()(0).getAs[Double]("avg_recall")
    val lsh8 = recall(Similarity.lshTopK(q, emb, k = 10, planes = 8, dims = 64), "lsh")
    val lsh12 = recall(Similarity.lshTopK(q, emb, k = 10, planes = 12, dims = 64), "lsh")
    val ivf2 = recall(Similarity.ivfTopK(q, emb, k = 10, nCells = 16, nProbe = 2, dims = 64), "ivf")
    val ivf8 = recall(Similarity.ivfTopK(q, emb, k = 10, nCells = 16, nProbe = 8, dims = 64), "ivf")
    assert(lsh8 > 0.2, s"lsh planes=8 recall $lsh8")
    assert(lsh8 > lsh12, s"fewer planes must raise recall: $lsh8 vs $lsh12") // bigger buckets
    assert(ivf8 > 0.5, s"ivf nProbe=8/16 recall $ivf8")
    assert(ivf8 > ivf2, s"more probes must raise recall: $ivf8 vs $ivf2")
  }

  test("brute-force cosine top-k returns the true nearest neighbors") {
    val base = Seq(1f, 0f, 0f, 0f)
    val rows = Seq(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f, 0f),
      3L -> Seq(0f, 1f, 0f, 0f), 4L -> Seq(0f, 0f, 1f, 0f),
      5L -> Seq(0.95f, 0f, 0.05f, 0f))
    val d = vecs(rows)
    val got = Similarity.bruteForceTopK(d.where(col("vec_id") === 1), d, k = 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(got == Set(5L, 2L))
  }

  test("unigramLogprob: hand-computed uniform corpus; rare tokens score lower") {
    val d = docs(Seq((1L, "a a b"), (2L, "b")))
    val got = TextAnalysis.unigramLogprob(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // N = 4, c(a) = c(b) = 2 -> every token has p = 0.5
    val half = math.round(math.log(0.5) * 1e12) / 1e12
    assert(got(1L) == ((3L, ((half * 3 * 1e12).round / 1e12) / 3)))
    assert(got(2L) == ((1L, half)))
    // a doc full of rare tokens scores below one full of common tokens
    val d2 = docs(Seq((1L, "x x x x x x x x"), (2L, "zq wq")))
    val got2 = TextAnalysis.unigramLogprob(d2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got2(2L) < got2(1L))
  }

  test("unigramLogprob: planted hot token (in every doc, many times) — skew-safe plan") {
    // Zipf-head fixture (VERDICT r5 #2): one token appears 50x in each of
    // 2000 docs. Pre-aggregation bounds the frequency-join input at ONE row
    // per (doc, tok) — the occurrence-level join would route 100k rows
    // through the single "the" key here (billions at corpus scale). Checks
    // both the weighted-mean math and that the join input is (doc, tok)
    // distinct, not occurrences.
    val s = spark
    import s.implicits._
    val hot = (1 to 50).map(_ => "the").mkString(" ")
    val d = s.range(2000).select(col("id").as("doc_id"),
      concat(lit(hot + " "), lit("tok"), col("id") % 7).as("text"))
    val got = TextAnalysis.unigramLogprob(d)
    assert(got.count() == 2000)
    val row = got.where(col("doc_id") === 3).collect()(0)
    assert(row.getLong(1) == 51) // 50 hot + 1 rare
    // hand-check: N = 2000*51, c(the) = 100000, c(tok3) = ceil(2000/7 docs)
    val n = 2000.0 * 51
    val lpHot = math.round(math.log(100000.0 / n) * 1e12)
    val nTok3 = (0 until 2000).count(_ % 7 == 3)
    val lpRare = math.round(math.log(nTok3 / n) * 1e12)
    val want = ((50L * lpHot + lpRare) / 1e12) / 51.0
    assert(row.getDouble(2) == want)
  }

  test("sampleByHash: deterministic, partitioning-invariant, nested thresholds are subsets") {
    val s = spark
    import s.implicits._
    val d = s.range(10000).select(col("id").as("doc_id"))
    def ids(f: Double, df: org.apache.spark.sql.DataFrame = d): Set[Long] =
      graft.functions.Sampling.sampleByHash(df, "doc_id", f)
        .collect().map(_.getLong(0)).toSet
    val s25 = ids(0.25)
    // deterministic and partitioning-invariant: same ids from a repartition
    assert(ids(0.25, d.repartition(17)) == s25)
    // rate lands near the target (hash-threshold Bernoulli, 10k draws)
    assert(math.abs(s25.size / 10000.0 - 0.25) < 0.02, s"rate ${s25.size}")
    // nested: a 10% sample is a subset of the 25% one (threshold only moves)
    val s10 = ids(0.10)
    assert(s10.subsetOf(s25))
    assert(ids(0.0).isEmpty && ids(1.0).size == 10000)
  }

  test("stratifiedSample: per-stratum rates honored; absent strata use the default") {
    val s = spark
    import s.implicits._
    val d = s.range(12000).select(col("id").as("doc_id"),
      concat(lit("src"), col("id") % 3).as("source"))
    val got = graft.functions.Sampling.stratifiedSample(d, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.2), defaultFraction = 0.0)
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 4000) // fraction 1.0 keeps everything
    assert(math.abs(bySrc("src1") / 4000.0 - 0.2) < 0.03)
    assert(!bySrc.contains("src2")) // default 0.0 drops the stratum
    // schema passes through unchanged (join helper columns dropped)
    assert(got.columns.toSeq == Seq("doc_id", "source"))
  }

  test("tfidfTopTerms: hand-computed scores; corpus-wide tokens get idf 0") {
    // doc 1: "a a b", doc 2: "a c" — 'a' is in both docs (idf = ln(2/2) = 0),
    // 'b' and 'c' in one (idf = ln 2)
    val d = docs(Seq((1L, "a a b"), (2L, "a c")))
    val got = TextAnalysis.tfidfTopTerms(d, topN = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val ln2 = math.round(math.log(2.0) * 1e12) / 1e12
    assert(got((1L, "b")) == ((ln2, 1L))) // tf 1 · ln2 beats a's 0
    assert(got((1L, "a")) == ((0.0, 2L)))
    assert(got((2L, "c")) == ((ln2, 1L)))
    assert(got((2L, "a")) == ((0.0, 2L)))
  }

  test("pmiBigrams: perfectly-collocated pair scores ln(Nu²/(Nb·c·c)); independence near 0") {
    // 'x y' always together (perfect collocation); 'a'/'b' mixed freely
    val d = docs(Seq((1L, "x y a b a"), (2L, "x y b a b"), (3L, "x y a a b")))
    val got = TextAnalysis.pmiBigrams(d, minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // counts: Nu = 15 tokens, Nb = 12 bigrams, c(x)=c(y)=3, c_xy=3
    val want = math.round(math.log((3.0 * 15 * 15) / (12.0 * 3 * 3)) * 1e12) / 1e12
    assert(got((("x", "y"))) == want)
    // the top pair IS (x, y) — collocation dominates the mixed pairs
    val top = TextAnalysis.pmiBigrams(d, minCount = 2, topN = 1)
      .collect()(0)
    assert((top.getString(0), top.getString(1)) == (("x", "y")))
  }

  test("repetitionStats: closed forms — all-same, all-distinct, boilerplate loop, empty") {
    val d = docs(Seq(
      (1L, "x x x x"),          // dup ratio 3/4; top bigram (x,x) 3/3
      (2L, "a b c d"),          // dup 0; every bigram unique -> 1/3
      (3L, "ab cd ab cd ab"),   // dup 3/5; bigrams: (ab,cd)x2 (cd,ab)x2 -> 2/4
      (4L, ""),                 // 0 tokens -> zeros
      (5L, "solo")))            // 1 token -> no bigrams
    val got = TextAnalysis.repetitionStats(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 3.0 / 4, 1.0)))
    assert(got(2L) == ((4L, 0.0, 1.0 / 3)))
    assert(got(3L) == ((5L, 3.0 / 5, 2.0 / 4)))
    assert(got(4L) == ((0L, 0.0, 0.0)))
    assert(got(5L) == ((1L, 0.0, 0.0)))
  }

  test("clusters: transitive chains merge through the middle; pair-free docs self-canonicalize") {
    val s = spark
    import s.implicits._
    // pairs a~b, b~c (a~c absent — similarity is not transitive), plus d~e
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val universe = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val got = Dedup.clusters(pairs, universe)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("LSH top-k achieves high recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(4)
    def jitter(base: Array[Float]) = base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val c1 = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val c2 = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val rows = (0L until 30L).map(i => i -> jitter(if (i % 2 == 0) c1 else c2))
    val d = vecs(rows).persist()
    val q = d.where(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(q, d, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, d, 5, planes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("IVF top-k: high recall vs brute force on clustered vectors; deterministic across runs") {
    val rnd = new scala.util.Random(4)
    def jitter(base: Array[Float]) = base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val c1 = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val c2 = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val rows = (0L until 30L).map(i => i -> jitter(if (i % 2 == 0) c1 else c2))
    val d = vecs(rows).persist()
    val q = d.where(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(q, d, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 cells / probe 2: the Lloyd step should pull two centroids onto the
    // two planted clusters, so probing the best cells recovers neighbors
    def run() = Similarity.ivfTopK(q, d, 5, nCells = 4, nProbe = 2, dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = run()
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
    assert(run() == approx) // training + assignment fully deterministic
    d.unpersist()
  }

  test("recallAtK: exact-vs-exact is 1.0; planted misses are measured exactly") {
    val rows = Seq(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f), 3L -> Seq(0.8f, 0.2f, 0f),
      4L -> Seq(0f, 1f, 0f), 5L -> Seq(0f, 0.9f, 0.1f))
    val d = vecs(rows)
    val q = d.where(col("vec_id") <= 2)
    val exact = Similarity.bruteForceTopK(q, d, k = 2).localCheckpoint(true)
    val self = Similarity.recallAtK(exact, exact, k = 2, method = "self").head()
    assert(self.getString(0) == "self" && self.getLong(1) == 2L && self.getLong(2) == 4L)
    assert(self.getDouble(3) == 1.0 && self.getDouble(4) == 1.0)
    // drop seed 1's rows entirely: avg = 2/4, min = 0 — exact integer math
    val miss = Similarity.recallAtK(exact.where(col("seed") =!= 1L), exact,
      k = 2, method = "m").head()
    assert(miss.getLong(2) == 2L && miss.getDouble(3) == 0.5 && miss.getDouble(4) == 0.0)
  }

  test("IVF training: grid-summed Lloyd step is partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 24L).map(i => i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    val d1 = vecs(rows).repartition(1)
    val d8 = vecs(rows).repartition(8)
    val a = Similarity.ivfTrain(d1, nCells = 3, dims = 8)
    val b = Similarity.ivfTrain(d8, nCells = 3, dims = 8)
    assert(a == b) // exact fixed-point sums: addend order can't matter
  }

  test("literal-plane signature is bit-identical to the expression form") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map(i => i -> Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val d = vecs(rows)
    val diff = d.select(
      Similarity.hyperplaneSignature(col("embedding"), 12, 42L).as("a"),
      Similarity.hyperplaneSignatureLit(col("embedding"), 12, 16, 42L).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("embedding near-dup finds planted duplicates via LSH buckets") {
    val rnd = new scala.util.Random(9)
    val base = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val rows = Seq(
      1L -> base.toSeq, 2L -> base.map(_ * 1.001f).toSeq, // near-identical direction
      3L -> Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq,
      4L -> Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)
    val got = Dedup.embeddingNearDup(vecs(rows), "vec_id", "embedding",
      threshold = 0.99, planes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(got.size < 4)
  }

  // ---- multimodal plumbing --------------------------------------------------
  test("multimodal: synthesize -> decode roundtrip preserves planted dimensions") {
    val media = Multimodal.synthesize(spark, 50).persist()
    assert(media.schema.fields.map(_.name).toSeq ==
      Seq("media_id", "kind", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = Multimodal.decodeMeta(media)
    assert(meta.count() == 50)
    val bad = meta.where(col("width") < 16 || col("width") > 528 ||
      col("height") < 16 || col("height") > 528 ||
      col("channels") < 1 || col("channels") > 3 || col("n_bytes") < 37).count()
    assert(bad == 0)
    // deterministic across runs
    val meta2 = Multimodal.decodeMeta(Multimodal.synthesize(spark, 50))
    assert(meta.exceptAll(meta2).count() == 0)
  }

  test("multimodal: features are a normalized 16-bin histogram; frames + resize shapes hold") {
    val media = Multimodal.synthesize(spark, 30).persist()
    val feats = Multimodal.extractFeatures(media)
    val sums = feats.select(aggregate(col("features"), lit(0.0), (a, v) => a + v).as("s"))
      .collect().map(_.getDouble(0))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() > 0)
    assert(frames.select(size(col("frames"))).collect().forall(_.getInt(0) == 4))
    val resized = Multimodal.decodeMeta(
      Multimodal.resize(media, 2).join(media.select("media_id", "kind"), "media_id"))
    val orig = Multimodal.decodeMeta(media)
    val j = orig.as("o").join(resized.as("r"), Seq("media_id"))
      .where(col("r.width") =!= floor(col("o.width") / 2).cast("int") &&
        col("r.width") =!= lit(1))
    assert(j.count() == 0)
  }
}
