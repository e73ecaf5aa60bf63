package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-rule web-page front-end (BASELINE.json `input_hint`):
  * an Iceberg-shaped table of Common-Crawl-style pages
  *   (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
  * from which the engine extracts its edge table. The reference consumes a
  * CSV edge list (src/main.cc:78-112); at web scale the edge list is itself
  * the product of link extraction over a page corpus, so this module owns:
  *
  *  - [[synthesize]]: a fully deterministic synthetic corpus with a planted
  *    power-law (Zipf-ish in AND out-degree) link graph rendered INTO the
  *    page text — the per-row invariant "byte-identical extracted text per
  *    url" holds across runs by construction and is covered by a hash test.
  *  - [[extractLinks]]: pure column-level link extraction (codegen'd regexp,
  *    no UDF).
  *  - [[edges]]: corpus -> (src, dst) LONG edge table. Vertex ids are
  *    xxhash64(url) — the scale-path choice: no global dictionary join or
  *    sort is needed to assign ids, and results join back to urls through
  *    [[dictionary]]. Collision math (birthday bound n^2/2N, N = 2^64):
  *    ~3e-8 expected colliding pairs at 10^6 urls (negligible), but ~2.7e4
  *    expected colliding pairs at 10^12 urls — each silently merging two
  *    pages into one vertex. So at full web scale the [[dictionary]]-based
  *    collision check (count urls per id, or move to 128-bit ids) is
  *    REQUIRED, not optional, whenever exactness matters; hashing alone is
  *    only exact up to ~10^8 urls (<1 expected collision).
  */
object WebCorpus {

  /** Deterministic synthetic corpus. Out-degree ~ capped power law via
    * inverse-transform on a hashed uniform; link targets skewed toward low
    * page indices (u^2 transform) so high-in-degree hubs exist — the skew
    * the salting path is built for. No rand(): every column is a pure
    * function of (page index, seed). */
  def synthesize(spark: SparkSession, nPages: Long, seed: Long = 42L,
      maxOutDeg: Int = 64): DataFrame = {
    val pages = spark.range(nPages).select(col("id"))
    def u(salt: Int): Column = // uniform (0,1] from (id, seed, salt)
      (pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000L)) + 1) / 1000000.0
    val withDeg = pages.select(
      col("id"),
      least(lit(maxOutDeg),
        greatest(lit(1), floor(pow(u(1), lit(-0.9))))).cast("int").as("outdeg"))

    // planted edges: page i -> floor(nPages * v^2) (skewed to low ids = hubs)
    val links = withDeg
      .select(col("id"), explode(sequence(lit(0), col("outdeg") - 1)).as("pos"))
      .select(col("id"), col("pos"),
        pmod(
          floor(pow((pmod(xxhash64(col("id"), col("pos"), lit(seed), lit(2)),
            lit(1000000L)) + 1) / 1000000.0, lit(2.0)) * nPages).cast("long"),
          lit(nPages)).as("dst"))

    val linkArr = links
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), urlOf(col("dst"), seed).as("u")))).as("ps"))
      .select(col("id"), transform(col("ps"), p => p.getField("u")).as("linkUrls"))

    val langs = array(Seq("en", "en", "en", "en", "en", "en", "en", "de", "fr", "it").map(lit): _*)
    pages.join(linkArr, Seq("id"), "left")
      .select(
        col("id"),
        urlOf(col("id"), seed).as("url"),
        timestamp_seconds(lit(1700000000L) + col("id") * 7).as("warc_ts"),
        coalesce(col("linkUrls"), array().cast("array<string>")).as("linkUrls"))
      .select(
        col("url"), col("warc_ts"),
        concat(
          lit("Graft synthetic page "), col("id").cast("string"), lit(". "),
          lit("Token stream: "),
          concat_ws(" ", transform(sequence(lit(0), pmod(col("id"), lit(7)) + 3),
            i => concat(lit("w"), pmod(xxhash64(col("url"), i), lit(997)).cast("string")))),
          lit(". Links: "),
          concat_ws(" ", transform(col("linkUrls"),
            u => concat(lit("<a href=\""), u, lit("\">out</a>")))),
          lit(" end.")).as("text"),
        element_at(langs, (pmod(xxhash64(col("url"), lit(seed), lit(3)), lit(10)) + 1).cast("int")).as("lang"))
      .select(col("url"), col("warc_ts"),
        encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")), "UTF-8").as("html"),
        col("text"), col("lang"))
  }

  private def urlOf(id: Column, seed: Long): Column =
    concat(lit("https://site-"), pmod(xxhash64(id, lit(seed), lit(0)), lit(97)).cast("string"),
      lit(".example/p/"), id.cast("string"))

  /** Pure link extraction: text -> array of href urls. Column expression
    * (regexp_extract_all), stays inside whole-stage codegen. */
  def extractLinks(text: Column): Column =
    regexp_extract_all(text, lit("href=\"([^\"]+)\""), lit(1))

  /** 64-bit stable vertex id of a url. */
  def urlId(url: Column): Column = xxhash64(url)

  /** url -> id dictionary (for joining results back to urls; the engine
    * itself never needs it to ASSIGN ids). */
  def dictionary(pages: DataFrame): DataFrame =
    pages.select(col("url"), urlId(col("url")).as("id")).distinct()

  /** The dictionary-based vertex-id collision audit the class doc marks as
    * REQUIRED above ~10^8 urls: every id claimed by MORE than one distinct
    * url, with the colliding-url count and the minimum url as a
    * deterministic witness. Empty result = hashed ids are exact for this
    * corpus. Scale shape: one distinct + one 8-byte-key groupBy over the
    * url set — the same cost class as building [[dictionary]]; a collided
    * id is surfaced, never silently merged. `idOf` is injectable so tests
    * (and the driver oracle) can force collisions with a weak hash. */
  def idCollisionAudit(urls: DataFrame,
      idOf: Column => Column = urlId): DataFrame =
    urls.select(col("url")).distinct()
      .select(col("url"), idOf(col("url")).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_urls"), min(col("url")).as("first_url"))
      .where(col("n_urls") > 1)

  /** Edge table from a page corpus: explode extracted links, hash both
    * endpoints, dedup (reference import drops duplicate edges,
    * src/main.cc:102-106). */
  def edges(pages: DataFrame): DataFrame =
    EdgeSource.dedup(
      pages.select(urlId(col("url")).as("src"),
        explode(extractLinks(col("text"))).as("dstUrl"))
        .select(col("src"), urlId(col("dstUrl")).as("dst")))

  /** Vertex closure INCLUDING pages with no out-links (reference requires
    * zero-out-degree nodes present: include/grank.h:29-31). Link targets
    * outside the corpus (dangling urls) become vertices too, matching the
    * reference import's `graph[n2]` touch (src/main.cc:98-99). */
  def vertices(pages: DataFrame): DataFrame =
    pages.select(urlId(col("url")).as("id"))
      .union(edges(pages).select(col("dst").as("id")))
      .distinct()
}
