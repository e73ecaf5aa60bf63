package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph ingestion: edge-list scan + dedup + node closure.
  *
  * Mirrors the reference's `importGraph` (src/main.cc:78-112): parse
  * `src,dst` CSV lines (tolerating trailing `\r`), drop duplicate edges
  * (src/main.cc:102-106), and keep every endpoint as a vertex even when it
  * has no out-edges (src/main.cc:98-99; include/grank.h:29-31 requires
  * zero-out-degree nodes to be present in the graph).
  */
object EdgeSource {

  val edgeSchema: StructType =
    StructType(Seq(StructField("src", LongType, false), StructField("dst", LongType, false)))

  /** CSV edge-list reader with reference-import parity. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    dedup(
      spark.read
        .schema("src LONG, dst LONG")
        .option("mode", "DROPMALFORMED")
        .csv(path))

  /** Drop duplicate edges — the algorithms assume deduplicated adjacency
    * (a duplicated successor entry would be counted twice; src/main.cc:102). */
  def dedup(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long")).dropDuplicates("src", "dst")

  /** Vertex closure: every src or dst is a node (id LONG). */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id")).union(edges.select(col("dst").as("id"))).distinct()

  /** Out-degree per vertex with out-degree-0 nodes present (count 0). */
  def outDegrees(edges: DataFrame, vertices: DataFrame): DataFrame =
    vertices.join(
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg")),
      Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))

  /** In-degree per vertex (0 included). */
  def inDegrees(edges: DataFrame, vertices: DataFrame): DataFrame =
    vertices.join(
      edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("indeg")),
      Seq("id"), "left")
      .select(col("id"), coalesce(col("indeg"), lit(0L)).as("indeg"))

  /** Undirected closure: each edge in both directions, self-loops dropped,
    * deduplicated. Used by 2-coloring/CC/LP (pprInternal.h:76-94 walks both
    * successor and predecessor lists). */
  def undirected(edges: DataFrame): DataFrame =
    edges.where(col("src") =!= col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))
        .where(col("src") =!= col("dst")))
      .dropDuplicates("src", "dst")

  /** Canonical undirected edges with src < dst (for triangle counting). */
  def canonical(edges: DataFrame): DataFrame =
    edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
      .dropDuplicates("src", "dst")

  /** Deterministic TPC-H-derived test graph: part->supplier edges from
    * lineitem. Small-world-ish bipartite-with-overlap graph used by the
    * driver-verifiable queries (FIXTURES.md §6). */
  def fromLineitem(spark: SparkSession, sfDir: String): DataFrame =
    dedup(spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst")))
}
