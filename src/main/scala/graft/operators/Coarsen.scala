package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph coarsening — the host-graph projection every web-scale link
  * pipeline runs before site-level analysis (Common Crawl publishes exactly
  * this artifact as its "host-level webgraph"): collapse the page graph
  * through a page→group mapping (page → host/domain) into a weighted
  * super-graph, weight = number of page edges between the groups. The
  * coarse graph is orders of magnitude smaller (10^12 pages → 10^8 hosts),
  * and the engine's weighted contract (d·w/Σ_out w) makes every ranking
  * operator run on it unchanged — two-level PageRank at web scale is
  * project + PageRank.run on the projection.
  *
  * 100-TB shape: two hash joins against the (small) mapping — broadcast
  * when the mapping fits, shuffle otherwise — then one map-side-combinable
  * count aggregation keyed by group pairs; the result is coarse-graph-sized,
  * not page-graph-sized.
  */
object Coarsen {

  /** (src, dst, weight) super-graph of `edges` under `mapping` (id, grp).
    * Intra-group edges are dropped by default (host self-links dominate raw
    * counts and carry no ranking signal); pass dropIntra = false to keep
    * them as weighted self-loops. */
  def project(edges: DataFrame, mapping: DataFrame, dropIntra: Boolean = true): DataFrame = {
    val m1 = mapping.select(col("id").as("sid"), col("grp").as("gsrc"))
    val m2 = mapping.select(col("id").as("did"), col("grp").as("gdst"))
    val g = edges
      .join(m1, edges("src") === col("sid"))
      .join(m2, edges("dst") === col("did"))
    val f = if (dropIntra) g.where(col("gsrc") =!= col("gdst")) else g
    f.groupBy(col("gsrc").as("src"), col("gdst").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }
}
