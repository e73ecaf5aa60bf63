package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.EdgeSource

/** Whole-graph scalar statistics a web link-graph profile needs next to the
  * per-vertex operators: edge reciprocity (how bidirectional is the link
  * structure) and global transitivity (the wedge-closure ratio, the
  * graph-level counterpart of the per-vertex clustering coefficient).
  * Integer counts feed one correctly-rounded IEEE division each, so both
  * replay bit-exactly. Both are single-pass join/aggregate shapes — a
  * self-join on the deduped directed edge set and the existing oriented
  * wedge/triangle counts — nothing iterates. */
object GraphStats {

  /** One row: (n_directed, n_reciprocal, reciprocity) over the deduped
    * directed edge set, self-loops excluded. `n_reciprocal` counts ordered
    * pairs whose reverse is also present (so a mutual pair contributes 2). */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().persist()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val mutual = e.join(rev, Seq("src", "dst"), "left_semi")
    val res = e.agg(count(lit(1)).as("n_directed"))
      .crossJoin(mutual.agg(count(lit(1)).as("n_reciprocal")))
      .select(col("n_directed"), col("n_reciprocal"),
        (col("n_reciprocal").cast("double") / col("n_directed")).as("reciprocity"))
      .localCheckpoint(true)
    e.unpersist()
    res
  }

  /** One row: (n_wedges, n_triangles, transitivity = 3T / wedges) over the
    * canonical undirected simple graph; wedges = sum_v C(deg(v), 2). */
  def transitivity(edges: DataFrame): DataFrame = {
    val e = EdgeSource.canonical(edges).persist()
    val wedges = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .agg(coalesce(sum(col("deg") * (col("deg") - 1)), lit(0L)).as("w2"))
      .select(shiftright(col("w2"), 1).as("n_wedges")) // w2 is even; exact halving
    val res = wedges.crossJoin(Triangles.countAll(e))
      .select(col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          (lit(3L) * col("n_triangles")).cast("double") / col("n_wedges"))
          .otherwise(lit(0.0)).as("transitivity"))
      .localCheckpoint(true)
    e.unpersist()
    res
  }
}
