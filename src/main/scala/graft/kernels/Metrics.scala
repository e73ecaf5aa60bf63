package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance / similarity kernels of the reference, re-expressed relationally.
  *
  *  - norm1   : L1 distance of sparse score vectors
  *              (include/internal/pprInternal.h:148-165)
  *  - jaccard : set similarity of top-K node sets
  *              (include/internal/pprInternal.h:174-186)
  *  - kendall : tau-b rank correlation with tie handling
  *              (include/internal/kendall.h:22-180)
  */
object Metrics {

  /** Per-seed L1 distance between two score relations (seed, node, score).
    * Unmapped nodes count as 0.0 on either side, exactly the two loops of
    * pprInternal.h:152-162. Formulated as union(a, -b) -> per-(seed,node)
    * sum -> per-seed sum(abs): ONE exchange over |a|+|b| rows instead of a
    * full-outer join's two — this runs once per superstep in every
    * tolerance-driven loop, so the exchange count matters. Returns
    * (seed, norm1). */
  def norm1PerSeed(a: DataFrame, b: DataFrame): DataFrame = {
    a.select(col("seed"), col("node"), col("score"))
      .union(b.select(col("seed"), col("node"), (-col("score")).as("score")))
      .groupBy(col("seed"), col("node"))
      .agg(sum(col("score")).as("d"))
      .groupBy(col("seed"))
      .agg(sum(abs(col("d"))).as("norm1"))
  }

  /** max over seeds of norm1PerSeed — the convergence scalar of the driver
    * loop (include/grank.h:92,123: `maxDiff = max(maxDiff, norm1(...))`). */
  def maxNorm1(a: DataFrame, b: DataFrame): Double = {
    val row = norm1PerSeed(a, b).agg(max(col("norm1"))).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Per-seed Jaccard similarity of two node-set relations (seed, node).
    * A seed present in `seeds` but empty on both sides scores 1.0
    * (pprInternal.h:176-177); else |inter| / (|a| + |b| - |inter|). */
  def jaccardPerSeed(a: DataFrame, b: DataFrame, seeds: Option[DataFrame] = None): DataFrame = {
    val ca = a.groupBy("seed").agg(count(lit(1)).as("na"))
    val cb = b.groupBy("seed").agg(count(lit(1)).as("nb"))
    val ci = a.select("seed", "node")
      .join(b.select("seed", "node"), Seq("seed", "node"))
      .groupBy("seed").agg(count(lit(1)).as("ni"))
    val universe = seeds match {
      case Some(s) => s.select(col("id").as("seed"))
      case None    => ca.select("seed").union(cb.select("seed")).distinct()
    }
    universe
      .join(ca, Seq("seed"), "left")
      .join(cb, Seq("seed"), "left")
      .join(ci, Seq("seed"), "left")
      .select(
        col("seed"),
        when(coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) === 0, lit(1.0))
          .otherwise(
            coalesce(col("ni"), lit(0L)).cast("double") /
              (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) -
                coalesce(col("ni"), lit(0L))).cast("double"))
          .as("jaccard"))
  }

  /** Kendall tau-b over paired score vectors, with the reference's tie and
    * degenerate-case semantics (kendall.h:165-179): if either variable is
    * all-ties the denominator is 0 — return 1.0 when BOTH are all-ties,
    * else 0.0. O(n^2) pair counting — inputs are per-seed top-K baskets
    * (K <= a few hundred, benchmarkAlgorithm.h:116-126), so the reference's
    * merge-sort inversion count (kendall.h:86-146) is unnecessary. */
  def kendallTauB(xs: Array[Double], ys: Array[Double]): Double = {
    require(xs.length == ys.length, "kendall inputs must pair up")
    val n = xs.length
    if (n == 0) return 1.0
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val dx = java.lang.Double.compare(xs(i), xs(j))
        val dy = java.lang.Double.compare(ys(i), ys(j))
        if (dx == 0 && dy == 0) () // tied in both: contributes to neither factor
        else if (dx == 0) tx += 1
        else if (dy == 0) ty += 1
        else if (dx == dy) c += 1
        else d += 1
        j += 1
      }
      i += 1
    }
    val fx = c + d + ty // n0 - n1: pairs not tied in x
    val fy = c + d + tx // n0 - n2: pairs not tied in y
    if (fx == 0L || fy == 0L) {
      if ((fx == 0L) == (fy == 0L)) 1.0 else 0.0
    } else {
      (c - d).toDouble / math.sqrt(fx.toDouble * fy.toDouble)
    }
  }

  /** Per-seed Kendall tau-b of a relation (seed, x, y). Pairs are collected
    * per seed (bounded by K) and correlated locally. Returns (seed, kendall). */
  def kendallPerSeed(pairs: DataFrame): DataFrame = {
    val tauUdf = udf { (xs: Seq[Double], ys: Seq[Double]) =>
      kendallTauB(xs.toArray, ys.toArray)
    }
    pairs
      .groupBy("seed")
      .agg(collect_list(col("x")).as("xs"), collect_list(col("y")).as("ys"))
      .select(col("seed"), tauUdf(col("xs"), col("ys")).as("kendall"))
  }
}
