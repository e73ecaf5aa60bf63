package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.kernels.Mix

/** Deterministic corpus sampling — the training-data-pipeline staple the
  * reference (a graph library) has no analog for: every large corpus run
  * downsamples by source/language/quality stratum before training.
  *
  * Unlike `DataFrame.sample` (partition-order-dependent RNG: results change
  * under repartitioning, and an external oracle cannot replay them), these
  * sample by KEYED HASH THRESHOLD: keep a row iff
  * mix31(id) < fraction · (2³¹−1). That makes the sample
  *  - deterministic and partitioning-invariant (a pure function of the id),
  *  - stable under corpus growth (a doc's keep/drop never flips when other
  *    docs arrive — the property that makes incremental pipeline reruns
  *    produce supersets, not reshuffles),
  *  - SQL-replayable (the DuckDB oracle evaluates the same inequality),
  *  - nestable: samples at fractions f₁ > f₂ with the same salt are
  *    SUBSETS of each other (the threshold only moves).
  *
  * 100-TB shape: a pure per-row filter — no shuffle, survives predicate
  * pushdown past projections, and composes with partition pruning.
  */
object Sampling {

  /** Keep rows with mix31(idCol) < fraction · P — an exact-threshold
    * deterministic Bernoulli(fraction) sample keyed on `idCol`. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
      salt: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.where(keep(col(idCol), lit(fraction), salt))
  }

  /** Per-stratum fractions (e.g. source → rate): rows in a stratum absent
    * from `fractions` keep at `defaultFraction`. The fractions ride a
    * broadcast join, so the filter stays shuffle-free on the corpus side.
    * Join helper columns are namespaced (`__graft_*`) so a corpus that
    * already carries `stratum`/`fraction` columns passes through intact. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: Long = 42L): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val fr = fractions.toSeq.toDF("__graft_stratum", "__graft_fraction")
    df.join(broadcast(fr), df(strataCol) === col("__graft_stratum"), "left")
      .where(keep(df(idCol), coalesce(col("__graft_fraction"), lit(defaultFraction)), salt))
      .drop("__graft_stratum", "__graft_fraction")
  }

  /** The shared predicate: mix31(id, 0, 2, salt) < fraction · P, with the
    * threshold computed in DOUBLE exactly as the DuckDB oracle computes it. */
  private def keep(id: Column, fraction: Column, salt: Long): Column =
    Mix.mix31(id, lit(0L), lit(2L), salt).cast("double") < fraction * lit(Mix.P.toDouble)
}
