package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.kernels.Metrics

/** Per-superstep metrics row (checkpoint manifest + BENCH evidence). */
final case class IterMetrics(iteration: Int, maxDiff: Double, rows: Long, wallMs: Long)

/** Superstep-boundary snapshots: state parquet + a JSON manifest carrying
  * iteration number, per-partition file lineage (name/bytes), row count,
  * convergence value, and wall-clock — the north rule's "resumable from
  * checkpoint with per-partition lineage + metrics".
  *
  * Layout: `<dir>/iter_NNNNNN/{state.parquet, manifest.json}`.
  * (Iceberg-shaped: the reference sandbox ships no Iceberg runtime jar, so
  * the snapshot-per-directory + manifest layout stands in for Iceberg
  * snapshots behind this one interface — SURVEY.md §7.1.)
  */
final class CheckpointManager(dir: String) {

  private def snapDir(iter: Int): String = f"$dir/iter_$iter%06d"

  def save(state: DataFrame, iter: Int, m: IterMetrics, history: Seq[IterMetrics]): Unit = {
    val d = snapDir(iter)
    state.write.mode("overwrite").parquet(s"$d/state.parquet")
    val parts = {
      val p = new java.io.File(s"$d/state.parquet")
      Option(p.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-"))
        .sortBy(_.getName)
        .map(f => s"""{"file":"${f.getName}","bytes":${f.length()}}""")
        .mkString("[", ",", "]")
    }
    // tolerance < 0 runs record maxDiff = NaN, which is not valid JSON
    def num(d: Double): String = if (d.isNaN || d.isInfinite) "null" else d.toString
    val hist = history
      .map(h => s"""{"iteration":${h.iteration},"maxDiff":${num(h.maxDiff)},"rows":${h.rows},"wallMs":${h.wallMs}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"iteration":$iter,"rows":${m.rows},"maxDiff":${num(m.maxDiff)},"wallMs":${m.wallMs},
         |"partitions":$parts,"history":$hist}""".stripMargin.replace("\n", "")
    Files.createDirectories(Paths.get(d))
    Files.writeString(Paths.get(s"$d/manifest.json"), json)
    // commit marker written last: a crash mid-snapshot leaves no _SUCCESS
    Files.writeString(Paths.get(s"$d/_COMMITTED"), "ok")
  }

  /** Iterations with a committed snapshot, ascending. */
  def committed(): Seq[Int] = {
    val root = new java.io.File(dir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("iter_") &&
        new java.io.File(f, "_COMMITTED").exists())
      .map(_.getName.stripPrefix("iter_").toInt)
      .sorted.toSeq
  }

  def load(spark: SparkSession, iter: Int): DataFrame =
    spark.read.parquet(s"${snapDir(iter)}/state.parquet")

  def latest(spark: SparkSession): Option[(Int, DataFrame)] =
    committed().lastOption.map(i => (i, load(spark, i)))
}

/** The one driver loop every iterative operator instantiates (SURVEY.md §7.1):
  * superstep -> convergence scalar -> lineage cut -> optional checkpoint.
  *
  * Loop contract mirrors include/grank.h:86-92: `maxDiff` starts at
  * `tolerance` so the loop always runs at least once; a NEGATIVE tolerance
  * means "never converge early" (include/grank.h:56-57) and skips the
  * norm1 job entirely.
  */
object IterativeEngine {

  final case class Result(state: DataFrame, history: Vector[IterMetrics])

  /** Drop the cached blocks behind a localCheckpoint'ed frame (safe only
    * once nothing will read it again — checkpointed lineage can NOT be
    * recomputed). Shared with the MC walk loop, whose per-batch
    * accumulator re-checkpoints have the same stale-block-set hazard. */
  private[operators] def freeCheckpointBlocks(df: DataFrame): Unit =
    try {
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ =>
      }
    } catch { case _: Throwable => () }

  def run(
      init: DataFrame,
      superstep: (DataFrame, Int) => DataFrame,
      maxIterations: Int,
      tolerance: Double,
      checkpointEvery: Int = 0,
      checkpoint: Option[CheckpointManager] = None,
      resume: Boolean = false,
      lineageCutEvery: Int = 1,
      convergenceWindow: Int = 1): Result =
    graft.kernels.IterTuning.withoutRuntimeFilters(init.sparkSession) {
      runInner(init, superstep, maxIterations, tolerance, checkpointEvery,
        checkpoint, resume, lineageCutEvery, convergenceWindow)
    }

  private def runInner(
      init: DataFrame,
      superstep: (DataFrame, Int) => DataFrame,
      maxIterations: Int,
      tolerance: Double,
      checkpointEvery: Int,
      checkpoint: Option[CheckpointManager],
      resume: Boolean,
      lineageCutEvery: Int,
      convergenceWindow: Int): Result = {
    val spark = init.sparkSession
    var startIter = 0
    var state = init
    if (resume) {
      checkpoint.flatMap(_.latest(spark)).foreach { case (i, df) =>
        startIter = i; state = df
      }
    }
    // Materialization policy. lineageCutEvery = 1: localCheckpoint every
    // superstep (bounded plan depth, but the LogicalRDD forgets its output
    // partitioning, so the next gather join re-shuffles the state).
    // lineageCutEvery = N > 1: persist-chain — the state keeps its plan and
    // therefore its hash(seed) output partitioning (the next join inserts
    // NO state-side Exchange); lineage is only cut (localCheckpoint) every
    // N supersteps to keep analysis cost bounded.
    var persisted = List.empty[DataFrame]
    def materialize(df: DataFrame, iter: Int): DataFrame =
      if (lineageCutEvery <= 1 || (iter + 1) % lineageCutEvery == 0) {
        val c = df.localCheckpoint(true)
        persisted.foreach(_.unpersist(false)); persisted = Nil
        c
      } else {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count() // materialize now so wallMs measures this superstep only
        persisted ::= p
        p
      }
    // init: materialize + truncate lineage (iterative-DataFrame failure
    // mode #1: per-iteration plan nesting makes analysis cost quadratic)
    state = state.localCheckpoint(true)
    var history = Vector.empty[IterMetrics]
    var i = startIter
    // convergence over a window of W recent diffs, all initialized to
    // `tolerance` — the reference's two-slot maxDiff for the partitioned
    // schedule (include/grank.h:86-92): no slot may declare victory before
    // its partition has run at least once. W = 1 is the synchronous rule.
    var recent = Vector.fill(math.max(convergenceWindow, 1))(tolerance)
    var maxDiff = tolerance
    val debugTiming = sys.env.get("SPARK_GRAFT_ITER_DEBUG").contains("1")
    // measurement hook (guide §1.2 / OPTIMIZATION round evidence): when
    // SPARK_GRAFT_EXPLAIN_DIR is set, the FIRST superstep's formatted plan
    // is written to <dir>/<job description>_superstep.txt — iterative
    // operators' returned frames are checkpoint scans, so the per-superstep
    // plan is the one that carries the Exchange/join-strategy evidence.
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    while (i < maxIterations && (tolerance < 0 || recent.max >= tolerance)) {
      val t0 = System.nanoTime()
      val stepDf = superstep(state, i)
      if (i == startIter) explainDir.foreach { d =>
        val label = Option(spark.sparkContext.getLocalProperty("spark.job.description"))
          .getOrElse("iterative").replaceAll("[^A-Za-z0-9_.-]", "_")
        new java.io.File(d).mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/${label}_superstep.txt"),
          stepDf.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      val next = materialize(stepDf, i)
      val tMat = System.nanoTime()
      maxDiff = if (tolerance < 0) Double.NaN else Metrics.maxNorm1(state, next)
      val tNorm = System.nanoTime()
      if (tolerance >= 0) recent = recent.tail :+ maxDiff
      val needRows = checkpoint.isDefined || tolerance >= 0
      val rows = if (needRows) next.count() else -1L
      if (debugTiming)
        println(s"ITERDEBUG it=$i mat=${(tMat - t0) / 1000000}ms norm=${(tNorm - tMat) / 1000000}ms " +
          s"count=${(System.nanoTime() - tNorm) / 1000000}ms")
      val wallMs = (System.nanoTime() - t0) / 1000000
      // the previous state's checkpoint blocks are unreachable from here on;
      // free them NOW instead of waiting for the ContextCleaner (otherwise
      // |V|*L-row block sets pile up per iteration until a GC storm).
      // (persist-chain states are freed at the next lineage cut instead —
      // a later block eviction may need to recompute through them.)
      if (lineageCutEvery <= 1) freeCheckpointBlocks(state)
      state = next
      i += 1
      val m = IterMetrics(i, maxDiff, rows, wallMs)
      history :+= m
      if (checkpointEvery > 0 && checkpoint.isDefined && i % checkpointEvery == 0)
        checkpoint.get.save(state, i, m, history)
    }
    // hand back a checkpoint-backed frame: the persist-chain below it is
    // about to be released
    if (persisted.nonEmpty) {
      state = state.localCheckpoint(true)
      persisted.foreach(_.unpersist(false))
    }
    Result(state, history)
  }
}
