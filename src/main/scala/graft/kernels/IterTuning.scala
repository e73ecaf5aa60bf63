package graft.kernels

import org.apache.spark.sql.SparkSession

/** Session tuning scoped to iterative driver loops. */
object IterTuning {

  private val BloomKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"

  /** Spark 4 injects runtime bloom-filter joins by default
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled=true`). Inside an
    * iterative loop the injected filter is re-built and re-deserialized by
    * the driver on EVERY superstep's re-planning (multi-MB filters, minutes
    * of driver wall at bench scale) with no payoff: the loop's joins are
    * already partition-aligned. Scope it OFF for the duration of one
    * iterative run and restore the caller's setting afterwards. */
  def withoutRuntimeFilters[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(BloomKey)
    spark.conf.set(BloomKey, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(BloomKey, v)
      case None    => spark.conf.unset(BloomKey)
    }
  }
}
