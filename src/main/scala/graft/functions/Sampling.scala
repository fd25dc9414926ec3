package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction: hash-based (stable
  * across runs, retries, and cluster sizes — unlike `df.sample`, which
  * depends on partitioning), plus stratified and per-group top-k variants.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~`fraction` of rows, selected by a stable hash of `keyCols` —
    * the same rows survive on every run and at any parallelism. A salt
    * gives independent samples over the same keys. */
  def deterministicSample(
      df: DataFrame,
      keyCols: Seq[String],
      fraction: Double,
      salt: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val h = pmod(xxhash64(lit(salt) +: keyCols.map(col): _*), lit(Buckets))
    df.where(h < (fraction * Buckets).toLong)
  }

  /** Stratified deterministic sample: per-stratum fractions (missing
    * strata default to `defaultFraction`). */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      keyCols: Seq[String],
      defaultFraction: Double = 0.0,
      salt: Long = 0L): DataFrame = {
    val h = pmod(xxhash64(lit(salt) +: keyCols.map(col): _*), lit(Buckets))
    val threshold = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.where(h < threshold)
  }

  /** Per-group top-k by `orderBy` expressions (e.g. best-quality docs per
    * language) — one shuffle, rank + filter. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k).drop("__rk")
  }
}
