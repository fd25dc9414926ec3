package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second canonical operator Spark has
  * no native physical strategy for (a plain `BETWEEN` join falls back to
  * broadcast-nested-loop / cartesian).
  *
  * Scalable shape: intervals are exploded into the fixed-width time bins
  * they cover, points map to their single bin, and the join runs as an
  * ordinary equi-join on (keys..., bin) followed by the exact containment
  * filter. Each qualifying (point, interval) pair matches exactly once —
  * the point's bin is unique and the interval appears once per bin.
  * Work is linear in points + intervals × (len/binWidth + 1); pick
  * `binWidthSeconds` near the typical interval length.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` with equal
    * `keys` and pointTs ∈ [startCol, endCol] (inclusive both ends).
    *
    * @param maxBinsPerInterval fail-fast guard: an interval spanning more
    *        than this many bins (binWidthSeconds badly undersized for the
    *        data) would explode into unbounded rows and OOM at scale —
    *        raise a clear error instead.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      keys: Seq[String],
      binWidthSeconds: Long,
      maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binWidthSeconds > 0, "binWidthSeconds must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val w = binWidthSeconds * 1000000L // micros
    val p = points.withColumn("__bin", (unix_micros(col(pointTs)) / w).cast("long"))
    val startBin = (unix_micros(col(startCol)) / w).cast("long")
    val endBin = (unix_micros(col(endCol)) / w).cast("long")
    val i = intervals.withColumn("__bin", explode(sequence(startBin,
      when(endBin - startBin < maxBinsPerInterval, endBin)
        .otherwise(raise_error(concat(
          lit(s"range join: interval spans more than $maxBinsPerInterval bins of "),
          lit(s"$binWidthSeconds s (interval "), col(startCol).cast("string"),
          lit(" .. "), col(endCol).cast("string"),
          lit("); increase binWidthSeconds or maxBinsPerInterval")))
          .cast("long")))))
    p.join(i, keys :+ "__bin")
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }
}
