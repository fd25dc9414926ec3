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
    requireNoBinColumn(points); requireNoBinColumn(intervals)
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

  /** Interval-OVERLAP join: all (left, right) pairs with equal `keys`
    * whose closed intervals intersect — `lStart ≤ rEnd AND rStart ≤ lEnd`
    * (the third canonical operator of the family; a plain inequality
    * join falls back to nested-loop exactly like the point form).
    *
    * Scalable shape: BOTH sides explode into their covering fixed-width
    * bins and meet in an ordinary equi-join on (keys..., bin). A pair
    * overlapping k shared bins would match k times; instead of a
    * dedup shuffle, the join keeps only the FIRST shared bin —
    * `bin = max(lStartBin, rStartBin)` — which every intersecting pair
    * shares exactly once (both bin ranges are contiguous, so their
    * intersection starts there). Exactly-once matching with zero
    * post-join deduplication.
    *
    * The four timestamp column names must be distinct (both sides ride
    * one joined row); key columns are shared via the join. Same
    * fail-fast bin guard as [[pointInInterval]]. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      keys: Seq[String],
      binWidthSeconds: Long,
      maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binWidthSeconds > 0, "binWidthSeconds must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    require(Seq(leftStart, leftEnd, rightStart, rightEnd).distinct.size == 4,
      "interval column names must be distinct across the two sides")
    requireNoBinColumn(left); requireNoBinColumn(right)
    val w = binWidthSeconds * 1000000L // micros
    def bins(s: String, e: String): Column = {
      val sBin = (unix_micros(col(s)) / w).cast("long")
      val eBin = (unix_micros(col(e)) / w).cast("long")
      explode(sequence(sBin,
        when(eBin - sBin < maxBinsPerInterval, eBin)
          .otherwise(raise_error(concat(
            lit(s"interval join: interval spans more than $maxBinsPerInterval bins of "),
            lit(s"$binWidthSeconds s (interval "), col(s).cast("string"),
            lit(" .. "), col(e).cast("string"),
            lit("); increase binWidthSeconds or maxBinsPerInterval")))
            .cast("long"))))
    }
    val l = left.withColumn("__bin", bins(leftStart, leftEnd))
    val r = right.withColumn("__bin", bins(rightStart, rightEnd))
    l.join(r, keys :+ "__bin")
      .where(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .where(col("__bin") === greatest(
        (unix_micros(col(leftStart)) / w).cast("long"),
        (unix_micros(col(rightStart)) / w).cast("long")))
      .drop("__bin")
  }

  /** withColumn("__bin", …) would silently REPLACE (and the final drop
    * destroy) a caller column of that name — fail fast instead. */
  private def requireNoBinColumn(df: DataFrame): Unit =
    require(!df.columns.contains("__bin"),
      "input carries a column named __bin, reserved by the range-join " +
        "binning — rename it")
}
