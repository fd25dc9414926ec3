package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the dimension-history ELT
  * pattern one step past the reference's merge surface
  * (python-sdk/src/astro/sql/operators/merge.py stops at
  * ignore/update/exception on the CURRENT state): apply a source batch
  * to a versioned dimension, closing changed rows and appending new
  * versions, so every historical attribute state stays queryable
  * ("the customer's segment as of last March").
  *
  * Contract: the target carries `keyCols ++ compareCols` plus the three
  * bookkeeping columns ([[ValidFrom]], [[ValidTo]], [[IsCurrent]]); the
  * source carries `keyCols ++ compareCols` with at most one row per key
  * and NON-NULL keys (duplicate or NULL source keys raise in-plan, the
  * [[Merge.surfacingConflicts]] discipline — a NULL key would slip
  * through every null-unsafe branch join and silently insert duplicate
  * current rows). One batch application:
  *
  *   - key absent from the current state        → insert (from, null, true)
  *   - key present, any compareCol differs
  *     (null-safe)                              → close the current row
  *     (valid_to = effectiveDate, is_current = false) + insert the new
  *     version
  *   - key present, attributes identical        → untouched
  *   - history rows (is_current = false)        → untouched, always
  *   - dirty rows (is_current NULL)             → kept verbatim as
  *     history (never compared, closed, or dropped — row count is
  *     conserved on dirty bookkeeping)
  *
  * 100 TB shape: one null-safe comparison join of the CURRENT slice
  * against the batch on the dimension key (both sides shuffled by key —
  * at warehouse scale the batch side usually broadcasts), one semi/anti
  * fan-out of the decision, and a union — no windows, no global sorts,
  * and history is never rewritten (an is_current/date-partitioned
  * layout rewrites only the current partition). Every output value is a
  * pure function of the inputs and the literal effective date, so the
  * whole new state replays in an external engine — `op_scd2_merge`
  * hash-matches the four-way decision against DuckDB. */
object Scd2 {
  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"

  /** The new table state after applying `source` at `effectiveDate`.
    * Lazy — validation (duplicate source keys) raises with the plan. */
  def scd2Plan(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      effectiveDate: Column): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(compareCols.nonEmpty, "scd2 needs at least one compared column")
    val meta = Seq(ValidFrom, ValidTo, IsCurrent)
    meta.foreach(c => require(target.columns.exists(_.equalsIgnoreCase(c)),
      s"scd2 target must carry bookkeeping column $c"))
    val attrs = keyCols ++ compareCols
    attrs.foreach(c => require(source.columns.exists(_.equalsIgnoreCase(c)),
      s"scd2 source must carry column $c"))

    val validToType = target.schema(target.schema.fieldIndex(ValidTo)).dataType
    val outCols = target.columns.toSeq

    // A NULL is_current is dirty bookkeeping, not a version statement:
    // treat it as history (kept verbatim, never closed or compared) so
    // the row count is conserved — the raw !col/col split would match a
    // NULL in NEITHER branch and silently drop the row.
    val isCur = coalesce(col(IsCurrent), lit(false))
    val hist = target.where(!isCur)
    val cur = target.where(isCur)

    // in-plan duplicate-source-key guard, riding the first key column of
    // the insert branch (the Merge raise_error discipline: survives
    // column pruning because the union needs that column). NULL source
    // keys are dirty input, not a key value: they would slip through
    // every null-unsafe guard/branch join below (silently inserting
    // duplicate "current" rows), so they raise in-plan first.
    val nullKeyMsg =
      s"merge(if_conflicts=scd2, keys=${keyCols.mkString(",")}): NULL source key"
    val srcChecked = source.select(attrs.zipWithIndex.map { case (c, i) =>
      if (i == 0)
        when(keyCols.map(col(_).isNull).reduce(_ || _),
          raise_error(lit(nullKeyMsg)).cast(source.schema(source.schema.fieldIndex(c)).dataType))
          .otherwise(col(c)).as(c)
      else col(c).as(c)
    }: _*)
    val dupKeys = srcChecked.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
      .select(keyCols.map(col): _*)
    val srcP = srcChecked
      .join(dupKeys.withColumn("__dup", lit(true)), keyCols, "left")

    // keys whose incoming attributes differ (null-safely) from the
    // current version
    val diff = compareCols.map(c => !(col(s"t.$c") <=> col(s"s.$c"))).reduce(_ || _)
    val keyEq = keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val changedKeys = cur.alias("t").join(srcP.alias("s"), keyEq)
      .where(diff)
      .select(keyCols.map(k => col(s"t.$k").as(k)): _*)

    // carries Merge's conflict marker so surfacingConflicts re-types the
    // task failure as the MergeConflictException callers already handle
    val guardMsg =
      s"merge(if_conflicts=scd2, keys=${keyCols.mkString(",")}): duplicate source keys"
    // wrap the first output column in the in-plan duplicate raise (the
    // Merge raise_error discipline: survives column pruning because the
    // union needs that column); `flag` marks a duplicated source key
    def guarded(df: DataFrame, flag: String): DataFrame =
      df.select(outCols.zipWithIndex.map { case (c, i) =>
        val base = col(c).cast(target.schema(target.schema.fieldIndex(c)).dataType)
        if (i == 0)
          when(col(flag), raise_error(lit(guardMsg))
            .cast(target.schema(target.schema.fieldIndex(c)).dataType))
            .otherwise(base).as(c)
        else base.as(c)
      }: _*)

    val closed = cur.join(changedKeys, keyCols, "left_semi")
      .withColumn(ValidTo, effectiveDate.cast(validToType))
      .withColumn(IsCurrent, lit(false))
    // Duplicate source rows whose attributes all match the current
    // version traverse ONLY this branch (no diff → no new version, key
    // present → no insert), so the kept-current rows carry the guard
    // too — every duplicated source key now raises on some branch.
    val keptCur = guarded(
      cur.join(changedKeys, keyCols, "left_anti")
        .join(dupKeys.withColumn("__dupk", lit(true)), keyCols, "left"),
      "__dupk")

    val newKeys = srcP.join(cur.select(keyCols.map(col): _*), keyCols, "left_anti")
    val newVersions = srcP.join(changedKeys, keyCols, "left_semi")
    val validFromType = target.schema(target.schema.fieldIndex(ValidFrom)).dataType
    val inserts = guarded(
      newKeys.unionByName(newVersions)
        .withColumn(ValidFrom, effectiveDate.cast(validFromType))
        .withColumn(ValidTo, lit(null).cast(validToType))
        .withColumn(IsCurrent, lit(true)),
      "__dup")

    hist.unionByName(keptCur).unionByName(closed)
      .unionByName(inserts)
      .select(outCols.map(col): _*)
  }
}
