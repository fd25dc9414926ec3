package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{ConflictStrategy, MergeConflictException}

/** Upsert as a Catalyst plan (SURVEY §2.4 merge): Spark has no table
  * constraints and plain parquet tables have no MERGE INTO, so the three
  * reference strategies (constants.py:91) are built as join/union plans
  * whose net effect matches the dialect implementations
  * (databases/snowflake.py:860-1006 MERGE INTO, postgres ON CONFLICT
  * databases/postgres.py:155-209, redshift staged rewrite
  * databases/aws/redshift.py:168-306) and the value assertions of
  * tests_integration/sql/operators/test_merge.py:80-95.
  *
  * Scale notes: every strategy is a single equi-join on the conflict keys —
  * shuffle-partitioned on the key, AQE-skew-splittable, and broadcastable
  * when the source is small (the common upsert shape). No collect, no
  * driver loop. The dialect-parity fail-fast checks (duplicate source
  * keys under `update`, key collisions under `exception`) ride the SAME
  * plan as `raise_error`-guarded projections instead of running as eager
  * validation jobs — at a 100 TB target that saves an extra scan of the
  * source/target key columns per merge. The error surfaces when the plan
  * executes; wrap the action in [[Merge.surfacingConflicts]] to get the
  * typed [[MergeConflictException]] back out of Spark's task-failure
  * wrapping (GraftSession.merge does). Caveat of the in-plan guard: it
  * lives in the output projection, so an action that materializes the
  * rows (a write, collect) validates, while a bare `count()` prunes every
  * column and skips it — the table-level `merge` API always materializes.
  */
object Merge {

  private val SrcMarker = "__graft_src_present"
  private val DupCount = "__graft_src_key_count"
  private val HitMarker = "__graft_target_hit"

  /** Marker prefix embedded in the in-plan `raise_error` messages; what
    * [[surfacingConflicts]] looks for in the failure-cause chain. */
  private val ConflictMarker = "merge(if_conflicts="

  /** Run an action over a merge plan, translating an in-plan conflict
    * `raise_error` (wrapped by Spark in task-failure exceptions) back
    * into the typed [[MergeConflictException]]. Non-conflict failures
    * rethrow unchanged. */
  def surfacingConflicts[T](f: => T): T =
    try f
    catch {
      case e: Throwable =>
        var t: Throwable = e
        while (t != null) {
          val m = t.getMessage
          if (m != null && m.contains(ConflictMarker)) {
            val tail = m.substring(m.indexOf(ConflictMarker)).takeWhile(_ != '\n')
            throw new MergeConflictException(tail)
          }
          t = t.getCause
        }
        throw e
    }

  /** Build the merged result of `source` into `target`. Lazy: conflict
    * validation executes with the plan (see class doc).
    *
    * @param columns source→target column mapping (may rename, e.g.
    *        source "age" → target "taxes"; test_merge.py:52-55). Must map
    *        a source column onto every conflict key. Empty = all source
    *        columns by name (reference merge.py:16-80 columns=None).
    * @param conflictKeys target-side conflict column names.
    */
  def mergePlan(
      source: DataFrame,
      target: DataFrame,
      columns: Seq[(String, String)],
      conflictKeys: Seq[String],
      strategy: ConflictStrategy): DataFrame = {
    val mapping =
      if (columns.nonEmpty) columns
      else source.columns.toSeq.map(c => c -> c)
    val mappedTargets = mapping.map(_._2)
    val missingKeys = conflictKeys.filterNot(k => mappedTargets.exists(_.equalsIgnoreCase(k)))
    require(missingKeys.isEmpty,
      s"conflict key(s) ${missingKeys.mkString(",")} not covered by the column mapping")

    // Source projected into target namespace: only mapped columns survive,
    // renamed to their target name (INSERT (cols) SELECT cols semantics).
    val src = source.select(mapping.map { case (s, t) => col(s).as(t) }: _*)
    val targetCols = target.columns.toSeq
    val nonKeyMapped = mappedTargets.filterNot(t => conflictKeys.exists(_.equalsIgnoreCase(t)))

    /** src rows widened to the full target schema (unmapped cols NULL),
      * cast to the target column type so the union lines up. `guard`
      * (condition, message) rides the first output column: a row matching
      * the condition raises instead of projecting — the validation stays
      * inside the one plan and survives column pruning because it is part
      * of a column the union needs. */
    def widen(df: DataFrame, guard: Option[(org.apache.spark.sql.Column, String)]): DataFrame = {
      val srcLower = mappedTargets.map(_.toLowerCase).toSet
      df.select(targetCols.zipWithIndex.map { case (c, i) =>
        val tpe = target.schema(c).dataType
        val base =
          if (srcLower.contains(c.toLowerCase)) col(c).cast(tpe)
          else lit(null).cast(tpe)
        guard match {
          case Some((cond, msg)) if i == 0 =>
            when(cond, raise_error(lit(msg)).cast(tpe)).otherwise(base).as(c)
          case _ => base.as(c)
        }
      }: _*)
    }

    strategy match {
      case ConflictStrategy.Ignore =>
        // Keep target untouched; insert only key-wise-new source rows.
        val newRows = src.join(target.select(conflictKeys.map(col): _*),
          conflictKeys, "left_anti")
        target.unionByName(widen(newRows, None))

      case ConflictStrategy.Exception =>
        // Parity with the pre-installed uniqueness constraint
        // (databases/base.py:201-209): any key collision fails the merge;
        // otherwise it is a plain insert of all source rows. The collision
        // probe is a left join against the distinct target keys with the
        // raise riding the projection — not a separate eager semi-join job.
        val hits = target.select(conflictKeys.map(col): _*)
          .dropDuplicates(conflictKeys)
          .withColumn(HitMarker, lit(true))
        val checked = src.join(hits, conflictKeys, "left")
        val msg = s"merge(if_conflicts=exception): source rows collide with target on (${conflictKeys.mkString(",")})"
        target.unionByName(
          widen(checked, Some(col(HitMarker).isNotNull -> msg)))

      case ConflictStrategy.Update =>
        // Duplicate source keys would multiply matched target rows through
        // the join below; dialect MERGEs fail on multi-match (Snowflake
        // "nondeterministic merge", Postgres "cannot affect row a second
        // time") — fail the same way, but from INSIDE the plan: a key-count
        // window over the source (its shuffle partitioning is the same as
        // the join's, so no extra pass over the data) feeds a raise_error
        // guard in the output projection.
        val dupMsg = s"merge(if_conflicts=update): source has duplicate rows on (${conflictKeys.mkString(",")})"
        val s = src.withColumn(SrcMarker, lit(true))
          .withColumn(DupCount,
            count(lit(1)).over(Window.partitionBy(conflictKeys.map(col): _*)))
        // One full-outer join on the keys:
        //   matched        → mapped non-key columns take the source value
        //                    (even NULL — MERGE UPDATE SET semantics),
        //                    unmapped columns keep the target value;
        //   target-only    → row unchanged;
        //   source-only    → inserted with NULL unmapped columns.
        val joined = target.join(s, conflictKeys, "full_outer")
        val matched = col(SrcMarker).isNotNull
        val srcLower = nonKeyMapped.map(_.toLowerCase).toSet
        // After a USING-join, key columns are coalesced by Spark; mapped
        // non-key columns are ambiguous between the two sides.
        val out = joined.select(targetCols.zipWithIndex.map { case (c, i) =>
          val tpe = target.schema(c).dataType
          val base =
            if (conflictKeys.exists(_.equalsIgnoreCase(c))) col(c).cast(tpe)
            else if (srcLower.contains(c.toLowerCase))
              when(matched, s(c).cast(tpe)).otherwise(target(c))
            else target(c)
          if (i == 0)
            when(col(DupCount) > 1, raise_error(lit(dupMsg)).cast(tpe)).otherwise(base).as(c)
          else base.as(c)
        }: _*)
        out
    }
  }
}
