package graft.ops

import org.apache.spark.sql.DataFrame
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
  * driver loop.
  */
object Merge {

  private val SrcMarker = "__graft_src_present"

  /** Build the merged result of `source` into `target`.
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
      * cast to the target column type so the union lines up. */
    def widen(df: DataFrame): DataFrame = {
      val srcLower = mappedTargets.map(_.toLowerCase).toSet
      df.select(targetCols.map { c =>
        val tpe = target.schema(c).dataType
        if (srcLower.contains(c.toLowerCase)) col(c).cast(tpe).as(c)
        else lit(null).cast(tpe).as(c)
      }: _*)
    }

    strategy match {
      case ConflictStrategy.Ignore =>
        // Keep target untouched; insert only key-wise-new source rows.
        val newRows = src.join(target.select(conflictKeys.map(col): _*),
          conflictKeys, "left_anti")
        target.unionByName(widen(newRows))

      case ConflictStrategy.Exception =>
        // Parity with the pre-installed uniqueness constraint
        // (databases/base.py:201-209): any key collision fails the merge;
        // otherwise it is a plain insert of all source rows.
        val conflicts = src.join(target.select(conflictKeys.map(col): _*),
          conflictKeys, "left_semi")
        if (!conflicts.isEmpty)
          throw new MergeConflictException(
            s"merge(if_conflicts=exception): source rows collide with target on (${conflictKeys.mkString(",")})")
        target.unionByName(widen(src))

      case ConflictStrategy.Update =>
        // Duplicate source keys would multiply matched target rows through
        // the join below; dialect MERGEs fail on multi-match (Snowflake
        // "nondeterministic merge", Postgres "cannot affect row a second
        // time") — fail fast the same way.
        val dupKeys = src.groupBy(conflictKeys.map(col): _*)
          .count().where(col("count") > 1)
        if (!dupKeys.isEmpty)
          throw new MergeConflictException(
            s"merge(if_conflicts=update): source has duplicate rows on (${conflictKeys.mkString(",")})")
        // One full-outer join on the keys:
        //   matched        → mapped non-key columns take the source value
        //                    (even NULL — MERGE UPDATE SET semantics),
        //                    unmapped columns keep the target value;
        //   target-only    → row unchanged;
        //   source-only    → inserted with NULL unmapped columns.
        val s = src.withColumn(SrcMarker, lit(true))
        val joined = target.join(s, conflictKeys, "full_outer")
        val matched = col(SrcMarker).isNotNull
        val srcLower = nonKeyMapped.map(_.toLowerCase).toSet
        // After a USING-join, key columns are coalesced by Spark; mapped
        // non-key columns are ambiguous between the two sides.
        val out = joined.select(targetCols.map { c =>
          val tpe = target.schema(c).dataType
          if (conflictKeys.exists(_.equalsIgnoreCase(c))) col(c).cast(tpe).as(c)
          else if (srcLower.contains(c.toLowerCase))
            when(matched, s(c).cast(tpe)).otherwise(target(c)).as(c)
          else target(c).as(c)
        }: _*)
        out
    }
  }
}
