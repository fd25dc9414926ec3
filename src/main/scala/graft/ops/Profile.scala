package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, ByteType, ShortType, IntegerType, LongType, BooleanType, DateType}

/** Column-level table profiling — the "profile before you train / load"
  * data-quality pass (per column: null count, exact distinct count,
  * min/max, mean string length). The reference ships per-column *checks*
  * (`check_column`, reference `python-sdk/src/astro/sql/operators/`);
  * profiling is the discovery half of the same workflow: the numbers a
  * user reads before deciding which checks to pin.
  *
  * 100 TB shape: ONE full scan — every metric is a partial aggregate
  * (null counts, min/max, length sums combine map-side; the per-column
  * exact distincts expand via Spark's single-pass distinct-aggregate
  * planning). The result is O(#columns) rows, driver-small by
  * construction. min/max are rendered as strings so heterogeneous
  * column types stack into one relation — but only for types whose
  * string rendering is engine-portable (integrals, strings, booleans,
  * dates); float/timestamp columns profile nulls/distincts only, since
  * their text forms differ across engines.
  */
object Profile {

  /** Renders min/max portably? Integral, string, boolean, and date
    * columns only — see class doc. */
  private def portableRender(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         BooleanType | DateType => true
    case _ => false
  }

  /** One row per column of `df`: (column_name, n_nulls, n_distinct,
    * min_str, max_str, avg_len). `n_distinct` excludes NULLs (SQL
    * `count(DISTINCT c)` semantics); `avg_len` is the mean character
    * length of non-null values, string columns only. */
  def profileTable(df: DataFrame): DataFrame = {
    // The whole profile fuses into the scan stage (projections + partial
    // aggregates), so its parallelism is the SCAN's parallelism — and a
    // small table arriving as one single-row-group parquet file runs the
    // entire pass in one task (measured: 2.0 s single-task scan+partial-agg
    // on the 100k-row events table where 32 cores sat idle). Spread the
    // input to the session parallelism ONLY when the scan cannot reach it
    // by itself — the guide's unsplittable-input remedy; at real scale the
    // input arrives in thousands of splits, the guard is false, and no
    // exchange is added (a blind repartition would shuffle the full table).
    val input = Scale.spreadIfNarrow(df)
    val fields = input.schema.fields
    val aggs: Seq[Column] = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val minMax: Seq[Column] =
        if (portableRender(f.dataType))
          Seq(min(c).cast("string").as(s"__min_$i"),
            max(c).cast("string").as(s"__max_$i"))
        else
          Seq(first(lit(null).cast("string")).as(s"__min_$i"),
            first(lit(null).cast("string")).as(s"__max_$i"))
      val avgLen: Column =
        if (f.dataType == StringType) avg(length(c)).as(s"__len_$i")
        else first(lit(null).cast("double")).as(s"__len_$i")
      Seq(
        // coalesce: sum over an EMPTY table is NULL — profile to 0 instead
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$i"),
        countDistinct(c).as(s"__dist_$i")) ++ minMax :+ avgLen
    }.toIndexedSeq
    val one = input.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("column_name"),
        col(s"__nulls_$i").cast("long").as("n_nulls"),
        col(s"__dist_$i").cast("long").as("n_distinct"),
        col(s"__min_$i").as("min_str"),
        col(s"__max_$i").as("max_str"),
        col(s"__len_$i").cast("double").as("avg_len"))
    }
    one.select(inline(array(rows.toIndexedSeq: _*)))
  }
}
