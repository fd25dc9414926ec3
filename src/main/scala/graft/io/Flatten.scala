package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

import graft.core.ColumnsCapitalization

/** Struct flattening, reproducing the reference's `pandas.json_normalize`
  * column naming for NDJSON loads (files/types/ndjson.py:54-96,
  * load_file.py:205-243): nested structs flatten to `a<sep>b<sep>c`
  * columns; arrays/maps remain values (json_normalize leaves lists as-is).
  *
  * Spark-first difference: we read JSON natively nested and flatten as a
  * *projection* — a pure Catalyst select of nested field accesses, so
  * Spark's nested-schema pruning still reaches the reader.
  */
object Flatten {

  /** All leaf columns of `schema` as (flattenedName, column) pairs. */
  private def leafColumns(schema: StructType, prefixPath: Seq[String], sep: String): Seq[(String, Column)] =
    schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        leafColumns(st, prefixPath :+ name, sep)
      case StructField(name, _, _, _) =>
        val path = prefixPath :+ name
        // col("`a`.`b`") with explicit backtick quoting per path segment so
        // dots inside field names don't split.
        val c = col(path.map(p => "`" + p.replace("`", "``") + "`").mkString("."))
        Seq((path.mkString(sep), c))
    }

  /** Flatten every struct column recursively; leaves non-struct columns
    * (including arrays and maps) untouched, like json_normalize. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    val cols = leafColumns(df.schema, Nil, sep)
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Illegal-character substitution per the reference
    * (databases/base.py:59-66): replace non `[a-zA-Z0-9_]` chars in column
    * names with `_`. */
  def replaceIllegalColumnChars(df: DataFrame): DataFrame = {
    val renamed = df.columns.map(_.replaceAll("[^a-zA-Z0-9_]", "_"))
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** Column-case policy (utils/dataframe.py:17-33). */
  def applyCapitalization(df: DataFrame, cap: ColumnsCapitalization): DataFrame = cap match {
    case ColumnsCapitalization.Original => df
    case ColumnsCapitalization.Lower    => df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
    case ColumnsCapitalization.Upper    => df.toDF(df.columns.map(_.toUpperCase).toIndexedSeq: _*)
  }
}
