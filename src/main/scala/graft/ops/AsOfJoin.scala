package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row (keys, t), attach the most
  * recent right row with the same keys and right.ts ≤ t. The canonical
  * time-series operator Spark lacks natively (builder-prompt example;
  * DuckDB/Pandas/kdb all ship one).
  *
  * Implementation is the scalable union-window shape, NOT a range join:
  * both sides are unioned with a side tag, partitioned by key, sorted by
  * (ts, side) and each left row picks `last_value(right payload ignore
  * nulls)` over the preceding frame. One shuffle on the keys, linear work,
  * no candidate-pair explosion — survives a fact-sized right side where a
  * `BETWEEN` range join would go quadratic.
  */
object AsOfJoin {

  /** @param on        equality key columns (present in both sides)
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param rightPayload right columns to attach (default: all non-key,
    *                  non-ts columns), emitted with their own names
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String] = Nil): DataFrame =
    asof(left, right, on, leftTs, rightTs, rightPayload, forwardDir = false)

  /** Forward as-of join: for each left row (keys, t), attach the EARLIEST
    * right row with the same keys and right.ts ≥ t — the mirror of
    * [[backward]] (same one-shuffle union-window plan, frame flipped to
    * current→following). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String] = Nil): DataFrame =
    asof(left, right, on, leftTs, rightTs, rightPayload, forwardDir = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      forwardDir: Boolean): DataFrame = {
    val payload =
      if (rightPayload.nonEmpty) rightPayload
      else right.columns.toSeq.filterNot(c =>
        on.exists(_.equalsIgnoreCase(c)) || c.equalsIgnoreCase(rightTs))
    require(payload.nonEmpty, "as-of join needs at least one right payload column")

    // At equal timestamps the right row must still match (ts ≤ t / ts ≥ t
    // inclusive): backward sorts right before left so the preceding frame
    // sees it; forward sorts left before right so the following frame does.
    val (leftSide, rightSide) = if (forwardDir) (0, 1) else (1, 0)

    val leftCols = left.columns.toSeq
    // union both sides: left rows carry their full row, right rows carry
    // the payload struct
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .withColumn("__payload", lit(null).cast(structType(right, payload)))
    val taggedRight = right
      .select(on.map(col) :+ col(rightTs).as("__ts") :+ lit(rightSide).as("__side") :+
        struct(payload.map(col): _*).as("__payload"): _*)
      .withColumns(leftCols.filterNot(c => on.exists(_.equalsIgnoreCase(c)))
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val unioned = taggedLeft.select(
      (leftCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)
      .unionByName(taggedRight.select(
        (leftCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*))

    val base = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
    val matched =
      if (forwardDir)
        unioned.withColumn("__match",
          first(col("__payload"), ignoreNulls = true)
            .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else
        unioned.withColumn("__match",
          last(col("__payload"), ignoreNulls = true)
            .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    matched.where(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        payload.map(p => col("__match").getField(p).as(p)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(c, df.schema(c).dataType)))
}
