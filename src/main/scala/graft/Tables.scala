package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access: registers the driver-generated parquet tables
  * (TESTDATA.md) as temp views so SQL queries can reference them by the
  * same names the DuckDB oracle sees.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
      // read natively; read nanos-as-long and truncate to the µs
      // TimestampType, exactly like DuckDB's ns→µs conversion.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(sfDir, name))
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(path(sfDir, name))

  /** Register all tables as temp views for `sfDir` (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => read(spark, sfDir, n).createOrReplaceTempView(n))
}
