package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins `Tables.read`'s events.ts normalization across every parquet
  * layout the driver's testdata generator has shipped: TIMESTAMP(NANOS)
  * (surfaces as a raw Long under nanosAsLong), pandas timestamp[us]
  * without the UTC flag (TIMESTAMP_NTZ), and plain UTC-adjusted µs.
  * A testdata refresh that flips layout again must not change values.
  */
class TablesSpec extends GraftSuite {

  test("events.ts: all three historical layouts normalize to identical µs TimestampType") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1700000000000000L),
      (2L, 1700000123456789L),
      (3L, 1700009999999999L))

    def writeLayout(layout: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$layout").toString
      val base = rows.toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      val df = layout match {
        // the nanos layout reads back as LongType under nanosAsLong
        case "long_nanos" => base.withColumn("ts", unix_micros(col("ts")) * 1000L)
        case "ntz"        => base.withColumn("ts", col("ts").cast(TimestampNTZType))
        case "utc"        => base
      }
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }

    val reads = Seq("long_nanos", "ntz", "utc").map { layout =>
      val df = Tables.read(spark, writeLayout(layout), "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$layout layout must normalize to TimestampType, got ${df.schema("ts").dataType}")
      layout -> df.orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    }.toMap

    assert(reads("long_nanos") == rows.map(_._2), reads.toString)
    assert(reads("ntz") == rows.map(_._2), reads.toString)
    assert(reads("utc") == rows.map(_._2), reads.toString)
  }
}
