package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // Simulate the driver: a plain session WITHOUT our legacy-nanos conf pre-set.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_SMOKE rows=$n")
    df.show(5, false)
    spark.stop()
  }
}
