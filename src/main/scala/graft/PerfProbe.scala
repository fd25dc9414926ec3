package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time + explain individual queries.
  * Usage: runMain graft.PerfProbe <sfDir> <query...> [--explain]
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val spark = GraftSession.localSpark()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      // warm + timed runs, same materialization + isolation as Bench
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PERF $name first=${times.head}%.2fs second=${times.last}%.2fs")
    }
    spark.stop()
  }
}
