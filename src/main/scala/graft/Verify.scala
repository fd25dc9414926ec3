package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev convenience: an optional 3rd arg restricts the run to a
    // comma-separated query subset (the driver always passes 2 args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // see GraftSession.localSpark: the inferred explode null-guard
      // duplicates gram-lambda evaluation into few-task scan stages
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // see GraftSession.localSpark: keep byte-small compute-dense
      // post-shuffle stages parallel (floor only binds on tiny shuffles)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        "/tmp/graft-warehouse-" + java.util.UUID.randomUUID().toString.take(8))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // plan transparency: each query's formatted physical plan is dumped —
    // OUTSIDE outDir, which the driver's checker globs as query results
    // (a stray subdirectory there shows up as a spurious error row in the
    // round's correctness artifact)
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "/tmp/graft-plans")
    // delete-and-recreate: the dir is shared across runs, and stale plan
    // files from renamed/deleted queries (or other sf dirs) would mislead
    // later plan review — only the current run's plans may remain
    // …but only for FULL runs: a dev subset run (3rd arg) must not wipe
    // the complete plan set a concurrent or prior full run produced
    val pd = new java.io.File(plansDir)
    if (only.isEmpty) {
      Option(pd.listFiles()).foreach(_.foreach(_.delete()))
    }
    pd.mkdirs()
    // a thrown query must become a RED row in the round artifact, not a
    // silent omission (round 6 lost 5 regressed queries to exactly that:
    // the catch below wrote stderr only, and the driver's checker skipped
    // the missing keys) — collect every failure for failures.json
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        Files.writeString(Paths.get(s"$plansDir/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      // queries may persist() intermediates (LSH shingle sets); release
      // them so 56 queries don't accumulate cached relations in one JVM
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // always written (possibly {}): its absence means an old Verify ran,
    // an empty map means every registered query produced a result
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
