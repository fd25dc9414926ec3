package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Diagnostic for the scale-curve superlinearity flagged in round 4:
  * times p_dedup_minhash_scale min-of-2 at each multiple and prints the
  * LSH intermediate cardinalities (banded rows, bucket-size distribution,
  * candidate pairs) so growth is attributable to a specific stage.
  * Dev tool — not part of the verify/bench contract. */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val multiples = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTIPLES", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val scaleRoot = "/tmp/graft-scalediag-" + java.util.UUID.randomUUID().toString.take(8)

    multiples.foreach { m =>
      val dir = s"$scaleRoot/x$m"
      val docs = graft.ops.Scale.scaleDocuments(Tables.read(spark, sfDir, "documents"), m)
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val n = spark.read.parquet(s"$dir/documents.parquet").count()

      def timeOnce(): Double = {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries("p_dedup_minhash_scale")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = timeOnce(); val t2 = timeOnce()

      // reconstruct the LSH intermediates with the same config as
      // dedupMinHashScale (numHashes=32, bands=8, threshold=0.6, bucketMin)
      spark.catalog.clearCache()
      val corpus = {
        val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zq extra trailing token")).as("text")))
          .repartition(spark.sparkContext.defaultParallelism)
      }
      val sets = Dedup.wordShingleSets(corpus, "doc_id", "text", k = 3)
        .withColumnRenamed("__id", "doc_id").persist()
      val numHashes = 32; val bands = 8; val rpb = numHashes / bands
      val banded = sets.select(col("doc_id"), size(col("sets")).as("__sz"),
          explode(Dedup.lshBands(
            Dedup.minHashSignature(col("sets"), numHashes), bands, rpb)).as("__bucket"))
        .persist()
      val bandedRows = banded.count()
      val bstats = banded.groupBy("__bucket").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"), max("n").as("maxB"),
          sum(col("n") * col("n")).as("sumSq"), expr("sum(n)").as("rows"))
        .head()
      val pairs = Dedup.nearDupPairsFromSets(sets, "doc_id",
        numHashes = 32, bands = 8, threshold = 0.6, bucketMinOnly = true)
      val nPairs = pairs.count()
      banded.unpersist(); sets.unpersist()
      println(f"DIAG x$m%-3d docs=$n%8d t1=$t1%7.2f t2=$t2%7.2f min=${math.min(t1, t2)}%7.2f " +
        s"banded=$bandedRows buckets=${bstats.getLong(0)} maxBucket=${bstats.getLong(1)} " +
        s"sumSq=${bstats.getLong(2)} pairs=$nPairs")
    }
    val p = new org.apache.hadoop.fs.Path(scaleRoot)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
