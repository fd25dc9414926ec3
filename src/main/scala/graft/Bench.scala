package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      // 60 queries × several codegen'd stages overflow the default
      // 100-entry generated-class cache, so pass 2 re-compiles (and
      // re-JITs) evicted classes — the min-of-2 then measures janino, not
      // the query. Static conf: must be set before the session starts.
      // Raised 2000 → 8000 in round 10: at 177 timed queries × ~10
      // generated classes each, the suite sits right at the 2000-entry
      // edge, and crossing it re-prices the heaviest-codegen query
      // (p_dedup_simhash_portable) at 2× — the same
      // interpreted-generated-code cliff SCALING.md attributes for the
      // driver readings, one level up.
      .config("spark.sql.codegen.cache.maxEntries", "8000")
      .config("spark.sql.warehouse.dir",
        "/tmp/graft-bench-warehouse-" + java.util.UUID.randomUUID().toString.take(8))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: absorb one-time JVM/codegen/filesystem/broadcast init so
    // per-query numbers measure the queries, not session startup.
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT c_mktsegment, count(*), sum(o_totalprice) FROM orders
        |JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""".stripMargin).collect()
    // Materialize through the noop sink: every column is evaluated and
    // shipped, so projection-only queries (regex cleaning, scoring) are
    // measured honestly — a bare count() would let Catalyst prune them away.
    //
    // Reproducibility (round-2 verdict): queries are measured in ISOLATION
    // — cache cleared + GC before each one so a heavy earlier query can't
    // tax a later one through leaked cached relations or heap pressure —
    // and the suite runs TWICE (second pass in reverse order, to
    // decorrelate any residual order effect), reporting the per-query
    // minimum: the min is the query's cost, the max is the interference.
    val errors = scala.collection.mutable.Map[String, String]()
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      (System.nanoTime() - t0) / 1e9
    }
    // bench-only variants (un-oracle-able organic-corpus forms) are
    // timed alongside the contract queries — perf stays tracked even
    // though the driver's correctness artifact excludes them
    val benchQueries = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    val ordered = benchQueries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (n, f) => n -> runOnce(n, f) }.toMap
    val pass2 = ordered.reverse.map { case (n, f) => n -> runOnce(n, f) }.toMap
    val results = pass1.map { case (n, t) => n -> math.min(t, pass2(n)) }

    // Scale curve (round-3 verdict): the dedup/LSH family measured at m×
    // corpus multiples, so the 100 TB linearity claims carry an actual
    // scaling signature instead of a single point. Each multiple is a
    // synthetic corpus (ops.Scale.scaleDocuments/scaleEmbeddings: replica
    // vocabularies disjoint, ids salted) materialized to parquet OUTSIDE
    // the timed region; the same SparkEntry query fns then run against the
    // scaled dir, one timed pass each. Near-linear growth on the
    // bucket-min/decontaminate rows is the expected signature — superlinear
    // growth here means a plan regressed to all-pairs behavior.
    val scaleQueries = Seq(
      "p_dedup_exact", "p_dedup_minhash_scale", "p_decontaminate", "p_dedup_embedding",
      "p_decontaminate_bloom", "p_dedup_paragraph", "p_ann_bruteforce", "p_ann_ivf",
      "p_ann_ivf_free",
      "p_dedup_cc", "p_dedup_semantic", "p_quality_filter", "p_lm_score",
      "p_ann_rerank", "p_dedup_span_scrub",
      "p_embed_kmeans", "p_dsir_weights", "p_tfidf_terms", "p_dedup_media",
      "p_dedup_edit", "p_quality_classifier", "p_sample_epochs",
      "p_dedup_image_px", "p_sketch_quantiles", "p_ann_pq", "p_dedup_audio_px",
      "p_dedup_video_px", "p_dedup_jpeg_px",
      // round-10 additions (round-9 verdict task 6): the composite ANN
      // index and the certification twins carry the largest per-round
      // costs on the board — their linearity is now machine-checked too
      "p_ann_ivfpq", "p_dedup_minhash_portable", "p_dedup_simhash_portable",
      "p_dedup_jpeg_color", "p_dedup_jpeg_progressive",
      // round-11: the HLL register sketch and the CMS counter build join
      // the curve — expected near-flat fixed-state aggregation like the
      // KMV rows
      "p_sketch_hll", "p_sketch_cms",
      // round-12: the CC family now reads a staged pair artifact, so the
      // FRESH mine is tracked separately (p_dedup_cc on the curve now
      // measures stage-once + propagate; p_cc_pair_mining carries the
      // mining-linearity signal the CC rows used to); the incremental
      // near-dup row joins too — per-dump work must stay O(dump)
      "p_cc_pair_mining", "p_dedup_minhash_incremental")
    val multiples = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTIPLES", "1,3,10")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val scaleRoot = "/tmp/graft-bench-scale-" + java.util.UUID.randomUUID().toString.take(8)
    // Materialize every multiple's corpus FIRST, then time each query's
    // multiples back-to-back (query-outer, multiple-inner). The flag below
    // is a RATIO between the ×1 and ×10 points; with the old
    // multiple-outer order those two timings sat many minutes apart, so a
    // shared-host regime shift mid-curve inflated one side only and
    // manufactured ratio excursions (p_dedup_edit 2.062 / simhash twin
    // 79.6 s in the round-12 slow-regime refresh, byte-identical plans).
    // Adjacent timings inflate TOGETHER, keeping the ratio attributable
    // to the plan rather than to when the host slowed down.
    val dirs = multiples.map { m =>
      val dir = s"$scaleRoot/x$m"
      val docs = graft.ops.Scale.scaleDocuments(Tables.read(spark, sfDir, "documents"), m)
      val embs = graft.ops.Scale.scaleEmbeddings(Tables.read(spark, sfDir, "embeddings"), m, dim = 64)
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      embs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      m -> (dir, spark.read.parquet(s"$dir/documents.parquet").count())
    }.toMap
    // min-of-2 like the main suite: single-pass curve points manufactured
    // two phantom regressions (rounds 4/5 flagged 16.95 s / 10.03 s at
    // ×10 for a query whose min-of-2 truth was 3.56 s — shared-host
    // noise, not a plan change).
    val perQuery = scaleQueries.map { n =>
      n -> multiples.map { m =>
        val dir = dirs(m)._1
        val a = runOnce(s"scale_x${m}_$n", (s, _) => benchQueries(n)(s, dir))
        val b = runOnce(s"scale_x${m}_$n", (s, _) => benchQueries(n)(s, dir))
        m -> math.min(a, b)
      }.toMap
    }
    val curve = multiples.map { m =>
      m -> (dirs(m)._2, scaleQueries.map(n =>
        n -> perQuery.find(_._1 == n).get._2(m)))
    }
    // Per-query scaling verdict: wall-clock ratio between the largest and
    // smallest multiple, normalized by the data ratio — 1.0 = perfectly
    // linear, < 1 = sublinear (fixed costs amortizing), > 2 = superlinear
    // enough to flag (a plan regressing toward all-pairs behavior).
    val scaleFlags: Seq[(String, (Double, Boolean))] =
      if (multiples.size < 2) Seq.empty
      else {
        val mLo = multiples.min; val mHi = multiples.max
        val tLo = curve.find(_._1 == mLo).get._2._2.toMap
        val tHi = curve.find(_._1 == mHi).get._2._2.toMap
        scaleQueries.map { n =>
          val r = (tHi(n) / math.max(tLo(n), 1e-9)) / (mHi.toDouble / mLo)
          n -> (r, r > 2.0)
        }
      }
    val scaleRootPath = new org.apache.hadoop.fs.Path(scaleRoot)
    scaleRootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(scaleRootPath, true)

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    // 3-decimal seconds: full double repr would double the line length,
    // and the driver's artifact keeps only a 2000-char window of it
    def jnum(v: Double) = f"$v%.3f"
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val curveJson = curve.map { case (m, (rows, times)) =>
      jstr(s"x$m") + ":{\"rows_documents\":" + rows + ",\"queries\":" +
        times.map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}") + "}"
    }.mkString("{", ",", "}")
    val flagsJson = scaleFlags.map { case (n, (r, f)) =>
      jstr(n) + ":{\"per_row_ratio\":" + f"$r%.3f" + ",\"flag\":" + f + "}"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Field order is deliberate (round-6 verdict): headline + per-query
    // map + errors FIRST, scale curve LAST — the driver's 2000-char
    // truncation then eats the curve, not the per-round comparables.
    val line =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","scale_curve":$curveJson,"scale_curve_flags":$flagsJson}"""
    // Compact headline, printed BEFORE and AFTER the full line: the
    // driver's artifact keeps a bounded stdout window (r11-r13 showed it
    // capturing only the TAIL of the full line → "parsed": null), so a
    // short self-contained JSON line must sit at both edges for the
    // headline to survive whichever edge the window keeps. Same schema
    // as the full line plus the board aggregates.
    val maxRatio = if (scaleFlags.isEmpty) 0.0 else scaleFlags.map(_._2._1).max
    val headline =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","n":${results.size},"errors":${errors.size},"flags":${scaleFlags.count(_._2._2)},"max_ratio":${f"$maxRatio%.3f"},"sf":"$sfDir"}"""
    // Driver parse contract (round-14 verdict task 2): ONE short
    // self-contained JSON line PER QUERY before the headline — each line
    // parses on its own, so per-query numbers survive any bounded stdout
    // window that truncates the full map line below. Additions only: the
    // headline, the full line and the sidecar keep their exact shapes.
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"""{"q":${jstr(k)},"sec":${jnum(v)}}""")
    }
    println(headline)
    println(line)
    println(headline)
    // Sidecar with the untruncated line: committed at round end, so the
    // full per-query map survives regardless of the driver's window.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] sidecar write failed: ${e.getMessage}") }
    spark.stop()
  }
}
