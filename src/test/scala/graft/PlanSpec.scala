package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Plan-shape assertions for scale discipline: these queries must keep the
  * physical-plan properties that make them survive a 100× scale-up —
  * filter/projection pushdown into the parquet scan, broadcast joins for
  * small dimensions, partial (map-side) aggregation, no cartesian products
  * where a key join exists.
  */
class PlanSpec extends GraftSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q1_agg: filter pushed to parquet scan, partial aggregation, pruned columns") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("l_orderkey"), "should not read unused columns\n" + p)
  }

  test("q3_join_agg: small dimension broadcast, no shuffle of customer") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q9_exists: semi/anti joins with pushed filters, no cartesian") {
    val p = plan("q9_exists")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q12_star: all dimension joins broadcast; only fact table scanned wide") {
    val p = plan("q12_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), "star dims must broadcast, not sort-merge\n" + p)
  }

  test("q2_topn_filter: limit pushed as TakeOrderedAndProject, scan pruned to 4 columns") {
    val p = plan("q2_topn_filter")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters: [IsNotNull(p_size)"), p)
  }

  test("incremental dedup: the bucketed fingerprint store joins without a store-side shuffle") {
    import spark.implicits._
    // force SMJ: at spec scale the store would broadcast, masking the
    // bucketed-scan property the 100 TB claim rests on
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val tbl = "graft_incstore_planspec"
      graft.ops.Scale.writeBucketed(
        (0 until 1000).map(i => s"b$i").toDF("__bucket"),
        tbl, Seq("__bucket"),
        numBuckets = spark.sparkContext.defaultParallelism,
        sortCols = Seq("__bucket"))
      val dump = (500 until 1500).map(i => (i.toLong, s"b$i")).toDF("doc_id", "__bucket")
      val joined = dump.join(spark.table(tbl), Seq("__bucket"))
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("Bucketed: true"), p)
      // exactly ONE exchange: the dump side; the store scan is already
      // hash-partitioned by its bucket layout (formatted explain lists
      // each node twice — tree line + detail header — so match headers)
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
        "the fingerprint store side must not shuffle\n" + p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental EXACT dedup: bucketed fingerprint store, store side never shuffles") {
    import spark.implicits._
    // broadcast disabled for the same reason as the minhash-store pin —
    // and the function itself pins a MERGE hint on the store side (the
    // store grows without bound across dumps, so broadcasting history is
    // the one plan that cannot survive; the hint makes the bucketed
    // layout the plan regardless of a stale size estimate)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val state = java.nio.file.Files.createTempDirectory("planspec-exact")
        .toString + "/state"
      val nb = spark.sparkContext.defaultParallelism
      val b1 = (0 until 2000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      graft.functions.Dedup.incrementalExactDedup(b1, Seq("text"), "doc_id", state, nb)
      val b2 = (1000 until 3000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      val p = graft.functions.Dedup
        .incrementalExactDedupDry(b2, Seq("text"), "doc_id", state, nb)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("Bucketed: true"), p)
      assert(p.contains("SortMergeJoin") && p.contains("LeftAnti"), p)
      // Catalyst pushes the history anti-join BELOW the keep-min join
      // (store-filter-first — strictly better: dropped history rows never
      // enter the keep-min shuffle) and lifts the null-safe order filter
      // into the keep-min join keys. The four exchanges are all
      // batch-sized: payload→anti-join probe, payload→keep-min join,
      // partial→final group-by, mins→keep-min join. The store-history
      // side — the one side that is UNBOUNDED at 100 TB — contributes
      // none: its scan arrives pre-partitioned by the bucket layout.
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 4, p)
      // a store-side shuffle would be an Exchange over exactly the
      // 2-column fingerprint relation — assert none exists
      assert("Exchange\\nInput \\[2\\]: \\[__fp#".r.findFirstIn(p).isEmpty,
        "the fingerprint store side must not shuffle\n" + p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup exact: single shuffle on fingerprint, no raw-text shuffle key") {
    val p = plan("p_dedup_exact")
    // partitioning expression is the fingerprint hash pair, not `text`
    assert(p.contains("fingerprint64"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("dedup exact: agg+join shape — partial aggregation, payload never window-sorted") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val p = graft.functions.Dedup.exactDedup(docs, Seq("text"), "doc_id")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // min-per-key is a hash aggregate (map-side partial), joined back —
    // not a row_number window dragging the payload through a sort
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("stratified exact-k: rank-limit pushdown — partial WindowGroupLimit before the exchange") {
    val p = plan("p_sample_stratified")
    // row_number() <= k must rewrite to a map-side group limit, so each
    // task ships at most k rows per stratum instead of sorting the stratum
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expected partial + final WindowGroupLimit\n" + p)
  }

  test("fused expressions are in the plans (no interpreted HOF fallback)") {
    // the dedup/ANN/text hot paths must run through the codegen'd custom
    // expressions — a refactor back to transform/zip_with/aggregate
    // higher-order functions would be silently 10-100× slower
    val mh = plan("p_dedup_minhash")
    assert(mh.contains("word_shingle_set") && mh.contains("minhash_sig"), mh)
    val ng = plan("p_dedup_ngram")
    assert(ng.contains("char_ngram_set"), ng)
    val ann = plan("p_ann_bruteforce")
    assert(ann.contains("vec_dot") && ann.contains("vec_normalize"), ann)
    val lang = plan("p_text_lang_fingerprint")
    assert(lang.contains("stopword_hits"), lang)
    val clean = plan("p_text_clean")
    assert(clean.contains("repetition_ratio"), clean)
  }

  test("embedding LSH: banded self-join exchanges carry no vector column") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val normed = df.select(col("vec_id").as("__id"),
      graft.functions.Similarity.normalize(col("embedding")).as("__v"))
    val p = graft.functions.Similarity
      .embeddingCandidatePairs(normed, dim = 2, bits = 4, tables = 2, maxBucketSize = 100)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // every Exchange in the candidate-pair plan ships (bucket, id) only:
    // the vector column must be projected away before any shuffle
    val exchangeBlocks = p.split("\n\n").filter(_.matches("(?s)\\(\\d+\\) Exchange.*"))
    assert(exchangeBlocks.nonEmpty, p)
    exchangeBlocks.foreach { b =>
      assert(!b.contains("__v"), s"vector rides a shuffle:\n$b\n\nfull plan:\n$p")
    }
  }

  test("ann brute force: corpus never shuffled, queries broadcast") {
    val p = plan("p_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the only exchange allowed is for the final per-query top-k window
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ann top-k is two-phase: per-partition pruning before the ranking window") {
    for (name <- Seq("p_ann_bruteforce", "p_ann_ivf_free")) {
      val p = plan(name)
      // phase 1: the bounded-heap mapPartitions truncation must sit below…
      assert(p.contains("MapPartitions"), s"$name missing local top-k pruning\n$p")
      // …phase 2: the global window that assigns ranks
      assert(p.contains("Window"), s"$name missing final ranking window\n$p")
      val mp = p.indexOf("MapPartitions")
      val win = p.indexOf("Window")
      // formatted explain prints operators leaves-last within the tree text;
      // use the numbered-tree section order: Window must consume the
      // MapPartitions output, so it appears above (before) it in the tree
      assert(win < mp, s"$name: window should be downstream of pruning\n$p")
    }
  }

  test("ivf: centroid assignment is the fused matrix loop, not a per-centroid tree") {
    val p = plan("p_ann_ivf_free")
    // a greatest(struct(dot…)) tree per centroid stops codegen'ing past a
    // few dozen cells; the fused expression must be in the final plan
    assert(p.contains("nearest_centroids"), p)
    // the deterministic variant fuses its double-matrix assignment too,
    // and its centroid relation broadcasts into the probe scoring
    val pd = plan("p_ann_ivf")
    assert(pd.contains("nearest_centroid_d"), pd)
    assert(pd.contains("BroadcastExchange") || pd.contains("BroadcastHashJoin"), pd)
  }

  test("ivf: Lloyd refinement is a vector-sum aggregate, no corpus explode") {
    import spark.implicits._
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val assigned = vecs.select(
      graft.functions.Similarity.normalize(col("embedding")).as("__cv"),
      (col("vec_id") % 3).cast("int").as("__cid"))
    val p = graft.functions.Similarity.lloydRefine(assigned, dim = 4)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // posexplode re-keys N×dim rows; the aggregate shuffles
    // O(partitions × nCentroids × dim) partial sums instead
    assert(!p.contains("Generate"), p)
    assert(p.contains("vec_sum"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("simhash pairs: bucket-size cap adds no window over the banded relation") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val p = graft.functions.Dedup.simHashNearDupPairs(docs, "doc_id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the simhash pair plan has no legitimate window operator; the cap must
    // be a groupBy count + broadcast anti-join, not a count-window sort
    assert(!p.contains("Window"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("asof join: window plan, no join operator at all") {
    val p = plan("p_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "asof must not fall back to a nested-loop join\n" + p)
  }

  test("hll sketch: one keyed exchange, partial object aggregation, no window/join") {
    val p = plan("p_sketch_hll")
    // the register aggregate must combine map-side (ObjectHashAggregate
    // partial+final) with a single exchange on the group key — the whole
    // point of carrying 256 bytes instead of the vocabulary
    assert(p.contains("ObjectHashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("cms sketch: bounded counter table, probe side broadcast against it") {
    val p = plan("p_sketch_cms")
    // counter build is a plain partial-aggregated count; the 20-key × 4-row
    // probe relation must broadcast — never shuffle the counter table to a
    // sort-merge join against 80 rows
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("semantic dedup: cell equi-join, no nested-loop fallback") {
    val p = plan("p_dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must be an equi-join on the cell id\n" + p)
  }

  test("range join: equi-join on bins, no nested-loop fallback") {
    val p = plan("p_range_join")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "range join must bin into an equi-join\n" + p)
  }

  test("interval overlap join: equi-join on bins, no nested-loop fallback") {
    val p = plan("p_interval_join")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "interval join must bin into an equi-join\n" + p)
  }

  test("merge update/exception: validation rides the plan — zero jobs at build time") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import spark.implicits._
    val t = Seq((1, "a"), (2, "b")).toDF("k", "s")
    val s = Seq((2, "x"), (3, "y")).toDF("k", "s")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val up = graft.ops.Merge.mergePlan(s, t, Seq("k" -> "k", "s" -> "s"), Seq("k"),
        graft.core.ConflictStrategy.Update)
      val ex = graft.ops.Merge.mergePlan(s, t, Seq("k" -> "k"), Seq("k"),
        graft.core.ConflictStrategy.Exception)
      val pUp = up.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val pEx = ex.queryExecution.explainString(ExplainMode.fromString("formatted"))
      org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark.sparkContext)
      // the old shape ran an eager isEmpty() validation job during plan
      // construction — two scans of the key columns per merge at scale
      assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} eager job(s)")
      // the fail-fast checks must still exist, as in-plan raise_error guards
      assert(pUp.contains("raise_error"), pUp)
      assert(pEx.contains("raise_error"), pEx)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("merge ignore: single equi-join on keys, target read once") {
    import spark.implicits._
    val t = Seq((1, "a"), (2, "b")).toDF("k", "s")
    val s = Seq((2, "x"), (3, "y")).toDF("k", "s")
    val p = graft.ops.Merge.mergePlan(s, t, Seq("k" -> "k", "s" -> "s"), Seq("k"),
      graft.core.ConflictStrategy.Ignore)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("paragraph dedup: agg+join first-occurrence rule, no occurrence-group sort, hash shuffle keys") {
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val p = graft.functions.Dedup.paragraphDedup(d, "doc_id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // first-occurrence = min(struct) hash aggregate (map-side partial),
    // never a row_number window sorting each boilerplate group
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
    // the occurrence relation shuffles on the 96-bit hash pair, not the
    // paragraph text itself
    assert(!p.contains("hashpartitioning(__para"), p)
  }

  test("url blocklist filter: broadcast suffix join, no cartesian, no corpus LIKE scan") {
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val p = graft.functions.TextAnalysis
      .filterByDomainBlocklist(d, "doc_id", "text", Seq("bad.com", "tracker.net"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    // suffix matching is the exploded equi-join — no LIKE/contains scan
    assert(!p.toLowerCase.contains("like"), p)
  }

  test("token-budget sample: one windowed shuffle per stratum, nothing else") {
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "lang")
      .withColumn("ntok", org.apache.spark.sql.functions.lit(10L))
    val p = graft.functions.Sampling
      .sampleToTokenBudget(d, Seq("lang"), "ntok", budget = 1000L, orderBy = Seq(col("doc_id")))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Window"), p)
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p)
  }

  test("corpus report: one hash-aggregate pass with map-side partials, single exchange") {
    val d = Tables.read(spark, sfDir, "documents").select("lang", "text")
    val p = graft.functions.TextAnalysis.corpusReport(d, "text", "lang")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p) // lang agg (+ distinct expand)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("global order index: range partitioning, no single-partition window") {
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "lang")
    val p = graft.functions.Sampling.globalOrderIndex(d,
        orderBy = Seq(col("doc_id")))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the corpus spreads over a range shuffle; a naive global row_number
    // would show Exchange SinglePartition + Window
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
    // offsets ride a broadcast join, not another corpus shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bloom decontaminate: clean branch is shuffle-free; only candidates reach the anti-join") {
    // parquet-backed (a toy LocalRelation constant-folds the filters away);
    // bare operator, without the verify harness's repartition/orderBy
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val ref = d.where(col("doc_id") % 7 === 0).select("text")
    val p = graft.functions.Dedup.bloomDecontaminate(d, "text", ref, "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the Bloom prefilter appears as a codegen'd filter on both branches
    assert("bloom_might_contain".r.findAllIn(p).size >= 2, p)
    // the union's clean branch (NOT bloom_might_contain) must reach the
    // union without any Exchange: in the formatted plan every Exchange
    // block must sit under the anti-join subtree, never between the
    // negated filter and the Union. Cheap structural proxy: the anti-join
    // exists and there are at most 2 exchanges total (candidates + ref) —
    // a whole-corpus shuffle would add a third.
    assert(p.contains("LeftAnti"), p)
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quality gate: narrow codegen'd projection — no exchange before the verdict") {
    val p = plan("p_quality_filter")
    // the fused expressions carry the signals; no interpreted stopword walk
    assert(p.contains("line_stat") && p.contains("distinct_stopword_hits") &&
      p.contains("repetition_ratio"), p)
    // signals + verdict are one projection over the scan: the only
    // exchange permitted is the final presentation orderBy's range
    // partitioning — none of them hash-partition (that would mean a
    // shuffle computed a per-doc signal)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("kmeans: assignment is a fused matrix projection — no join, no shuffle") {
    val p = plan("p_embed_kmeans")
    // centroids ride the expression references, so the FINAL assignment
    // is one narrow projection over the (cached) corpus: no join of any
    // kind, and no exchange except the presentation orderBy's range
    // partitioning; the per-round meanPool shuffles happen inside the
    // collect()ed update rounds, never in this output plan
    assert(p.contains("nearest_centroid_d"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("release pipeline: five stages, bounded exchanges, no cartesian") {
    val p = plan("p_pipeline_release")
    assert(!p.contains("CartesianProduct"), p)
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size <= 8, p)
  }

  test("cluster budgeting: fused assignment, broadcast join, no cartesian") {
    val p = plan("p_sample_cluster_budget")
    assert(p.contains("nearest_centroid_d"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("image dedup: fused dhash projection, banded join, no cartesian") {
    val p = plan("p_dedup_image")
    assert(p.contains("payload_dhash"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("pii scrub: zero-shuffle regex projection over the scan") {
    val p = plan("p_pii_scrub")
    // redaction + counts are one projection; only the presentation
    // orderBy's range partitioning may exchange
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
  }

  test("lm scoring: model rides the expression references — narrow scoring projection") {
    val p = plan("p_lm_score")
    // the fused LM probes are in-plan; scoring itself never shuffles
    // (the only exchange is the presentation orderBy's range partitioning)
    assert(p.contains("bigram_lm_stat"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("quantized ann: corpus stays unshuffled; quantize/dequantize ride the scan projection") {
    val p = plan("p_ann_quantized")
    // queries broadcast against the corpus exactly like the float scan
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // two-phase top-k preserved on the quantized path
    assert(p.contains("MapPartitions") && p.contains("Window"), p)
  }

  test("ngram decontaminate: eval grams broadcast; corpus probe is shuffle-free") {
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val ev = d.where(col("doc_id") % 10 === 7)
    val p = graft.functions.Dedup
      .ngramOverlapContaminated(d, "doc_id", "text", ev, "text", n = 13)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    // the only hash exchanges allowed are the eval-side distinct (tiny)
    // and the per-doc hit count (contamination-rate sized) — the training
    // corpus itself must never hashpartition on text-derived keys
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("bpe tokenization: chained-replace narrow projection, zero exchange") {
    val d = Tables.read(spark, sfDir, "documents")
    val p = d.select(col("doc_id"),
        graft.functions.Bpe.bpeTokenCount(col("text"),
          Seq(("e", "s"), ("es", "t"), ("t", "h"))).as("n"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // pure narrow shape: a single Project over the scan — no exchange,
    // no join, nothing corpus-sized materialized (the word-level
    // aggregate lambda itself is interpreted, which is fine: it is
    // per-row work riding the scan)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("Scan parquet"), p)
  }

  test("fused classifier scoring: pure narrow projection — no exchange, no join") {
    val d = Tables.read(spark, sfDir, "documents")
    val p = graft.functions.Classifier.scoreQualityFused(d, "doc_id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("perceptron_score"), p)
    assert(p.contains("Scan parquet"), p)
  }

  test("LSH/edit/embedding verify joins: every join-back exchange is pinned REPARTITION_BY_NUM") {
    // AQE's byte-based partition coalescing serializes CPU-dense stages
    // whose input is byte-small (the round-7 p_dedup_edit 25 s pathology:
    // candidates are two longs per row, the verification is a 64-slot
    // signature agreement + array_intersect + Levenshtein DP). The fix —
    // repartition on each verify join's own key with an explicit count —
    // must survive refactors: the candidate→verify join-backs in every
    // LSH family must read from a REPARTITION_BY_NUM exchange, which AQE
    // never coalesces. (ENSURE_REQUIREMENTS exchanges elsewhere in the
    // plan are fine — they feed byte-proportional work.)
    for (name <- Seq("p_dedup_edit", "p_dedup_minhash", "p_dedup_embedding")) {
      val p = plan(name)
      // corpus-decoration round-robins are also REPARTITION_BY_NUM; count
      // only the verify pins (hash-partitioned on the pair ids). At this
      // tiny SF the broadcast-join cascade preserves the first pin's
      // partitioning, so Spark legitimately elides the later redundant
      // pins — every verify stage still inherits pinned parallelism —
      // which is why the floor is 1, not one-per-join.
      val pinned = "hashpartitioning\\(id_[ab][#0-9L]*, \\d+\\), REPARTITION_BY_NUM".r
        .findAllIn(p).size
      assert(pinned >= 1,
        s"$name: expected a pinned verify exchange, found none\n$p")
    }
  }

  test("fix_mojibake: codegen'd narrow projection, zero exchanges") {
    val p = plan("p_fix_mojibake")
    assert(p.contains("fix_mojibake"), p)
    // the only exchange allowed is the final presentation sort
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("url policy: blocklist joins broadcast, no sort-merge") {
    val p = plan("p_url_policy")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("salted join: hash join on salted keys, no nested-loop fallback") {
    val p = plan("op_salted_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
