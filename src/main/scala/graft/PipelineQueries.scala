package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Verification queries for the LLM-training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal — builder-prompt north
  * star). SQL-expressible outputs carry DuckDB oracles; LSH-based outputs
  * are deterministic (fixed seeds/hashes) but not SQL-expressible →
  * rows-only checks, with their semantics pinned by PipelineSpec instead.
  */
object PipelineQueries {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")

  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "embeddings")

  /** documents ∪ shifted-id copies — a corpus with guaranteed exact dups. */
  private def docsWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select("doc_id", "text", "lang", "source")
    d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      col("text"), col("lang"), col("source")))
  }

  /** documents ∪ mutated copies ("… extra token") — guaranteed near-dups. */
  private def docsWithNearDups(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select("doc_id", "text")
    d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" zq extra trailing token")).as("text")))
  }

  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactDedup(docsWithDups(spark, sfDir), Seq("text"), "doc_id")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  def dedupMinHash(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = docsWithNearDups(spark, sfDir)
    val pairs = Dedup.minHashNearDupPairs(corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.6,
      bucketMinOnly = true)
    Dedup.keepFirstFromPairs(corpus, "doc_id", pairs)
      .select("doc_id").orderBy("doc_id")
  }

  def dedupSimHash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simHashNearDupPairs(docsWithNearDups(spark, sfDir), "doc_id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")

  def dedupNgram(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = docsWithNearDups(spark, sfDir)
    val pairs = Dedup.ngramJaccardNearDupPairs(corpus, "doc_id", "text",
      n = 8, numHashes = 32, bands = 8, threshold = 0.6, bucketMinOnly = true)
    Dedup.keepFirstFromPairs(corpus, "doc_id", pairs)
      .select("doc_id").orderBy("doc_id")
  }

  /** embeddings ∪ perturbed copies (one dimension nudged) — near-dups in
    * cosine space. */
  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embs(spark, sfDir).select("vec_id", "embedding")
    val perturbed = e.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x + lit(0.05f)).otherwise(x)).as("embedding"))
    val corpus = e.unionByName(perturbed)
    Similarity.embeddingNearDupPairs(corpus, "vec_id", "embedding",
      dim = 64, threshold = 0.98, bits = 10, tables = 6)
      .select("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  def annBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embs(spark, sfDir)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "qid", "qv", k = 10)
      .select(col("qid"), col("vec_id"), col("rank").cast("bigint").as("rank"))
      .orderBy("qid", "rank")
  }

  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embs(spark, sfDir)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Similarity.ivfTopK(e, "vec_id", "embedding", q, "qid", "qv", k = 10,
      nCentroids = 16, nProbe = 4)
      .select(col("qid"), col("vec_id"), col("rank").cast("bigint").as("rank"))
      .orderBy("qid", "rank")
  }

  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val toks = TextAnalysis.tokenCount(col("text"))
    val stop = size(filter(split(trim(col("text")), "\\s+"),
      t => array_contains(lit(TextAnalysis.EnStopwords.toArray), lower(t))))
    d.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars_m"),
      toks.cast("bigint").as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).cast("bigint").as("n_subwords"),
      stop.cast("bigint").as("stopword_hits"))
      .orderBy("doc_id")
  }

  /** Language-ID + fingerprint (heuristic / custom expression → rows-only;
    * semantics pinned by PipelineSpec). */
  def textLangFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      TextAnalysis.fingerprint64(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Cleaning + PII masking + repetition signals (regex-heuristic ops →
    * rows-only; semantics pinned in PipelineSpec). */
  def textClean(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      TextAnalysis.fingerprint64(TextAnalysis.cleanText(col("text"))).as("clean_fp"),
      length(TextAnalysis.maskPii(col("text"))).cast("bigint").as("masked_len"),
      TextAnalysis.repetitionRatio(col("text"), 3).as("rep3"))
      .orderBy("doc_id")

  /** Backward as-of join: each view/click event attaches the user's most
    * recent prior purchase value; oracle = DuckDB's native ASOF JOIN. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.read(spark, sfDir, "events")
    val l = events.where(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "ts")
    val r = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("rts"), col("value").as("purchase_value"))
    graft.ops.AsOfJoin.backward(l, r, Seq("user_id"), "ts", "rts")
      .select("event_id", "user_id", "purchase_value")
      .orderBy("event_id")
  }

  /** Range join: views counted inside each purchase's 1-hour follow-up
    * window; oracle = DuckDB's native inequality (IE) join. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.read(spark, sfDir, "events")
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("s"), (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
    graft.ops.RangeJoin.pointInInterval(views, purchases,
      "ts", "s", "e", Seq("user_id"), binWidthSeconds = 3600)
      .groupBy("pid").agg(count(lit(1)).as("n_views"))
      .orderBy("pid")
  }

  def multimodal(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(docs(spark, sfDir))
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("modality"), col("n_bytes"),
        col("decoded_width"), col("decoded_height"), col("frames_sampled"))
      .orderBy("media_id")
  }

  /** Composed end-to-end training-data pipeline: quality filter → exact
    * dedup (keep-first) → per-language corpus stats. The full chain is
    * SQL-expressible, so the whole composition is oracle-checked. */
  def pipelineE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select("doc_id", "text", "lang")
    val corpus = d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      col("text"), col("lang")))
    val withTok = corpus.withColumn("ntok", TextAnalysis.tokenCount(col("text")))
    val filtered = withTok.where(col("ntok").between(20, 80))
    val deduped = Dedup.exactDedup(filtered, Seq("text"), "doc_id")
    deduped.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("bigint")).cast("bigint").as("total_chars"),
        (sum(col("ntok")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_pipeline_e2e" -> (pipelineE2e _),
    "p_dedup_exact" -> (dedupExact _),
    "p_dedup_minhash" -> (dedupMinHash _),
    "p_dedup_simhash" -> (dedupSimHash _),
    "p_dedup_ngram" -> (dedupNgram _),
    "p_dedup_embedding" -> (dedupEmbedding _),
    "p_ann_bruteforce" -> (annBruteForce _),
    "p_ann_ivf" -> (annIvf _),
    "p_text_quality" -> (textQuality _),
    "p_text_lang_fingerprint" -> (textLangFingerprint _),
    "p_text_clean" -> (textClean _),
    "p_asof_join" -> (asofJoin _),
    "p_range_join" -> (rangeJoin _),
    "p_multimodal" -> (multimodal _),
  )

  /** DuckDB oracles for the SQL-expressible subset. */
  val oracleSql: Map[String, String] = Map(
    "p_range_join" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS pid, user_id, ts AS s, ts + INTERVAL 1 HOUR AS e
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.pid, cast(count(*) as bigint) AS n_views
        |FROM p JOIN v ON v.user_id = p.user_id AND v.ts >= p.s AND v.ts <= p.e
        |GROUP BY p.pid
        |ORDER BY p.pid""".stripMargin,
    "p_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type IN ('view','click')),
        |r AS (SELECT user_id, ts AS rts, value AS purchase_value FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, r.purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts
        |ORDER BY l.event_id""".stripMargin,
    "p_pipeline_e2e" ->
      """WITH u AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, lang FROM documents),
        |q AS (
        |  SELECT *, length(string_split_regex(trim(text), '\s+')) AS ntok
        |  FROM u
        |  WHERE length(string_split_regex(trim(text), '\s+')) BETWEEN 20 AND 80),
        |m AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
        |k AS (SELECT q.* FROM q JOIN m ON q.doc_id = m.doc_id)
        |SELECT lang,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(sum(cast(length(text) as bigint)) as bigint) AS total_chars,
        |  cast(cast(sum(ntok) as double) / count(*) as double) AS avg_tokens
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "p_dedup_exact" ->
      """WITH u AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, lang, source FROM documents),
        |m AS (SELECT min(doc_id) AS doc_id FROM u GROUP BY text)
        |SELECT u.doc_id, u.lang, u.source FROM u JOIN m ON u.doc_id = m.doc_id
        |ORDER BY u.doc_id""".stripMargin,

    "p_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT q.qid, e.vec_id,
        |        list_cosine_similarity(q.qv, e.embedding) AS cos
        |      FROM embeddings e CROSS JOIN q)
        |SELECT qid, vec_id, rank FROM (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        |  FROM s) t
        |WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,

    "p_text_quality" ->
      ("""SELECT doc_id,
        |  cast(length(text) as bigint) AS n_chars_m,
        |  cast(length(string_split_regex(trim(text), '\s+')) as bigint) AS n_tokens,
        |  cast(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |    x -> greatest(1, cast(ceil(length(x) / 4.0) as int)))) as bigint) AS n_subwords,
        |  cast(length(list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> list_contains([""".stripMargin +
      TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",") +
      """], lower(x)))) as bigint) AS stopword_hits
        |FROM documents
        |ORDER BY doc_id""".stripMargin),

    "p_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CASE cast(doc_id % 3 as int) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  cast(octet_length(encode(text)) as bigint) AS n_bytes,
        |  cast(doc_id % 640 + 1 as int) AS decoded_width,
        |  cast(doc_id % 480 + 1 as int) AS decoded_height,
        |  cast(CASE cast(doc_id % 3 as int)
        |    WHEN 0 THEN 1
        |    WHEN 1 THEN 0
        |    ELSE greatest(1, (n_chars * 10) // 1000) END as int) AS frames_sampled
        |FROM documents
        |ORDER BY media_id""".stripMargin,
  )
}
