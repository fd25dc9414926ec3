package graft

import graft.functions.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class PipelineSpec extends GraftSuite {
  import spark.implicits._

  private val base =
    "spark makes distributed data processing simple and fast for large scale analytics pipelines"

  private def docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base + " extra"), // near dup of 1
    (4L, "completely different content about cooking pasta with tomatoes and basil leaves"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank at dawn"))
    .toDF("doc_id", "text")

  test("exactDedup keeps lowest id per duplicate text") {
    val out = Dedup.exactDedup(docs, Seq("text"), "doc_id")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("packSequences: floor-of-cumsum greedy packing per group") {
    val d = Seq(
      (1L, "en", 300L), (2L, "en", 300L), (3L, "en", 300L), // cum-before: 0,300,600
      (4L, "en", 900L), // before=900 → seq 1 (overflows it — own doc allowed)
      (5L, "de", 100L), (6L, "de", 600L)) // de packs independently
      .toDF("doc_id", "lang", "ntok")
    val rows = graft.functions.Sampling
      .packSequences(d, Seq("lang"), "doc_id", "ntok", budget = 500L)
      .select("doc_id", "seq_id", "seq_pos").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) == ((0L, 0L))) // before 0
    assert(rows(2L) == ((0L, 1L))) // before 300
    assert(rows(3L) == ((1L, 0L))) // before 600 → seq 1
    assert(rows(4L) == ((1L, 1L))) // before 900 → still seq 1 (greedy overflow)
    assert(rows(5L) == ((0L, 0L)) && rows(6L) == ((0L, 1L))) // de independent
  }

  test("MinHashSigExpr is bit-identical to the Column min-wise form") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sets = Dedup.wordShingleSets(docs, "doc_id", "text", 3)
    val viaColumn = sets.select($"__id",
      Dedup.minHashSignature($"sets", 32).as("sig"))
    val viaExpr = sets.select($"__id",
      ColumnBridge.column(graft.functions.MinHashSigExpr(
        ColumnBridge.expression($"sets"), 32)).as("sig"))
    val mismatches = viaColumn.as("c").join(viaExpr.as("e"), "__id")
      .where(col("c.sig") =!= col("e.sig")).count()
    assert(mismatches == 0)
  }

  test("IntersectCountExpr is bit-identical to size(array_intersect)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // adversarial shapes: duplicates (count once), nulls on one/both
    // sides (count once iff on both), empties, disjoint, asymmetric
    // sizes (exercises the smaller-side table build both ways)
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](2L, 3L, 4L)),
      (Seq[java.lang.Long](1L, 1L, 2L, 2L), Seq[java.lang.Long](2L, 2L, 1L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](5L), Seq[java.lang.Long]()),
      (Seq[java.lang.Long](null, 1L), Seq[java.lang.Long](null, null, 2L)),
      (Seq[java.lang.Long](null, 1L), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](7L, 8L, 9L), Seq[java.lang.Long](10L, 11L)),
      ((1L to 100L).map(java.lang.Long.valueOf),
        (50L to 200L).map(java.lang.Long.valueOf)),
      ((1L to 3L).map(java.lang.Long.valueOf),
        (0L to 1000L).map(java.lang.Long.valueOf)))
    val df = rows.toDF("a", "b")
    val fused = ColumnBridge.column(graft.functions.IntersectCountExpr(
      ColumnBridge.expression($"a"), ColumnBridge.expression($"b")))
    val bad = df.select(
      fused.as("f"), size(array_intersect($"a", $"b")).as("s"))
      .where($"f" =!= $"s").count()
    assert(bad == 0)
    // randomized sweep: 500 pairs of random multisets over a small
    // domain (forces collisions/dups), both orders
    val r = new scala.util.Random(42)
    val rand = (1 to 500).map { _ =>
      def arr() = Seq.fill(r.nextInt(40))(java.lang.Long.valueOf(r.nextInt(25).toLong))
      (arr(), arr())
    }.toDF("a", "b")
    val badRand = rand.select(
      fused.as("f"), size(array_intersect($"a", $"b")).as("s"))
      .where($"f" =!= $"s").count()
    assert(badRand == 0)
  }

  test("crossCorpusNearDupPairs flags only contaminated training docs") {
    val train = docs // ids 1..5: 1,2 identical; 3 near-dup of 1
    val ref = Seq((101L, base), // contaminates 1, 2, 3
      (102L, "reference only benchmark row about astronomy and telescopes tonight"))
      .toDF("ref_id", "text")
    val pairs = graft.functions.Dedup.crossCorpusNearDupPairs(
      train, "doc_id", "text", ref, "ref_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 101L)) && pairs.contains((2L, 101L)))
    assert(pairs.contains((3L, 101L))) // near-dup crosses the corpus line
    assert(!pairs.exists { case (a, b) => a == 4L || a == 5L || b == 102L })
    // no train-train pairs ever appear
    assert(pairs.forall { case (_, b) => b >= 100L })
  }

  test("minhash LSH finds near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("keepFirstFromPairs drops higher-id dup side") {
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
    val kept = Dedup.keepFirstFromPairs(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L))
    assert(kept.contains(4L) && kept.contains(5L))
  }

  test("SimHash64Expr matches the composed-Column reference implementation") {
    // reference implementation: the explicit 64-term Column construction
    def referenceSimHash(text: org.apache.spark.sql.Column) = {
      val toks = split(lower(trim(text)), "\\s+")
      val hashes = transform(toks, t => xxhash64(t))
      (0 until 64).map { b =>
        val mask = shiftleft(lit(1L), b)
        val bitSum = aggregate(hashes, lit(0L),
          (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0L, 1L).otherwise(-1L))
        when(bitSum > 0, mask).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    val samples = Seq("hello world", "", "   ", "one", "a\tb\nc", "\ttab lead",
      "Mixed CASE Text here", "unicode héllo wörld ünïcode", "x " * 50)
      .toDF("t")
    val rows = samples.select(Dedup.simHash64($"t").as("fast"),
      referenceSimHash($"t").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("simhash banding is exact for hamming <= 3 (matches brute force)") {
    val base2 = (1 to 60).map(i => (i.toLong,
      s"document number $i with shared vocabulary words alpha beta gamma delta " +
        (if (i % 3 == 0) "epsilon zeta" else s"unique token$i marker$i"))).toDF("doc_id", "text")
    val banded = Dedup.simHashNearDupPairs(base2, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = base2.select($"doc_id", Dedup.simHash64($"text").as("sh"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
  }

  test("simhash keep-set oracle: anchor domination pins hamming-0 pairs and >3 separation") {
    // Pin the two facts p_dedup_simhash_keep's DuckDB oracle rests on
    // (PipelineQueries.dedupSimHashKeep scaladoc): (1) 128 anchor repeats
    // dominate every content token, so a base and its mutated copy (same
    // anchor) have IDENTICAL simhashes; (2) distinct anchors sit far apart
    // (> 3 hamming) so no cross pair can qualify.
    val sfDir = "/root/testdata/sf0.001"
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    def anchor(id: org.apache.spark.sql.Column) =
      repeat(concat(lit(" zq"), id.cast("string")), 128)
    val baseSh = d.select($"doc_id",
        Dedup.simHash64(concat($"text", anchor($"doc_id"))).as("sh"))
      .as[(Long, Long)].collect().toMap
    val copySh = d.where($"doc_id" % 3 === 0).select($"doc_id",
        Dedup.simHash64(concat(
          array_join(reverse(split($"text", "\\s+")), " "),
          lit(" qz extra filler"), anchor($"doc_id"))).as("sh"))
      .as[(Long, Long)].collect()
    copySh.foreach { case (id, sh) =>
      assert(sh == baseSh(id), s"copy of $id drifted from its base simhash")
    }
    val hs = baseSh.values.toArray
    val minCross = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
    } yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minCross > 3, s"cross-anchor hamming $minCross would admit false pairs")
    // and the end-to-end keep-set equals the mutation-map prediction
    val kept = PipelineQueries.dedupSimHashKeep(spark, sfDir)
      .as[Long].collect().toSeq
    val expected = d.select("doc_id").as[Long].collect()
      .map(id => if (id % 15 == 0) id - 100000 else id).sorted.toSeq
    assert(kept == expected)
  }

  test("minhash keep-set oracle: shingle floor holds and keep-set equals the mutation map") {
    // Pin the measured fact p_dedup_minhash_keep's DuckDB oracle rests on
    // (PipelineQueries.dedupMinHashKeep scaladoc): every doc has >= 8
    // distinct word-3-shingles, so j(base, copy) = m/(m+3) >= 8/11 > 0.6.
    // (Token tagging makes distinct docs' sets disjoint STRUCTURALLY —
    // same prefix only within one doc id — so only the floor needs
    // measuring.) Tagging is injective per token, so the tagged text's
    // distinct-shingle count equals the raw text's, measured here.
    val sfDir = "/root/testdata/sf0.001"
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val minShingles = d
      .select(size(Dedup.wordShingles($"text", 3)).as("m"))
      .agg(min($"m")).as[Int].head()
    assert(minShingles >= 8, s"min distinct shingles $minShingles breaks the j >= 8/11 bound")
    // end-to-end: the bucket-min LSH keep-set equals the mutation-map prediction
    val kept = PipelineQueries.dedupMinHashKeep(spark, sfDir).as[Long].collect().toSeq
    val expected = d.select("doc_id").as[Long].collect()
      .map(id => if (id % 15 == 0) id - 100000 else id).sorted.toSeq
    assert(kept == expected)
  }

  test("paragraphDedup: first occurrence wins, within-doc repeats collapse, stolen docs go empty") {
    val corpus = Seq(
      (1L, "alpha\n\nfooter", "en"),
      (2L, "beta\n\nfooter\n\nbeta", "en"), // cross-doc footer dup + within-doc repeat
      (3L, "footer", "de"),                 // every paragraph stolen by doc 1
      (4L, "gamma\n\ngamma\n\ndelta", "en") // within-doc repeat, rest survives
    ).toDF("doc_id", "text", "lang")
    val out = graft.functions.Dedup.paragraphDedup(corpus, "doc_id", "text")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "alpha\n\nfooter", "en"),
      (2L, "beta", "en"),
      (3L, "", "de"),
      (4L, "gamma\n\ndelta", "en")))
  }

  test("componentMin: true CC beats keep-first on chains; converges; fails fast past maxIter") {
    // chain 2–9–4 (middle largest): keep-first keeps {2, 4}, CC keeps {2}
    val pairs = Seq((2L, 9L), (4L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val nodes = Seq(2L, 4L, 9L, 20L, 21L, 100L).toDF("doc_id")
    spark.catalog.clearCache()
    val ccDf = graft.functions.Dedup.keepMinComponent(nodes, "doc_id", pairs)
    val cc = ccDf.as[Long].collect().sorted.toSeq
    assert(cc == Seq(2L, 20L, 100L))
    // lineage truncation pin: the labels relation is checkpointed every
    // round, so the final plan must be one round deep regardless of how
    // many propagation rounds ran (round 5's un-truncated plan carried
    // 877 Exchange nodes); and componentMin must leave nothing persisted
    // through the CacheManager.
    val plan = ccDf.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 6,
      s"componentMin plan carries unrolled iteration lineage:\n$plan")
    assert(spark.sharedState.cacheManager.isEmpty,
      "componentMin leaked a persisted relation")
    val kf = graft.functions.Dedup.keepFirstFromPairs(nodes, "doc_id", pairs)
      .as[Long].collect().sorted.toSeq
    assert(kf == Seq(2L, 4L, 20L, 100L)) // the documented approximation gap
    // long path needs diameter rounds: 1-2-3-...-8 as a path graph
    val path = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = graft.functions.Dedup.componentMin(path, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
    val err = intercept[IllegalArgumentException] {
      graft.functions.Dedup.componentMin(path, maxIter = 2)
    }
    assert(err.getMessage.contains("did not converge"))
  }

  test("cc chain construction: j(M,B) = j(M,E) = m/(2m+2) clears 0.4; j(B,E) = 0") {
    // the oracle facts behind p_dedup_cc, measured on the real corpus
    val sfDir = "/root/testdata/sf0.001"
    val kept = PipelineQueries.dedupCcKeep(spark, sfDir).as[Long].collect().toSeq
    val expected = Tables.read(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == expected)
  }

  test("bloomDecontaminate: exact semantics survive a saturated filter; empty ref is identity") {
    val corpus = (1L to 200L).map(i => (i, s"doc number $i")).toDF("id", "text")
    val ref = corpus.where($"id" % 4 === 0).select($"text")
    val expected = (1L to 200L).filterNot(_ % 4 == 0)
    // deliberately undersized filter (expected=2 at fpp 0.5): most rows
    // become candidates, yet the exact verify join restores the result
    val loose = graft.functions.Dedup
      .bloomDecontaminate(corpus, "text", ref, "text", expectedRefItems = 2, fpp = 0.5)
    assert(loose.select("id").as[Long].collect().sorted.toSeq == expected)
    val tight = graft.functions.Dedup.bloomDecontaminate(corpus, "text", ref, "text")
    assert(tight.select("id").as[Long].collect().sorted.toSeq == expected)
    // empty reference → corpus unchanged (no filter built at all)
    val none = graft.functions.Dedup
      .bloomDecontaminate(corpus, "text", ref.limit(0), "text")
    assert(none.count() == 200)
  }

  test("globalOrderIndex: dense gap-free ordinal equal to the total order, any input partitioning") {
    val d = (1L to 500L).map(i => (i, s"t$i")).toDF("id", "t")
    def run(input: org.apache.spark.sql.DataFrame) =
      graft.functions.Sampling.globalOrderIndex(input,
          orderBy = Seq(md5($"id".cast("string")), $"id"), partitions = 7)
        .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val pos = run(d)
    // dense 0..n-1
    assert(pos.values.toSeq.sorted == (0L until 500L).toSeq)
    // equals the one-window definition
    val expected = d.select($"id", md5($"id".cast("string")).as("k"))
      .as[(Long, String)].collect().sortBy(r => (r._2, r._1))
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(pos == expected)
    // invariant to input partitioning
    assert(run(d.repartition(13)) == expected)
  }

  test("topTokensAtScale: exact ranks on a skewed corpus where the sketch prunes; guard throws") {
    // 20 heavy tokens (200 occurrences each) drowned in 5000 singletons:
    // vocabulary 5020 >> capacity 64, so Misra-Gries genuinely prunes,
    // yet the top-10 must equal the exact groupBy ranking.
    val heavy = (0 until 20).flatMap(i => Seq.fill(200)(f"heavy$i%02d"))
    val noise = (0 until 5000).map(i => s"rare$i")
    val docs = scala.util.Random.shuffle(heavy ++ noise).grouped(97)
      .map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(8).persist()
    val viaScale = graft.functions.TextAnalysis
      .topTokensAtScale(docs, "text", k = 10, capacity = 64)
      .as[(String, Long)].collect().toSeq
    val viaExact = graft.functions.TextAnalysis.topTokens(docs, "text", 10)
      .as[(String, Long)].collect().toSeq
    assert(viaScale == viaExact)
    assert(viaScale.forall(_._2 == 200L))
    // N = 9000, N/(cap+1): top-10 at capacity 2 cannot clear the bound →
    // the operator must refuse rather than return approximate ranks
    val err = intercept[IllegalArgumentException] {
      graft.functions.TextAnalysis.topTokensAtScale(docs, "text", k = 10, capacity = 2)
    }
    assert(err.getMessage.contains("raise capacity"))
    docs.unpersist()
  }

  test("vocabCoverage: corpus-adaptive top-K membership ratio") {
    // corpus vocab by count: a(×5), b(×3), c(×2), d/e(×1) — top-2 = {a, b}
    val d = Seq(
      (1L, "a a b"),      // 3/3 in top-2
      (2L, "a b c"),      // 2/3
      (3L, "c d e"),      // 0/3
      (4L, "a a c b")     // 3/4
    ).toDF("doc_id", "text")
    val out = graft.functions.TextAnalysis.vocabCoverage(d, "doc_id", "text", 2)
      .select("doc_id", "vocab_hits", "n_tokens", "coverage")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 1.0), (2L, 2L, 3L, 2.0 / 3),
      (3L, 0L, 3L, 0.0), (4L, 3L, 4L, 0.75)))
  }

  test("sampleToTokenBudget: greedy prefix per stratum, never overshoots, deterministic") {
    val d = Seq(
      (1L, "en", 400L), (2L, "en", 400L), (3L, "en", 400L), (4L, "en", 400L),
      (5L, "de", 900L), (6L, "de", 200L), (7L, "de", 50L)
    ).toDF("doc_id", "lang", "ntok")
    val out = graft.functions.Sampling
      .sampleToTokenBudget(d, Seq("lang"), "ntok", budget = 1000L,
        orderBy = Seq(col("doc_id")))
      .select("doc_id", "lang", "ntok")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // en: 400+400 = 800 <= 1000, +400 overshoots -> prefix of 2
    // de: 900 <= 1000, +200 overshoots -> everything after excluded too
    assert(out.map(_._1) == Seq(1L, 2L, 5L))
    assert(out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      .forall(_._2 <= 1000L))
    val again = graft.functions.Sampling
      .sampleToTokenBudget(d, Seq("lang"), "ntok", budget = 1000L,
        orderBy = Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == Seq(1L, 2L, 5L))
  }

  test("quality perceptron: separates its seed, bucket matches Spark md5, scoring matches driver replay") {
    import graft.functions.Classifier
    val (w, b) = Classifier.QualityModel
    // the trained model classifies its own seed perfectly (linearly
    // separable by construction: disjoint vocabularies)
    Classifier.QualitySeed.foreach { case (t, y) =>
      val s = Classifier.tokenize(t).groupBy(Classifier.bucket)
        .map { case (k, c) => w.getOrElse(k, 0L) * c.size }.sum + b
      assert((s > 0) == (y == 1), s"seed misclassified (score $s, label $y): $t")
    }
    // the driver-side feature hash IS Spark's substring(md5(t), 1, 4)
    val toks = Seq("the", "committee", "世界", "Mixed-Case")
    val sparkBuckets = toks.toDF("t")
      .select(substring(md5(col("t")), 1, 4)).as[String].collect().toSeq
    assert(sparkBuckets == toks.map(Classifier.bucket))
    // engine scoring == driver-side replay on arbitrary rows
    val d = Seq(
      (1L, "The committee published its findings after a review."),
      (2L, "click here to unlock your exclusive bonus now"),
      (3L, ""), (4L, "zzz unseen tokens only qqq")).toDF("doc_id", "text")
    val got = Classifier.scoreQuality(d, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val want = Seq(
      (1L, "The committee published its findings after a review."),
      (2L, "click here to unlock your exclusive bonus now"),
      (3L, ""), (4L, "zzz unseen tokens only qqq")).map { case (id, t) =>
      id -> (Classifier.tokenize(t).map(tok => w.getOrElse(Classifier.bucket(tok), 0L)).sum + b)
    }.toMap
    assert(got == want, s"got $got want $want")
    assert(got(1L) > 0 && got(2L) <= 0)
  }

  test("hitsExact: hub/authority separation on a bipartite-ish graph, deterministic, max=Scale") {
    // h1,h2 each link to a1,a2,a3; a* link nowhere; plus one weak node
    val edges = Seq(
      ("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
      ("h2", "a1"), ("h2", "a2"), ("h2", "a3"),
      ("w", "a1")).toDF("src", "dst")
    val out = graft.functions.Graph.hitsExact(edges, "src", "dst", iterations = 4)
      .select("node", "hub_micros", "auth_micros")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // hubs: h1 == h2 (symmetric), both at the max; w weaker but nonzero
    assert(out("h1") == out("h2"))
    assert(out("h1")._1 == graft.functions.Graph.Scale)
    assert(out("w")._1 > 0 && out("w")._1 < out("h1")._1)
    // authorities: a1 (cited by all three) at the max; a2 == a3 below it
    assert(out("a1")._2 == graft.functions.Graph.Scale)
    assert(out("a2")._2 == out("a3")._2 && out("a2")._2 < out("a1")._2)
    // pure authorities have zero hub score; pure hubs zero authority
    assert(out("a1")._1 == 0L && out("h1")._2 == 0L)
    // deterministic across partitionings
    val again = graft.functions.Graph.hitsExact(edges.repartition(5), "src", "dst", iterations = 4)
      .select("node", "hub_micros", "auth_micros")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out == again)
  }

  test("fused perceptron scorer == relational scorer, including whitespace and unicode shapes") {
    import graft.functions.Classifier
    val d = Seq(
      (1L, Some("The committee published its findings after a review.")),
      (2L, Some("click here  to\tunlock\nyour exclusive bonus now")),
      (3L, Some("")), (4L, Some("   ")), (5L, Some("Mixed CASE Tokens 世界 é")),
      (6L, Some(" leading and trailing  ")),
      (7L, None)).toDF("doc_id", "text")
    val rel = Classifier.scoreQuality(d, "doc_id", "text")
      .select("doc_id", "score", "keep").as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val fus = Classifier.scoreQualityFused(d, "doc_id", "text")
      .select("doc_id", "score", "keep").as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(rel == fus, s"rel $rel\nfus $fus")
    // NULL text scores the bias on BOTH paths (the fused expression must
    // not null-propagate where the relational explode-then-left-join
    // yields score = bias)
    assert(fus.find(_._1 == 7L).map(_._2).contains(Classifier.QualityModel._2))
    // and over a real corpus slice
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    val r2 = Classifier.scoreQuality(docs, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val f2 = Classifier.scoreQualityFused(docs, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(r2 == f2)
  }

  test("epochMix: integral replicas + deterministic fractional top-up, 0 drops, absent defaults to 1") {
    val d = (1L to 400L).map(i => (i, i match {
      case x if x % 4 == 0 => "de" case x if x % 4 == 1 => "fr"
      case x if x % 4 == 2 => "zh" case _ => "es"
    })).toDF("doc_id", "lang")
    val out = graft.functions.Sampling.epochMix(d, "lang", "doc_id",
        Seq("de" -> 2.5, "fr" -> 0.5, "zh" -> 0.0), salt = "s")
      .select("doc_id", "lang", "epoch")
      .as[(Long, String, Int)].collect().toSeq
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // de: every doc at least twice (epochs 0,1), ~half a third time
    val deCounts = byLang("de").groupBy(identity).view.mapValues(_.size)
    assert(deCounts.forall { case (_, c) => c == 2 || c == 3 })
    assert(deCounts.count(_._2 == 3) > 20 && deCounts.count(_._2 == 3) < 80)
    // fr: subset kept exactly once, roughly half
    val frCounts = byLang("fr").groupBy(identity).view.mapValues(_.size)
    assert(frCounts.forall(_._2 == 1))
    assert(frCounts.size > 20 && frCounts.size < 80)
    // zh: dropped entirely; es (absent from factors): exactly once each
    assert(!byLang.contains("zh"))
    assert(byLang("es").sorted == (1L to 400L).filter(_ % 4 == 3))
    // epoch indices are 0-based and dense per doc
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (0 until rows.size))
    }
    // deterministic across partitionings
    val again = graft.functions.Sampling.epochMix(d.repartition(7), "lang", "doc_id",
        Seq("de" -> 2.5, "fr" -> 0.5, "zh" -> 0.0), salt = "s")
      .select("doc_id", "lang", "epoch")
      .as[(Long, String, Int)].collect().toSeq
    assert(out.sorted == again.sorted)
  }

  test("stratifiedExactK: exact per-stratum counts, deterministic, salt-independent membership") {
    val d = (1L to 300L).map(i => (i, if (i % 3 == 0) "de" else "en")).toDF("doc_id", "lang")
    val s1 = graft.functions.Sampling
      .stratifiedExactK(d, Seq("lang"), Seq("doc_id"), k = 10, salt = 7L)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 10L, "de" -> 10L))
    // deterministic: same call → same rows
    val again = graft.functions.Sampling
      .stratifiedExactK(d, Seq("lang"), Seq("doc_id"), k = 10, salt = 7L)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    // a different salt draws a different (independent) sample
    val other = graft.functions.Sampling
      .stratifiedExactK(d, Seq("lang"), Seq("doc_id"), k = 10, salt = 8L)
    assert(other.select("doc_id").as[Long].collect().sorted.toSeq !=
      s1.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("scaleDocuments: m× rows, disjoint replica vocabularies, salted ids") {
    val d = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val scaled = graft.ops.Scale.scaleDocuments(d, 3)
    assert(scaled.count() == 3 * d.count())
    def vocab(rep: Int) = scaled
      .where($"doc_id" >= rep * 10000000L && $"doc_id" < (rep + 1) * 10000000L)
      .select(explode(split($"text", "\\s+")).as("t")).distinct()
    assert(vocab(0).intersect(vocab(1)).count() == 0)
    assert(vocab(1).intersect(vocab(2)).count() == 0)
    assert(scaled.select("doc_id").distinct().count() == scaled.count())
  }

  test("scaleEmbeddings: m× rows, norm-preserving rotation") {
    val e = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val scaled = graft.ops.Scale.scaleEmbeddings(e, 3, dim = 64)
    assert(scaled.count() == 3 * e.count())
    val norms = scaled.select(
        ($"vec_id" % 10000000L).as("base_id"),
        round(aggregate($"embedding", lit(0.0d),
          (acc, x) => acc + x * x), 4).as("n2"))
      .groupBy("base_id").agg(countDistinct("n2").as("k"))
      .where($"k" > 1).count()
    assert(norms == 0, "rotation must preserve the norm of every replica")
  }

  test("simhash: identical text → distance 0; near text → small distance") {
    val sh = docs.select($"doc_id", Dedup.simHash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 8)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 8)
    val pairs = Dedup.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("char-ngram jaccard pairs") {
    val pairs = Dedup.ngramJaccardNearDupPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("fingerprint64 is deterministic and whitespace-normalizing") {
    val out = Seq(("A  Text\tHere", 1), ("a text here", 2), ("other", 3)).toDF("t", "i")
      .select(TextAnalysis.fingerprint64($"t").as("fp")).as[Long].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("tokenCount handles empty and blank") {
    val out = Seq("", "   ", "one", "two words  here").toDF("t")
      .select(TextAnalysis.tokenCount($"t")).as[Int].collect().toSeq
    assert(out == Seq(0, 0, 1, 3))
  }

  test("langId routes common languages") {
    val out = Seq(
      "the cat is on the mat and it is happy with the sun",
      "el gato es un animal que vive en la casa con una familia",
      "der Hund ist ein Tier und die Katze ist nicht mit dem Hund",
      "le chat est un animal qui vit dans la maison pour les enfants",
      "zzz qqq xxx www").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(out == Seq("en", "es", "de", "fr", "und"))
  }

  test("qualityMetrics shapes") {
    val m = TextAnalysis.qualityMetrics($"t")
    val row = Seq("The quick brown fox, 42 times!").toDF("t")
      .select(m.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(row.getAs[Long]("n_chars") == 30)
    assert(row.getAs[Long]("n_tokens") == 6)
    assert(row.getAs[Double]("punct_ratio") > 0 && row.getAs[Double]("punct_ratio") < 0.2)
    assert(row.getAs[Double]("digit_ratio") > 0)
    assert(row.getAs[Double]("stopword_ratio") > 0)
  }

  test("cleanText strips control chars and collapses whitespace") {
    val out = Seq("a\tb\u0007c   d\n\ne").toDF("t")
      .select(TextAnalysis.cleanText($"t")).as[String].collect()(0)
    assert(out == "a b c d e")
  }

  test("chunkByTokens: stride/overlap arithmetic, short docs, tail chunks, no shuffle") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),   // n=10 <= 32: one chunk
      (2L, (1 to 33).map(i => s"w$i").mkString(" ")),   // ceil(25/24)=2 chunks
      (3L, (1 to 100).map(i => s"w$i").mkString(" "))   // ceil(92/24)=4 chunks
    ).toDF("doc_id", "text")
    val out = graft.functions.TextAnalysis
      .chunkByTokens(d, "doc_id", "text", chunkTokens = 32, overlap = 8)
    val rows = out.as[(Long, Long, String, Long)].collect()
      .sortBy(r => (r._1, r._2)).toList
    assert(rows.map(r => (r._1, r._2, r._4)) == List(
      (1L, 0L, 10L),
      (2L, 0L, 32L), (2L, 1L, 9L),
      (3L, 0L, 32L), (3L, 1L, 32L), (3L, 2L, 32L), (3L, 3L, 28L)))
    // overlap: chunk 1 of doc 2 starts at token 25
    assert(rows.find(r => r._1 == 2L && r._2 == 1L).get._3.startsWith("w25 "))
    // tail chunk of doc 3 covers tokens 73..100
    assert(rows.last._3 == (73 to 100).map(i => s"w$i").mkString(" "))
    // embarrassingly parallel: the chunking plan contains no exchange
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p)
  }

  test("filterByDomainBlocklist: label-boundary suffix match, case/port/userinfo handling") {
    val d = Seq(
      (1L, "plain text, no urls"),
      (2L, "see https://sub.badsite.com/x?q=1"),     // subdomain of blocked
      (3L, "see https://notbadsite.com/x"),          // NOT a label-boundary match
      (4L, "see http://BADSITE.COM/y"),              // exact, case-folded
      (5L, "see https://user:pw@deep.a.badsite.com:443/z"), // userinfo + port
      (6L, "see http://goodsite.org and https://badsite.com") // any hit drops doc
    ).toDF("doc_id", "text")
    val kept = graft.functions.TextAnalysis
      .filterByDomainBlocklist(d, "doc_id", "text", Seq("badsite.com"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("stripHtml: blocks go with content, tags strip, entities decode once, text '<' survives") {
    val in = Seq(
      "<p>hello <b>world</b></p>",
      "<script>if (a < b) { alert(\"x\"); }</script>rest",
      "<style type=\"text/css\">p > a { }</style>kept",
      "pre <!-- <p>gone</p> --> post",
      "&amp;lt; stays; 1 < 2 stays; &lt;i&gt;literal&lt;/i&gt;",
      "<DIV CLASS='X'>upper</DIV>"
    ).toDF("text")
    val out = in.select(graft.functions.TextAnalysis.stripHtml($"text").as("t"))
      .as[String].collect().toSeq
    assert(out == Seq(
      "hello world",
      "rest",
      "kept",
      "pre post",
      "&lt; stays; 1 < 2 stays; <i>literal</i>",
      "upper"))
  }

  test("maskPii replaces emails, phones, IPs") {
    val out = Seq("mail me at jo.doe+x@example.co.uk or call 555-123-4567; host 192.168.0.1 ok")
      .toDF("t").select(TextAnalysis.maskPii($"t")).as[String].collect()(0)
    assert(out.contains("<EMAIL>") && !out.contains("example.co.uk"), out)
    assert(out.contains("<PHONE>") && !out.contains("555-123-4567"), out)
    assert(out.contains("<IP>") && !out.contains("192.168.0.1"), out)
    val clean = Seq("no pii here just words").toDF("t")
      .select(TextAnalysis.maskPii($"t")).as[String].collect()(0)
    assert(clean == "no pii here just words")
  }

  test("repetitionRatio flags repeated n-grams") {
    val rows = Seq(
      "one two three four five six seven eight",          // no repetition
      "spam spam spam spam spam spam spam spam",           // max repetition
      "ab").toDF("t")
      .select(TextAnalysis.repetitionRatio($"t", 2)).as[Double].collect()
    assert(rows(0) == 0.0)
    assert(rows(1) > 0.8)
    assert(rows(2) == 0.0) // shorter than n tokens
  }

  test("asof backward join attaches latest right row at or before left ts") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 1000L)
    val left = Seq((1L, ts(10), "e10"), (1L, ts(15), "e15"), (1L, ts(20), "e20"),
      (1L, ts(30), "e30"), (2L, ts(20), "f20")).toDF("uid", "t", "tag")
    val right = Seq((1L, ts(15), 100.0), (1L, ts(25), 200.0), (3L, ts(1), 9.0))
      .toDF("uid", "rt", "pv")
    val out = graft.ops.AsOfJoin.backward(left, right, Seq("uid"), "t", "rt")
      .orderBy("uid", "t")
      .collect().map(r => (r.getString(2), Option(r.get(r.fieldIndex("pv"))))).toSeq
    assert(out == Seq(
      ("e10", None), ("e15", Some(100.0)), ("e20", Some(100.0)), ("e30", Some(200.0)),
      ("f20", None)))
  }

  test("HyperplaneSigsExpr table-0 signature matches the composed-Column form") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.HyperplaneSigsExpr
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map(i => (i.toLong,
      Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = vecs.toDF("id", "v")
    val bits = 10
    val exprSigs = ColumnBridge.column(
      HyperplaneSigsExpr(ColumnBridge.expression(col("v")), 16, bits, 3))
    val rows = df.select(
      exprSigs.getItem(0).as("fast"),
      Similarity.hyperplaneSignature(col("v"), 16, bits).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("asof forward join attaches earliest right row at or after left ts") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 1000L)
    val left = Seq((1L, ts(10), "e10"), (1L, ts(15), "e15"), (1L, ts(20), "e20"),
      (1L, ts(30), "e30"), (2L, ts(20), "f20")).toDF("uid", "t", "tag")
    val right = Seq((1L, ts(15), 100.0), (1L, ts(25), 200.0), (3L, ts(1), 9.0))
      .toDF("uid", "rt", "pv")
    val out = graft.ops.AsOfJoin.forward(left, right, Seq("uid"), "t", "rt")
      .orderBy("uid", "t")
      .collect().map(r => (r.getString(2), Option(r.get(r.fieldIndex("pv"))))).toSeq
    assert(out == Seq(
      ("e10", Some(100.0)), ("e15", Some(100.0)), ("e20", Some(200.0)), ("e30", None),
      ("f20", None)))
  }

  test("range join: points land in covering intervals exactly once") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val points = Seq((1L, ts(5), "p5"), (1L, ts(30), "p30"), (1L, ts(200), "p200"),
      (2L, ts(5), "q5")).toDF("uid", "t", "tag")
    // interval spanning many bins + boundary-inclusive checks
    val intervals = Seq((1L, ts(0), ts(30), "i0_30"), (1L, ts(25), ts(300), "i25_300"),
      (2L, ts(6), ts(10), "i6_10")).toDF("uid", "s", "e", "iname")
    val out = graft.ops.RangeJoin.pointInInterval(points, intervals,
      "t", "s", "e", Seq("uid"), binWidthSeconds = 600)
      .select("tag", "iname").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      ("p5", "i0_30"), ("p30", "i0_30"), ("p30", "i25_300"), ("p200", "i25_300")))
  }

  test("interval overlap join: exactly-once pairs across bin boundaries, closed-end ties") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    // left intervals per key 1: [0,90] spans 2+ hourly bins; [200,210]
    val l = Seq((1L, 10L, ts(0), ts(90)), (1L, 11L, ts(200), ts(210)),
      (2L, 12L, ts(0), ts(30))).toDF("k", "lid", "ls", "le")
    // rights: [60,120] overlaps lid 10 in TWO shared bins (must pair ONCE);
    // [90,95] touches lid 10 exactly at the closed end; [211,220] just
    // misses lid 11; key 2's [10,20] overlaps lid 12
    val r = Seq((1L, 20L, ts(60), ts(120)), (1L, 21L, ts(90), ts(95)),
      (1L, 22L, ts(211), ts(220)), (2L, 23L, ts(10), ts(20)))
      .toDF("k", "rid", "rs", "re")
    val out = graft.ops.RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        Seq("k"), binWidthSeconds = 3600)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // exactly-once: no duplicates even for the multi-shared-bin pair
    assert(out.size == out.distinct.size, s"duplicated pairs: $out")
    assert(out.toSet == Set((10L, 20L), (10L, 21L), (12L, 23L)), out.toString)
  }

  test("range join fails fast on an interval spanning too many bins") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val points = Seq((1L, ts(5), "p5")).toDF("uid", "t", "tag")
    // 300-minute interval over 1-second bins = 18000 bins > the 10000 cap
    val intervals = Seq((1L, ts(0), ts(300), "wide")).toDF("uid", "s", "e", "iname")
    val ex = intercept[Exception] {
      graft.ops.RangeJoin.pointInInterval(points, intervals,
        "t", "s", "e", Seq("uid"), binWidthSeconds = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("spans more than")), ex.toString)
  }

  test("deterministic sampling: stable, fraction-accurate, salt-independent") {
    import graft.functions.Sampling
    val big = (1 to 10000).map(i => (i.toLong, s"doc$i", if (i % 2 == 0) "en" else "es"))
      .toDF("id", "t", "lang")
    val s1 = Sampling.deterministicSample(big, Seq("id"), 0.2).select("id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(big, Seq("id"), 0.2).select("id").as[Long].collect().toSet
    assert(s1 == s2) // stable across runs
    assert(math.abs(s1.size - 2000) < 150, s1.size)
    val s3 = Sampling.deterministicSample(big, Seq("id"), 0.2, salt = 7).select("id").as[Long].collect().toSet
    assert(s1 != s3) // independent sample under a different salt
    // nested property: smaller fraction is a subset of larger (same salt)
    val s4 = Sampling.deterministicSample(big, Seq("id"), 0.1).select("id").as[Long].collect().toSet
    assert(s4.subsetOf(s1))
    val strat = Sampling.stratifiedSample(big, "lang", Map("en" -> 0.5, "es" -> 0.1), Seq("id"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(strat("en") - 2500) < 200, strat)
    assert(math.abs(strat("es") - 500) < 120, strat)
    val top = Sampling.topKPerGroup(big, Seq("lang"), Seq(col("id").desc), 3)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(top.values.forall(_ == 3))
  }

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f)),
    (5L, Seq(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine") {
    val q = Seq((100L, Seq(1.0f, 0.05f, 0.0f))).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, "qid", "qv", k = 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("embedding near-dup pairs: only the close pair survives") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding", dim = 3, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("weighted token-budget mix: floor shares per stratum, zero-weight strata dropped") {
    val d = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 3L, 10L), ("c", 4L, 10L))
      .toDF("lang", "doc_id", "ntok")
    // a: floor(40·0.5/0.75) = 26 → both rows (cum 10, 20); b: floor(40·0.25/0.75)
    // = 13 → one row; c: no weight → budget 0 → dropped
    val out = graft.functions.Sampling.sampleToTokenBudgetWeighted(
        d, "lang", "ntok", 40L, Map("a" -> 0.5, "b" -> 0.25), Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      graft.functions.Sampling.sampleToTokenBudgetWeighted(
        d, "lang", "ntok", 40L, Map("a" -> -1.0), Seq(col("doc_id")))
    }
  }

  test("hashSplit: deterministic across partitionings, labels exhaustive, fractions guarded") {
    val d = Tables.read(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    val splits = Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    def assign(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Sampling.hashSplit(df, "doc_id", splits)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    val a = assign(d)
    val b = assign(d.repartition(7))
    assert(a == b, "split assignment must not depend on partitioning")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // quantized to 1/256 buckets: 90% of 500 docs lands within a few %
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    intercept[IllegalArgumentException] {
      graft.functions.Sampling.hashSplit(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("semantic dedup: single cell ≡ exact all-pairs; oversized cells drop, never explode") {
    val all = Similarity.semanticDedupPairs(vecs, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all == Set((1L, 2L)))
    // the cell guard excludes hotspot cells entirely (raise nCentroids),
    // mirroring the LSH bucket cap — it must never go quadratic on them
    val guarded = Similarity.semanticDedupPairs(vecs, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 1, maxCellSize = 2)
    assert(guarded.isEmpty)
  }

  test("ivfTopK approximates brute force on clustered data") {
    val n = 200
    val clustered = (0 until n).map { i =>
      val c = i % 4
      val basev = Array.fill(8)(0.0f)
      basev(c * 2) = 1.0f
      basev((c * 2 + 1) % 8) = 0.3f + (i % 10) * 0.01f
      (i.toLong, basev.toSeq)
    }.toDF("vec_id", "embedding")
    val q = Seq((0L, { val a = Array.fill(8)(0.0f); a(0) = 1.0f; a(1) = 0.35f; a.toSeq }))
      .toDF("qid", "qv")
    val brute = Similarity.bruteForceTopK(clustered, "vec_id", "embedding", q, "qid", "qv", k = 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(clustered, "vec_id", "embedding", q, "qid", "qv", k = 10,
      nCentroids = 8, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.intersect(brute).size >= 7, s"IVF recall too low: ${ivf.intersect(brute).size}/10")
  }

  test("ivfTopKDet: recall on clustered data; exhaustive probing equals brute force; deterministic") {
    val n = 200
    val clustered = (0 until n).map { i =>
      val c = i % 4
      val basev = Array.fill(8)(0.0f)
      basev(c * 2) = 1.0f
      basev((c * 2 + 1) % 8) = 0.3f + (i % 10) * 0.01f
      (i.toLong, basev.toSeq)
    }.toDF("vec_id", "embedding")
    val q = Seq((0L, { val a = Array.fill(8)(0.0f); a(0) = 1.0f; a(1) = 0.35f; a.toSeq }))
      .toDF("qid", "qv")
    val brute = Similarity.bruteForceTopK(clustered, "vec_id", "embedding", q, "qid", "qv", k = 10)
      .select("vec_id").as[Long].collect().toSet
    val det = Similarity.ivfTopKDet(clustered, "vec_id", "embedding", q, "qid", "qv",
        topK = 10, nCentroids = 8, rounds = 2, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(det.intersect(brute).size >= 7, s"det-IVF recall too low: ${det.intersect(brute).size}/10")
    // probing every cell ≡ brute force (the det analogue of p_ann_ivf_exhaustive)
    val all = Similarity.ivfTopKDet(clustered, "vec_id", "embedding", q, "qid", "qv",
        topK = 10, nCentroids = 8, rounds = 2, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(all == brute, s"exhaustive det-IVF must equal brute force: $all vs $brute")
    // partitioning-invariant (the whole point of the deterministic build)
    val again = Similarity.ivfTopKDet(clustered.repartition(7), "vec_id", "embedding",
        q, "qid", "qv", topK = 10, nCentroids = 8, rounds = 2, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(det == again)
  }

  test("ivfTopKDet memberFilter may reference non-id corpus columns") {
    val n = 120
    val corpus = (0 until n).map { i =>
      val c = i % 4
      val basev = Array.fill(8)(0.0f)
      basev(c * 2) = 1.0f
      basev((c * 2 + 1) % 8) = 0.3f + (i % 10) * 0.01f
      (i.toLong, basev.toSeq, if (i % 2 == 0) "en" else "de")
    }.toDF("vec_id", "embedding", "lang")
    val q = Seq((0L, { val a = Array.fill(8)(0.0f); a(0) = 1.0f; a(1) = 0.35f; a.toSeq }))
      .toDF("qid", "qv")
    // metadata predicate lives in a column kmeansFit projects away —
    // must resolve (joined back in by id), and every hit must satisfy it
    val hits = Similarity.ivfTopKDet(corpus, "vec_id", "embedding", q, "qid", "qv",
        topK = 10, nCentroids = 4, rounds = 2, nProbe = 4,
        memberFilter = Some(col("lang") === "en"))
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.nonEmpty && hits.forall(_ % 2 == 0), s"non-en hit leaked: $hits")
    // and the unfiltered schema/results are untouched by the new path
    val unfiltered = Similarity.ivfTopKDet(corpus, "vec_id", "embedding", q, "qid", "qv",
        topK = 10, nCentroids = 4, rounds = 2, nProbe = 4)
    assert(unfiltered.columns.toSeq == Seq("qid", "vec_id", "cosine", "rank"))
  }

  test("stripBoilerplate: per-source frequent lines removed, order kept, all-boiler docs empty") {
    val d = Seq(
      (1L, "a", "unique one\nNAV BAR\nbody text 1"),
      (2L, "a", "nav bar\nunique two"),   // case/space variant still counts
      (3L, "a", "nav  bar"),              // doc that is ALL boilerplate
      (4L, "b", "nav bar\nother site")    // 'nav bar' is NOT frequent in b
    ).toDF("doc_id", "source", "text")
    val out = graft.functions.TextAnalysis
      .stripBoilerplate(d, "doc_id", "source", "text", minDocFrac = 0.9)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, "a", "unique one\nbody text 1"), // middle line stripped, order kept
      (2L, "a", "unique two"),
      (3L, "a", ""),                        // surviving row, empty text
      // single-doc source: every line is 1/1 "frequent", but boilerplate
      // must repeat across >= 2 docs — nothing stripped
      (4L, "b", "nav bar\nother site")))
    // a line in 2 of 3 source-a docs stays below a frac-1.0 threshold
    val d2 = d.unionByName(
      Seq((5L, "a", "fresh text only")).toDF("doc_id", "source", "text"))
      .where(col("doc_id") =!= 3)
    val loose = graft.functions.TextAnalysis
      .stripBoilerplate(d2, "doc_id", "source", "text", minDocFrac = 1.0)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(loose.filter(_._1 <= 2).map(_._3) ==
      Seq("unique one\nNAV BAR\nbody text 1", "nav bar\nunique two"))
  }

  test("tar shards: real ustar archives round-trip through an independent parser") {
    import graft.io.TarShards
    val d = Seq((1L, "alpha"), (2L, "b" * 513), (17L, ""), (42L, "héllo wörld"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_test").toString
    val report = TarShards.writeTarShards(d, "doc_id", "text", nShards = 2, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent mini-untar: walk 512-byte headers, verify checksums,
    // extract (name, content) — nothing shared with the writer
    def untar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
      var i = 0
      while (i + 512 <= bytes.length && bytes(i) != 0) {
        val name = new String(bytes, i, 100, "US-ASCII").takeWhile(_ != 0)
        val size = java.lang.Long.parseLong(
          new String(bytes, i + 124, 11, "US-ASCII").trim, 8).toInt
        val stated = java.lang.Long.parseLong(
          new String(bytes, i + 148, 6, "US-ASCII"), 8)
        var sum = 0L
        (0 until 512).foreach { j =>
          sum += (if (j >= 148 && j < 156) ' '.toInt else bytes(i + j) & 0xff)
        }
        assert(sum == stated, s"checksum mismatch for $name")
        assert(new String(bytes, i + 257, 5, "US-ASCII") == "ustar")
        out += ((name, java.util.Arrays.copyOfRange(bytes, i + 512, i + 512 + size)))
        i += 512 + ((size + 511) / 512) * 512
      }
      out.toSeq
    }
    val expected = Map(1L -> "alpha", 2L -> "b" * 513, 17L -> "", 42L -> "héllo wörld")
    var seen = Map.empty[Long, String]
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      assert(bytes.length == report(shard)._3, s"report length mismatch for $f")
      val members = untar(bytes)
      // members are id-ordered within the shard
      assert(members.map(_._1) == members.map(_._1).sortBy(n => n.stripSuffix(".txt").toLong))
      members.foreach { case (n, c) =>
        seen += n.stripSuffix(".txt").toLong -> new String(c, "UTF-8")
      }
    }
    assert(seen == expected)
    // the spec formula the oracle uses equals the real archive length
    report.foreach { case (_, (n, payload, tarLen)) =>
      assert(tarLen >= n * 512 + 1024 && (tarLen - 1024) % 512 == 0)
    }
  }

  test("semanticDecontaminate drops eval-similar rows; empty eval keeps everything") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)), // near eval vector 1 -> dropped
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ev = Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("ev")
    val survivors = Similarity.semanticDecontaminate(
        corpus, "vec_id", "embedding", ev, "ev", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(3L, 4L))
    // empty eval set: nothing can leak, so everything survives
    val all = Similarity.semanticDecontaminate(
        corpus, "vec_id", "embedding", ev.limit(0), "ev", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(all == Seq(1L, 2L, 3L, 4L))
  }

  test("ivfTopKDet filtered path fails fast on reserved internal column names") {
    val corpus = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(4)(d => if (d == i % 4) 1.0f else 0.0f), i)
    }.toDF("vec_id", "embedding", "__cell")
    val q = Seq((0L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfTopKDet(corpus, "vec_id", "embedding", q, "qid", "qv",
        topK = 3, nCentroids = 2, rounds = 1, nProbe = 2,
        memberFilter = Some(col("__cell") > 0))
    }
    assert(ex.getMessage.contains("__cell"))
  }

  test("buildIvfIndex/searchIvf: one index serves many query batches, equal to the one-shot form") {
    import graft.functions.Similarity
    val sfDir = "/root/testdata/sf0.001"
    val e = Tables.read(spark, sfDir, "embeddings")
    val index = Similarity.buildIvfIndex(e, "vec_id", "embedding", nCentroids = 16)
    index.cells.persist()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    val qA = e.where($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val qB = e.where($"vec_id".between(10, 14)).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val viaIndexA = rows(Similarity.searchIvf(index, qA, "qid", "qv", k = 10, nProbe = 4))
    val viaIndexB = rows(Similarity.searchIvf(index, qB, "qid", "qv", k = 10, nProbe = 4))
    // deterministic construction → the one-shot form builds the same index
    val oneShotA = rows(Similarity.ivfTopK(e, "vec_id", "embedding", qA, "qid", "qv",
      k = 10, nCentroids = 16, nProbe = 4))
    assert(viaIndexA == oneShotA)
    assert(viaIndexB.map(_._1).distinct.sorted == Seq(10L, 11L, 12L, 13L, 14L))
    index.cells.unpersist()
  }

  test("ivfTopK holds recall at 256 centroids (fused matrix path) on sf0.1 embeddings") {
    // 256 cells over the sf0.1 corpus exercises the centroid-matrix loop at
    // a width where the old per-centroid expression tree could not codegen
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val q = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "qid", "qv", k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding", q, "qid", "qv", k = 10,
      nCentroids = 256, nProbe = 64)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    brute.foreach { case (qid, hits) =>
      val recall = ivf.getOrElse(qid, Array.empty).map(_._2).toSet
        .intersect(hits.map(_._2).toSet).size
      assert(recall >= 7, s"IVF recall too low for query $qid: $recall/10")
    }
  }

  test("image header synth/decode roundtrip: PNG IHDR + JPEG SOF0") {
    import Multimodal.ImageHeader
    val payload = "embedded text".getBytes("UTF-8")
    val png = ImageHeader.synthPng(640, 480, payload)
    assert(ImageHeader.decode(png).contains((640, 480)))
    assert(png.length == 57 + payload.length)
    val jpg = ImageHeader.synthJpeg(123, 45, payload)
    assert(ImageHeader.decode(jpg).contains((123, 45)))
    assert(jpg.length == 27 + payload.length)
    assert(ImageHeader.decode("not an image at all".getBytes).isEmpty)
    assert(ImageHeader.decode(Array.emptyByteArray).isEmpty)
    assert(ImageHeader.decode(png.take(20)).isEmpty) // truncated
  }

  test("PQ recall floors: pure ADC finds signal, +exact rerank recovers most of top-10") {
    import graft.functions.Similarity
    val e = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "qid", "qv", 10))
    def meanRecall(pq: Map[Long, Set[Long]]): Double = {
      val rs = exact.keys.toSeq.map(k =>
        pq.getOrElse(k, Set.empty).intersect(exact(k)).size / 10.0)
      rs.sum / rs.size
    }
    // measured 0.40 (sf0.001) / 0.42 (sf0.01): m=4×16-dim codebooks of 16
    // on near-uniform synthetic vectors — the hardest ANN regime; the
    // floor is a break-detector (a scrambled codebook or LUT indexing bug
    // lands near 10/N ≈ 0.01)
    val adc = topSets(Similarity.pqTopKDet(e, "vec_id", "embedding",
      q, "qid", "qv", topK = 10, m = 4, subDim = 16, k = 16,
      rounds = 2, blockSize = 16))
    assert(meanRecall(adc) >= 0.25, s"ADC recall ${meanRecall(adc)}")
    // measured 0.76 / 0.78 with the exact rerank over 50 ADC candidates —
    // the production two-stage shape must recover well over half
    val rr = topSets(Similarity.pqRerankTopK(e, "vec_id", "embedding",
      q, "qid", "qv", k = 10, candidates = 50, m = 4, subDim = 16,
      kCent = 16, rounds = 2, blockSize = 16))
    assert(meanRecall(rr) >= 0.6, s"rerank recall ${meanRecall(rr)}")
    // IVF-PQ: 4/16 cells probed caps attainable recall at the probe
    // stage, and residual codebooks recover signal inside the probed
    // cells. Measured 0.40 (sf0.001) / 0.36 (sf0.01) — matching or
    // beating flat PQ at equal code bits, the residual advantage. The
    // floor is a break-detector (a residual bug or a LUT/cell mixup
    // lands near 10/N ≈ 0.01).
    val ivfpq = topSets(Similarity.ivfPqTopKDet(e, "vec_id", "embedding",
      q, "qid", "qv", topK = 10, nCells = 16, coarseRounds = 2, nProbe = 4,
      m = 4, subDim = 16, kCent = 16, pqRounds = 2, blockSize = 16))
    assert(meanRecall(ivfpq) >= 0.2, s"IVF-PQ recall ${meanRecall(ivfpq)}")
    // exhaustive probing (nProbe = nCells) removes the probe constraint:
    // recall must then be at least pure-ADC-grade (residual codebooks
    // can't be WORSE than whole-vector codebooks at equal bits)
    val allCells = topSets(Similarity.ivfPqTopKDet(e, "vec_id", "embedding",
      q, "qid", "qv", topK = 10, nCells = 16, coarseRounds = 2, nProbe = 16,
      m = 4, subDim = 16, kCent = 16, pqRounds = 2, blockSize = 16))
    assert(meanRecall(allCells) >= meanRecall(adc),
      s"IVF-PQ exhaustive ${meanRecall(allCells)} < ADC ${meanRecall(adc)}")
  }

  test("z-order layout: every file bounded to a quarter-range in BOTH dimensions") {
    val rows = PipelineQueries.queries("p_zorder_layout")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { r =>
      val (fid, xMin, xMax, yMin, yMax) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // top-4 z bits = (x15, y15, x14, y14): both dims confined to one
      // 16384-wide cell — THE multi-dimensional pruning property (a
      // plain sort by x would leave y unbounded at 65535)
      assert(xMax - xMin <= 16383, s"file $fid x range ${xMax - xMin}")
      assert(yMax - yMin <= 16383, s"file $fid y range ${yMax - yMin}")
      // and the cell is the one the file id encodes
      assert(xMin >> 14 == ((fid >> 3) & 1) * 2 + ((fid >> 1) & 1))
      assert(yMin >> 14 == ((fid >> 2) & 1) * 2 + (fid & 1))
    }
  }

  test("z-order pruned scan: partition filter on the scan, strict file subset, no row loss") {
    val sfDir = "/root/testdata/sf0.001"
    val df = PipelineQueries.queries("p_zorder_prune")(spark, sfDir)
    // the candidate ids must reach the parquet scan as a PARTITION filter
    // (planning-time directory pruning, not a post-scan predicate)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*file_id[^\\]]*IN ".r.findFirstIn(plan).isDefined,
      "pruned scan must carry a file_id IN partition filter:\n" + plan)
    val rows = df.collect()
    // stats eliminated a strict majority of the 16 z-cell files
    assert(rows.nonEmpty && rows.length <= 4, s"expected <=4 candidate files, got ${rows.length}")
    // no row loss: the pruned per-file matches sum to the full-scan count
    val ev = Tables.read(spark, sfDir, "events")
    val x = (col("user_id") * org.apache.spark.sql.functions.lit(40503L))
      .bitwiseAND(org.apache.spark.sql.functions.lit(65535L))
    val y = (col("event_id") * org.apache.spark.sql.functions.lit(40503L))
      .bitwiseAND(org.apache.spark.sql.functions.lit(65535L))
    val full = ev.select(x.as("x"), y.as("y"))
      .where(col("x") >= 49152L && col("y") >= 32768L).count()
    assert(rows.map(_.getAs[Long]("n_match")).sum == full)
    assert(full > 0, "the predicate must select something for the test to mean anything")
  }

  test("classifier eval: held-out decorated split scores above the accuracy floor") {
    val row = PipelineQueries.queries("p_classifier_eval")(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val n = row.getAs[Long]("n_pos") + row.getAs[Long]("n_neg")
    assert(n > 0)
    assert(row.getAs[Long]("tp") + row.getAs[Long]("fp") +
      row.getAs[Long]("tn") + row.getAs[Long]("fn") == n)
    // measured 1.0 at sf0.001/sf0.01 (the 3× class tail dominates); the
    // floor leaves head-room for corpus drift while staying meaningful —
    // a broken scorer or a flipped sign lands near 0.5
    assert(row.getAs[Double]("accuracy") >= 0.9,
      s"accuracy=${row.getAs[Double]("accuracy")}")
  }

  test("PNG pixel codec: encode/decode roundtrip across all five scanline filters") {
    import Multimodal.ImagePixels
    val w = 27; val h = 16
    val pix = Array.tabulate(w * h)(i => (i * 37 + i * i % 11) % 256)
    for (filter <- 0 to 4; level <- Seq(1, 6, 9)) {
      val png = ImagePixels.encodePngGray(w, h, pix, level, filter)
      val dec = ImagePixels.decodePngLuma(png)
      assert(dec.isDefined, s"filter=$filter level=$level failed to decode")
      val (dw, dh, lum) = dec.get
      assert(dw == w && dh == h)
      assert(lum.toSeq == pix.toSeq, s"pixels diverged at filter=$filter level=$level")
    }
  }

  test("the different-encoder fixture: same pixels, different bytes, SAME dHash") {
    import Multimodal.ImagePixels
    import graft.functions.PayloadDHashExpr
    val pix = ImagePixels.pixelsFromText("the committee reviewed the evidence", 27, 16)
    val a = ImagePixels.encodePngGray(27, 16, pix, level = 1, filter = 0)
    val b = ImagePixels.encodePngGray(27, 16, pix, level = 9, filter = 4)
    // different encoder settings → different container bytes…
    assert(!java.util.Arrays.equals(a, b))
    // …but the pixel-path perceptual hash sees through the encoding,
    // which the round-8 payload-as-luma boundary provably did not
    assert(PayloadDHashExpr.hash(a) != null)
    assert(PayloadDHashExpr.hash(a) == PayloadDHashExpr.hash(b))
    // and it equals the direct pixel-grid hash (the decode is honest)
    assert(PayloadDHashExpr.hash(a).longValue() ==
      PayloadDHashExpr.hashPixels(27, 16, pix))
  }

  test("pixel-less synthesized PNGs keep the payload-path hash (no contract drift)") {
    import Multimodal.{ImageHeader, ImagePixels}
    import graft.functions.PayloadDHashExpr
    val payload = "some embedded buffer".getBytes("UTF-8")
    val png = ImageHeader.synthPng(64, 48, payload)
    // no IDAT → the pixel decoder declines, the tEXt walk still hashes
    assert(ImagePixels.decodePngLuma(png).isEmpty)
    assert(PayloadDHashExpr.hash(png) != null)
    // unsupported shapes decline rather than mis-decode
    assert(ImagePixels.decodePngLuma("not a png".getBytes).isEmpty)
    assert(ImagePixels.decodePngLuma(Array.emptyByteArray).isEmpty)
    val good = ImagePixels.encodePngGray(9, 8, Array.fill(72)(1), 6, 0)
    assert(ImagePixels.decodePngLuma(good.take(40)).isEmpty) // truncated
  }

  test("PNG pixel decoder handles RGB and RGBA color types via integer luma") {
    import Multimodal.ImagePixels
    // hand-build a 2×2 RGB PNG (filter 0) through the gray encoder's
    // machinery is not possible — construct the raw scanlines directly
    def pngOf(colorType: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
      val w = 2; val h = 2
      val stride = 1 + w * channels
      val raw = new Array[Byte](h * stride)
      for (y <- 0 until h) {
        raw(y * stride) = 0
        for (i <- 0 until w * channels)
          raw(y * stride + 1 + i) = (samples(y * w * channels + i) & 0xff).toByte
      }
      val deflater = new java.util.zip.Deflater(6)
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](256); val z = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(tpe: String, data: Array[Byte]): Unit = {
        def w32(v: Int): Unit = out.write(Array((v >>> 24).toByte,
          (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
        w32(data.length); val tb = tpe.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32; crc.update(tb); crc.update(data)
        w32(crc.getValue.toInt)
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
      chunk("IDAT", z.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    // RGB: luma = (299r + 587g + 114b) / 1000, floor
    val rgb = pngOf(2, 3, Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30))
    val Some((_, _, lum)) = ImagePixels.decodePngLuma(rgb)
    assert(lum.toSeq == Seq(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000,
      (299 * 10 + 587 * 20 + 114 * 30) / 1000))
    // RGBA: alpha ignored for luma
    val rgba = pngOf(6, 4, Array(255, 0, 0, 128, 0, 255, 0, 128, 0, 0, 255, 0, 9, 9, 9, 1))
    val Some((_, _, lum2)) = ImagePixels.decodePngLuma(rgba)
    assert(lum2.take(3).toSeq == lum.take(3).toSeq)
    assert(lum2(3) == 9) // (299+587+114)*9/1000 = 9
  }

  test("palette PNG: PLTE lookup recovers the luma field through a permuted palette") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.ImagePixels
    val (w, h) = (27, 16)
    val pix = ImagePixels.pixelsFromText(base, w, h)
    val gray = ImagePixels.encodePngGray(w, h, pix, level = 6, filter = 2)
    // palette entry j holds gray value v where j = (v*7+13) % 256 — a
    // bijection, so the decode only matches if it really reads PLTE
    def perm(v: Int) = (v * 7 + 13) % 256
    val palette = new Array[Int](256 * 3)
    (0 until 256).foreach { v =>
      val j = perm(v)
      palette(3 * j) = v; palette(3 * j + 1) = v; palette(3 * j + 2) = v
    }
    val pal = ImagePixels.encodePngPalette(w, h, palette, pix.map(perm),
      level = 9, filter = 4)
    assert(!gray.sameElements(pal))
    val Some((pw2, ph2, plum)) = ImagePixels.decodePngLuma(pal)
    assert((pw2, ph2) == (w, h) && plum.sameElements(pix))
    assert(PayloadDHashExpr.hash(gray) == PayloadDHashExpr.hash(pal))
    // color type 3 without a PLTE chunk must decline, not invent pixels:
    // corrupt the PLTE type tag (decoder skips unknown chunks, CRC unread)
    val noPlte = pal.clone()
    val plteAt = {
      var i = 8; var at = -1
      while (at < 0) {
        val len = ((noPlte(i) & 0xff) << 24) | ((noPlte(i + 1) & 0xff) << 16) |
          ((noPlte(i + 2) & 0xff) << 8) | (noPlte(i + 3) & 0xff)
        if (new String(noPlte, i + 4, 4, "US-ASCII") == "PLTE") at = i
        else i += 12 + len
      }
      at
    }
    noPlte(plteAt + 4) = 'x'.toByte
    assert(ImagePixels.decodePngLuma(noPlte).isEmpty)
  }

  test("Adam7 PNG: interlaced encode decodes to the sequential pixels, odd sizes included") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.ImagePixels
    for ((w, h) <- Seq((27, 16), (5, 3), (1, 1), (8, 8), (9, 1))) {
      val pix = ImagePixels.pixelsFromText(base + w + h, w, h)
      val seq0 = ImagePixels.encodePngGray(w, h, pix, level = 6, filter = 1)
      val adam = ImagePixels.encodePngGrayAdam7(w, h, pix, level = 1, filter = 3)
      assert(!seq0.sameElements(adam))
      val Some((dw, dh, lum)) = ImagePixels.decodePngLuma(adam)
      assert((dw, dh) == (w, h), s"dims for $w x $h")
      assert(lum.sameElements(pix), s"pixels for $w x $h")
      assert(PayloadDHashExpr.hash(seq0) == PayloadDHashExpr.hash(adam))
    }
  }

  test("audio header synth/decode roundtrip: WAV fmt/data chunks") {
    import Multimodal.AudioHeader
    val payload = "pcm sample bytes!".getBytes("UTF-8") // 17 bytes, odd
    val wav = AudioHeader.synthWav(16000, 2, payload)
    assert(wav.length == 44 + payload.length + 1) // word-align pad
    // duration = dataLen * 1000 / (rate * ch * 2)
    assert(AudioHeader.decode(wav).contains((16000, 2, 17L * 1000 / (16000 * 2 * 2))))
    val even = AudioHeader.synthWav(8000, 1, "even data!".getBytes)
    assert(even.length == 44 + 10)
    assert(AudioHeader.decode(even).contains((8000, 1, 10L * 1000 / 16000)))
    assert(AudioHeader.decode("RIFFnot really a wav".getBytes).isEmpty)
    assert(AudioHeader.decode(Array.emptyByteArray).isEmpty)
    assert(AudioHeader.decode(wav.take(30)).isEmpty) // truncated
  }

  test("AudioHeader.decode rejects malformed chunk lengths without hanging") {
    import Multimodal.AudioHeader
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    out.write("RIFF".getBytes); b(100, 0, 0, 0); out.write("WAVE".getBytes)
    out.write("JUNK".getBytes); b(0xf8, 0xff, 0xff, 0xff) // length -8: cursor would never advance
    out.write(new Array[Byte](32))
    assert(AudioHeader.decode(out.toByteArray).isEmpty) // must return, not loop
  }

  test("dot/normalize propagate null on malformed vectors (no garbage results)") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)), // well-formed
      (2L, Seq(1.0f, 2.0f), Seq(1.0f)))       // length mismatch
      .toDF("id", "a", "b")
    val dots = df.select($"id", Similarity.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(dots(1L).contains(5.0))
    assert(dots(2L).isEmpty) // mismatched dims -> null, like the zip_with form
    val withNullElem = spark.sql(
      "SELECT array(cast(1.0 as float), cast(null as float)) AS v")
      .select(Similarity.normalize($"v").as("n"), Similarity.dot($"v", $"v").as("d"))
      .collect()(0)
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("multimodal feature extraction is deterministic with real plumbing") {
    val docsDf = Seq((1L, "hello world content", "en", "src0", 19L),
      (2L, "another payload here", "en", "src1", 20L),
      (3L, "an image doc payload", "en", "src2", 20L),
      (6L, "png image doc bytes!", "en", "src3", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(docsDf)
    val feats = Multimodal.extractFeatures(media, batchSize = 1).collect().sortBy(_.media_id)
    assert(feats.length == 4)
    assert(feats(0).feature.length == Multimodal.Decoder.FeatureDim)
    // audio id 1 → real PCM16 WAV: one sample per character, stereo
    // (channels = 1 + id%2 = 2) → 19 frames × 2ch × 2B + 44B header
    assert(feats(0).modality == "audio" && feats(0).n_bytes == 19L * 2 * 2 + 44)
    // audio rate/channels/duration parsed from the WAV bytes
    assert(feats(0).sample_rate == 8000 + (1 % 4) * 4000)
    assert(feats(0).channels == (1 + 1 % 2).toInt)
    assert(feats(0).decoded_duration_ms == (19L * 2 * 2) * 1000 / (12000L * 2 * 2))
    // image dims parsed from the actual PNG/JPEG bytes, not metadata
    val jpegImg = feats.find(_.media_id == 3L).get // odd image id → JPEG
    assert(jpegImg.modality == "image" && jpegImg.n_bytes == 20L + 27)
    assert((jpegImg.decoded_width, jpegImg.decoded_height) == (3 % 640 + 1, 3 % 480 + 1))
    val pngImg = feats.find(_.media_id == 6L).get // even image id → PNG
    assert(pngImg.modality == "image" && pngImg.n_bytes == 20L + 57)
    assert((pngImg.decoded_width, pngImg.decoded_height) == (6 % 640 + 1, 6 % 480 + 1))
    // deterministic: same input → same hash/features
    val again = Multimodal.extractFeatures(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(feats(0).content_hash == again(0).content_hash)
    assert(feats(0).feature.toSeq == again(0).feature.toSeq)
    // video dims/frames/duration parsed from the AVI bytes, not metadata:
    // id 2 → 20 chars → max(1, 20/4) = 5 frames at 40 ms → 200 ms
    val vid = feats.find(_.media_id == 2L).get
    assert(vid.modality == "video" && vid.n_bytes == 20L + 108)
    assert((vid.decoded_width, vid.decoded_height) == (2 % 640 + 1, 2 % 480 + 1))
    assert(vid.decoded_duration_ms == 5L * 40)
    assert(vid.frames_sampled == 1) // 1-fps sample of a 200 ms clip
  }

  test("image dim rewrite: PNG IHDR re-CRC'd and JPEG SOF patched, decode roundtrips") {
    import graft.functions.Multimodal.ImageHeader
    val payload = "payload bytes".getBytes("UTF-8")
    val png = ImageHeader.synthPng(640, 480, payload)
    val png2 = ImageHeader.rewriteDims(png, 64, 48).get
    assert(ImageHeader.decode(png2).contains((64, 48)))
    // the rewritten IHDR CRC must be the one a strict PNG reader checks
    val crc = new java.util.zip.CRC32
    crc.update(png2, 12, 17)
    val stored = ((png2(29) & 0xffL) << 24) | ((png2(30) & 0xffL) << 16) |
      ((png2(31) & 0xffL) << 8) | (png2(32) & 0xffL)
    assert(crc.getValue == stored, "IHDR CRC not recomputed")
    val jpg = ImageHeader.synthJpeg(300, 200, payload)
    val jpg2 = ImageHeader.rewriteDims(jpg, 30, 20).get
    assert(ImageHeader.decode(jpg2).contains((30, 20)))
    // payloads ride through untouched on both formats
    assert(png2.length == png.length && jpg2.length == jpg.length)
    assert(ImageHeader.rewriteDims("not an image".getBytes("UTF-8"), 1, 1).isEmpty)
  }

  test("resizeImagesToFit: aspect-preserving, no upscale, non-images untouched") {
    import graft.functions.Multimodal
    import graft.functions.Multimodal.{ImageHeader, MediaRecord}
    val recs = Seq(
      MediaRecord(1L, "image", "mem://1", ImageHeader.synthPng(640, 480, Array[Byte](1)), 640, 480, 0L),
      MediaRecord(2L, "image", "mem://2", ImageHeader.synthJpeg(32, 16, Array[Byte](2)), 32, 16, 0L),
      MediaRecord(3L, "audio", "mem://3", Array[Byte](1, 2, 3), 0, 0, 10L))
    val out = Multimodal.resizeImagesToFit(recs.toDS(), 64, 64)
      .collect().map(r => r.media_id -> r).toMap
    assert(ImageHeader.decode(out(1L).content).contains((64, 48))) // 640x480 → fit 64 box
    assert(out(1L).width == 64 && out(1L).height == 48)
    assert(ImageHeader.decode(out(2L).content).contains((32, 16))) // already inside: no upscale
    assert(out(3L).content.toSeq == Seq[Byte](1, 2, 3)) // non-image passthrough
  }

  test("sampleFrames: every-kth indices, header-derived timestamps, non-video silent") {
    import graft.functions.Multimodal
    val avi = Multimodal.VideoHeader.synthAvi(64, 48, frames = 12,
      usPerFrame = 40000, payload = Array[Byte](1, 2, 3))
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", "mem://v/1", avi, 64, 48, 999L),
      Multimodal.MediaRecord(2L, "image", "mem://i/2", Array[Byte](1), 8, 8, 0L),
      Multimodal.MediaRecord(3L, "video", "mem://v/3", Array[Byte](9, 9), 1, 1, 0L) // unparseable
    ).toDS()
    val out = Multimodal.sampleFrames(media, everyK = 5).collect().sortBy(_.frame_index)
    assert(out.map(_.media_id).toSeq == Seq(1L, 1L, 1L))
    assert(out.map(_.frame_index).toSeq == Seq(0, 5, 10))
    // 12 frames x 40ms = 480ms total; ts = i * 480 / 12 = i * 40
    assert(out.map(_.timestamp_ms).toSeq == Seq(0L, 200L, 400L))
    assert(out.forall(_.n_frames_total == 12))
    assert(out.head.frame_ref == "mem://v/1#frame=0")
  }

  test("video header synth/decode roundtrip: AVI avih chunk") {
    import Multimodal.VideoHeader
    val payload = "frame data bytes!".getBytes("UTF-8") // 17 bytes, odd
    val avi = VideoHeader.synthAvi(320, 240, 250, 40000, payload)
    assert(avi.length == 108 + payload.length + 1) // word-align pad
    assert(VideoHeader.decode(avi).contains((320, 240, 250, 10000L))) // 250 × 40 ms
    assert(VideoHeader.decode("not a video".getBytes).isEmpty)
    assert(VideoHeader.decode(Array.emptyByteArray).isEmpty)
    assert(VideoHeader.decode(avi.take(30)).isEmpty) // truncated hdrl
    // malformed negative chunk length must return, not loop
    val bad = avi.clone()
    bad(16) = 0xf8.toByte; bad(17) = 0xff.toByte; bad(18) = 0xff.toByte; bad(19) = 0xff.toByte
    assert(VideoHeader.decode(bad).isEmpty)
  }

  test("line stats: split/ltrim/rtrim parity incl. unicode bullet and trailing newline") {
    import graft.functions.LineStatsExpr._
    def s(t: String, w: Int) = stat(t.getBytes("UTF-8"), w)
    val t1 = "intro\n- one\n  * two\n• three\nplain"
    assert(s(t1, NLines) == 5)
    assert(s(t1, BulletLines) == 3) // '-', '*' after spaces, '•'
    assert(s(t1, EllipsisLines) == 0)
    assert(s(t1, DistinctLines) == 5)
    val t2 = "wait...\nmore...   \ndots....\nno dots\nwait..."
    assert(s(t2, EllipsisLines) == 4) // rtrim'd "...", "....", and the repeat
    assert(s(t2, DistinctLines) == 4) // "wait..." repeats; trailing spaces keep line 2 unique
    // trailing '\n' opens an empty final line (split limit −1 parity);
    // empty lines dedup to one
    val t3 = "a\n\na\n"
    assert(s(t3, NLines) == 4)
    assert(s(t3, DistinctLines) == 2) // "a" and ""
    assert(s("", NLines) == 1 && s("", DistinctLines) == 1)
    assert(s("   - x", BulletLines) == 1) // ltrim spaces only
    assert(s("\t- x", BulletLines) == 0) // tab is NOT ltrim'd (DuckDB parity)
  }

  test("distinct stopword hits: repeats once, case-insensitive, tokenizer parity") {
    import graft.functions.DistinctStopwordHitsExpr
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    Seq("the", "and", "of").foreach(w =>
      set.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    def h(t: String) = DistinctStopwordHitsExpr.distinctHits(t.getBytes("UTF-8"), set)
    assert(h("the THE The cat") == 1)
    assert(h("the and of the and") == 3)
    assert(h("theory android office") == 0) // whole tokens only
    assert(h("") == 0)
  }

  test("quality gate: each rule drops its pathology; filter keeps exactly the pass set") {
    val rules = TextAnalysis.QualityRules(
      minTokens = 5, maxTokens = 100, minMeanTokenLen = 2.0, maxMeanTokenLen = 8.0,
      maxSymbolRatio = 0.1, maxBulletLineRatio = 0.5, maxEllipsisLineRatio = 0.3,
      minDistinctStopwords = 2, maxDupLineRatio = 0.3, maxDupNgramRatio = 0.3,
      ngramSize = 2, stopwords = Seq("the", "and", "of", "a", "is"))
    val good = "the cat and the dog walked over a sunny hill is nice"
    val cases = Seq(
      (1L, good), // passes all
      (2L, "the and"), // too short
      (3L, good + "\n- b1\n- b2\n- b3\n- b4\n- b5"), // bullet ratio 5/6
      (4L, good + " ###### ###### ######"), // symbol load
      (5L, good + "\nx\nx\nx\nx"), // dup lines 1−2/5
      (6L, "the and of " + Seq.fill(20)("go go").mkString(" ")), // 2-gram repetition
      (7L, "zq wx yv uk tj sr qp on ml kj")) // no stopwords
      .toDF("doc_id", "text")
    val gate = TextAnalysis.qualityGate(cases, "text", rules)
    val verdicts = gate.select("doc_id", "pass").as[(Long, Boolean)].collect().toMap
    assert(verdicts(1L) && !verdicts(2L) && !verdicts(3L) && !verdicts(4L) &&
      !verdicts(5L) && !verdicts(6L) && !verdicts(7L))
    val kept = TextAnalysis.qualityFilter(cases, "text", rules)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
    // the filter preserves the original schema untouched
    assert(TextAnalysis.qualityFilter(cases, "text", rules).columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("keepBestComponent: argmax score per cluster, ties to lowest id, singletons kept") {
    val d = Seq(
      (1L, "a", 5), (2L, "b", 9), (3L, "c", 9), // component {1,2,3}: 2 wins (9, tie → min id)
      (4L, "d", 1), // singleton
      (5L, "e", 2), (6L, "f", 7)) // component {5,6}: 6 wins
      .toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestComponent(d, "doc_id", pairs, col("q"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L, 6L))
    // schema passes through untouched
    assert(Dedup.keepBestComponent(d, "doc_id", pairs, col("q")).columns.toSeq ==
      Seq("doc_id", "text", "q"))
  }

  test("quantizedRerankTopK: exhaustive candidates ≡ brute force; coarse stage holds recall") {
    val e = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count().toInt
    val queries = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val exact = ranks(Similarity.bruteForceTopK(e, "vec_id", "embedding",
      queries, "qid", "qv", k = 5))
    // candidates = corpus size → the coarse stage keeps everything and the
    // exact rerank IS brute force, rank for rank
    val exhaustive = ranks(Similarity.quantizedRerankTopK(e, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, candidates = n))
    assert(exhaustive == exact)
    // a thin candidate slice still recalls most of the exact top-k
    val thin = Similarity.quantizedRerankTopK(e, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, candidates = 15)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val exactIds = exact.map { case (q, v, _) => (q, v) }
    assert((exactIds intersect thin).size >= (exactIds.size * 0.8).toInt)
  }

  test("NfcNormalizeExpr: composes combining marks, ASCII fast path is identity") {
    import graft.functions.NfcNormalizeExpr.nfc
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("café") // e + combining acute
    assert(nfc(decomposed).toString == "café")
    assert(nfc(decomposed).numChars() == 4 && decomposed.numChars() == 5)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(nfc(ascii) eq ascii) // fast path returns the same instance
    assert(nfc(UTF8String.fromString("")).toString == "")
    // idempotent: already-composed input is unchanged
    assert(nfc(nfc(decomposed)).toString == "café")
  }

  test("incrementalExactDedup: persisted fingerprint state dedups across batches") {
    val state = java.nio.file.Files.createTempDirectory("inc-dedup").toString + "/state"
    val b1 = Seq((2L, "alpha beta"), (4L, "gamma delta"), (6L, "alpha beta"))
      .toDF("doc_id", "text")
    val k1 = Dedup.incrementalExactDedup(b1, Seq("text"), "doc_id", state)
    assert(k1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    // recomputation AFTER the state append must not self-anti-join away
    // (the checkpoint breaks the lazy re-read of the state store)
    assert(k1.count() == 2)
    val b2 = Seq((1L, "alpha beta"), (3L, "epsilon zeta")).toDF("doc_id", "text")
    val k2 = Dedup.incrementalExactDedup(b2, Seq("text"), "doc_id", state)
    assert(k2.select("doc_id").as[Long].collect().toSeq == Seq(3L)) // 1L seen in batch 1
    val b3 = Seq((9L, "epsilon zeta")).toDF("doc_id", "text")
    assert(Dedup.incrementalExactDedup(b3, Seq("text"), "doc_id", state).isEmpty)
  }

  test("incrementalExactDedup: a legacy plain-parquet store migrates to bucketed") {
    val root = java.nio.file.Files.createTempDirectory("inc-migrate").toString
    val bucketed = root + "/bucketed"
    val b1 = Seq((2L, "alpha beta"), (4L, "gamma delta")).toDF("doc_id", "text")
    Dedup.incrementalExactDedup(b1, Seq("text"), "doc_id", bucketed)
    // simulate a store written by the pre-bucketed version: same
    // (fp, fp2) rows, plain write → part files without the bucket-id
    // suffix the CLUSTERED BY registration requires
    val legacy = root + "/legacy"
    spark.read.parquet(bucketed).write.parquet(legacy)
    assert(new java.io.File(legacy).listFiles().map(_.getName)
      .filter(_.startsWith("part-")).forall(!_.matches(".*_\\d{5}\\.c\\d{3}.*")))
    // first touch of the legacy dir migrates it in place, then the
    // anti-join behaves exactly like the bucketed store's
    val b2 = Seq((1L, "alpha beta"), (3L, "epsilon zeta")).toDF("doc_id", "text")
    val k = Dedup.incrementalExactDedupDry(b2, Seq("text"), "doc_id", legacy)
    assert(k.select("doc_id").as[Long].collect().toSeq == Seq(3L))
    assert(new java.io.File(legacy).listFiles().map(_.getName)
      .filter(_.startsWith("part-")).forall(_.matches(".*_\\d{5}\\.c\\d{3}.*")))
  }

  test("dedupIncremental: staged batch-0 equals the fresh two-batch run") {
    val sfDir = "/root/testdata/sf0.001"
    val s1 = PipelineQueries.queries("p_dedup_incremental")(spark, sfDir)
      .as[Long].collect().toSeq
    // second invocation serves batch 0 from the staged artifacts —
    // identical result, no double-append self-anti-join
    val s2 = PipelineQueries.queries("p_dedup_incremental")(spark, sfDir)
      .as[Long].collect().toSeq
    assert(s1 == s2)
    val fresh = PipelineQueries.benchOnlyQueries("p_dedup_incremental_fresh")(
      spark, sfDir).as[Long].collect().toSeq
    assert(s1 == fresh)
  }

  test("dupSpanFraction: cross-doc coverage only, self-repeats don't count") {
    val d = Seq(
      (1L, "p q r s t"), // shares the gram "p q r" with doc 2 → 1/3 positions
      (2L, "p q r x y"),
      (3L, "a b c a b c a b c"), // self-repeating only → 0.0
      (4L, "u v")) // short doc: whole text is one gram, unique → 0.0
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanFraction(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3)))
    assert(out(3L) == ((7L, 0L, 0.0))) // in-doc repetition is NOT duplication
    assert(out(4L) == ((1L, 0L, 0.0)))
    // an exact copy drives coverage to 1.0 on both sides
    val copied = d.unionByName(Seq((5L, "p q r s t")).toDF("doc_id", "text"))
    val out2 = TextAnalysis.dupSpanFraction(copied, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out2(1L) == 1.0 && out2(5L) == 1.0)
  }

  test("sourceOverlapMatrix: shared shingles and jaccard; silent pairs absent") {
    val d = Seq(
      (1L, "a b c d", "s1"), // shingles: "a b c", "b c d"
      (2L, "b c d e", "s2"), // shingles: "b c d", "c d e" — shares 1 with s1
      (3L, "x y z w", "s3")) // disjoint from both
      .toDF("doc_id", "text", "source")
    val m = TextAnalysis.sourceOverlapMatrix(d, "text", "source", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m.keySet == Set(("s1", "s2"))) // zero-overlap pairs are absent
    assert(m(("s1", "s2")) == ((1L, 1.0 / 3))) // |∩|=1, |∪|=2+2−1=3
    // short docs fall back to the whole-text shingle
    val short = Seq((1L, "a b", "p"), (2L, "a b", "q")).toDF("doc_id", "text", "source")
    val ms = TextAnalysis.sourceOverlapMatrix(short, "text", "source", k = 3).collect()
    assert(ms.length == 1 && ms(0).getLong(2) == 1L && ms(0).getDouble(3) == 1.0)
  }

  test("dedupLinesInDoc keeps first occurrences in order, empties dedup too") {
    val out = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "x\n\ny\n\nx"), // repeated empty line dedups
      (3L, "only"),
      (4L, "")).toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.dedupLinesInDoc($"text").as("d"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a\nb\nc")
    assert(out(2L) == "x\n\ny")
    assert(out(3L) == "only")
    assert(out(4L) == "")
  }

  test("perceptual dHash: container-invariant, edit-local, dedup keeps originals") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    val text = ("the quick brown fox jumps over the lazy dog " * 12).trim
    val bytes = text.getBytes("UTF-8")
    val png = Multimodal.ImageHeader.synthPng(64, 48, bytes)
    val jpg = Multimodal.ImageHeader.synthJpeg(64, 48, bytes)
    // payload walks recover the exact embedded bytes from both containers
    assert(Multimodal.ImageHeader.extractPayload(png).get.toSeq == bytes.toSeq)
    assert(Multimodal.ImageHeader.extractPayload(jpg).get.toSeq == bytes.toSeq)
    // same decoded buffer → same perceptual hash across container formats
    val hPng = PayloadDHashExpr.hash(png)
    val hJpg = PayloadDHashExpr.hash(jpg)
    assert(hPng != null && hPng == hJpg)
    // a leading 3-char edit lands in one cell → hamming ≤ 1
    val mut = Multimodal.ImageHeader.synthPng(64, 48,
      ("zzz" + text.substring(3)).getBytes("UTF-8"))
    val hMut = PayloadDHashExpr.hash(mut)
    assert(java.lang.Long.bitCount(hPng ^ hMut) <= 1,
      s"hamming=${java.lang.Long.bitCount(hPng ^ hMut)}")
    // unparseable content → null, filtered out of the dedup
    assert(PayloadDHashExpr.hash(Array[Byte](1, 2, 3)) == null)
    // keep-set: copies (higher ids, either container) drop, originals stay
    val media = Seq(
      (1L, png), (2L, jpg), (3L, mut),
      (4L, Multimodal.ImageHeader.synthJpeg(8, 8, "completely different words all over this buffer here".getBytes("UTF-8"))))
      .toDF("media_id", "content")
    val kept = Multimodal.imageNearDupKeep(media, "media_id", "content")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L), kept)
  }

  test("perceptual dHash covers WAV: data-chunk walk, pad byte excluded, container-invariant") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    val text = "an odd-length audio payload body!" // odd byte count → pad byte
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length % 2 == 1)
    val wav = Multimodal.AudioHeader.synthWav(16000, 2, bytes)
    assert(Multimodal.AudioHeader.extractData(wav).get.toSeq == bytes.toSeq)
    // same payload through image and audio containers → identical hash
    val png = Multimodal.ImageHeader.synthPng(8, 8, bytes)
    assert(PayloadDHashExpr.hash(wav) == PayloadDHashExpr.hash(png))
    // a different declared sample rate re-encode still hashes identically
    assert(PayloadDHashExpr.hash(Multimodal.AudioHeader.synthWav(8000, 1, bytes)) ==
      PayloadDHashExpr.hash(wav))
  }

  test("PCM sample path: byte-different encodes of the same samples hash identically") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    val samples = Array.tabulate(300)(i => ((i * 37) % 65536) - 32768) // full signed range
    val mono = Multimodal.AudioSamples.synthPcmWav(16000, 1, samples)
    val stereoJunk = Multimodal.AudioSamples.synthPcmWav(8000, 2, samples, junk = true)
    assert(!mono.sameElements(stereoJunk)) // different bytes...
    assert(Multimodal.AudioSamples.decodePcm16(mono).get.sameElements(samples))
    assert(Multimodal.AudioSamples.decodePcm16(stereoJunk).get.sameElements(samples))
    // ...same samples → identical perceptual hash; and it is the SAMPLE
    // hash, not any byte/payload walk
    assert(PayloadDHashExpr.hash(mono) == PayloadDHashExpr.hash(stereoJunk))
    assert(PayloadDHashExpr.hash(mono) == PayloadDHashExpr.hashSeq(samples))
    // a byte-identical payload understood as codepoints (the legacy walk)
    // would differ: pin that the sample path actually ran by checking a
    // negative sample sequence hashes by VALUE (sign-extension matters)
    val neg = Array.fill(144)(-1000)
    val pos = Array.fill(144)(1000)
    assert(PayloadDHashExpr.hash(Multimodal.AudioSamples.synthPcmWav(8000, 1, neg)) ==
      PayloadDHashExpr.hashSeq(neg))
    assert(PayloadDHashExpr.hashSeq(neg) == PayloadDHashExpr.hashSeq(pos)) // flat is flat
    // unequal channels: mixdown is the exact floor mean
    val l = Array(100, -100); val r = Array(101, -101)
    val bytesLR = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      tag("RIFF"); w32(36 + 8); tag("WAVE")
      tag("fmt "); w32(16); w16(1); w16(2); w32(8000); w32(32000); w16(4); w16(16)
      tag("data"); w32(8)
      w16(l(0) & 0xffff); w16(r(0) & 0xffff); w16(l(1) & 0xffff); w16(r(1) & 0xffff)
      out.toByteArray
    }
    // floor mean: (100+101)/2 = 100, (-100 + -101)/2 = floor(-100.5) = -101
    assert(Multimodal.AudioSamples.decodePcm16(bytesLR).get.toSeq == Seq(100, -101))
  }

  test("PCM matrix: 8-bit and IEEE-float WAVs decode to the same signal as PCM16") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.AudioSamples
    // a PCM16-storable signal derived from byte values, as the fixtures use
    val bytes = Array.tabulate(300)(i => (i * 31 + 7) % 256)
    val s16 = bytes.map(_ * 257 - 32768)
    val wav16 = AudioSamples.synthPcmWav(16000, 1, s16)
    // float32 round-trips the EXACT samples (s/32768f is lossless ≤ 2^15)
    val wavF = AudioSamples.synthFloatWav(12000, 2, s16)
    assert(AudioSamples.decodePcm(wavF).get.sameElements(s16))
    assert(PayloadDHashExpr.hash(wavF) == PayloadDHashExpr.hash(wav16))
    // 8-bit decodes through (u-128)·257 — a positive affine map of the
    // same signal, different offset: samples differ by the constant 128,
    // the dHash bits do not (offset-invariant cross-multiplied means)
    val wav8 = AudioSamples.synthPcm8Wav(16000, 1, bytes, junk = true)
    val d8 = AudioSamples.decodePcm(wav8).get
    assert(d8.sameElements(bytes.map(u => (u - 128) * 257)))
    assert(d8.zip(s16).forall { case (a, b) => a - b == -128 })
    assert(PayloadDHashExpr.hash(wav8) == PayloadDHashExpr.hash(wav16))
    // 24-bit (s·256) recovers the exact 16-bit samples, negatives included
    val wav24 = AudioSamples.synthPcm24Wav(20000, 2, s16, junk = true)
    assert(AudioSamples.decodePcm(wav24).get.sameElements(s16))
    assert(PayloadDHashExpr.hash(wav24) == PayloadDHashExpr.hash(wav16))
    // a 24-bit value that is NOT a multiple of 256 floors toward -inf
    val odd24 = {
      val out = new java.io.ByteArrayOutputStream()
      def w16o(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32o(v: Int): Unit = { w16o(v & 0xffff); w16o((v >>> 16) & 0xffff) }
      def tago(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      tago("RIFF"); w32o(36 + 6); tago("WAVE")
      tago("fmt "); w32o(16); w16o(1); w16o(1); w32o(8000); w32o(24000); w16o(3); w16o(24)
      tago("data"); w32o(6)
      Seq(-257, 513).foreach { v =>
        out.write(v & 0xff); out.write((v >>> 8) & 0xff); out.write((v >>> 16) & 0xff)
      }
      out.toByteArray
    }
    assert(AudioSamples.decodePcm(odd24).get.toSeq == Seq(-2, 2)) // floor(-257/256), floor(513/256)
    // float specials stay total: NaN rounds to 0, infinities clamp
    val weird = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      tag("RIFF"); w32(36 + 12); tag("WAVE")
      tag("fmt "); w32(16); w16(3); w16(1); w32(8000); w32(32000); w16(4); w16(32)
      tag("data"); w32(12)
      w32(java.lang.Float.floatToIntBits(Float.NaN))
      w32(java.lang.Float.floatToIntBits(Float.PositiveInfinity))
      w32(java.lang.Float.floatToIntBits(Float.NegativeInfinity))
      out.toByteArray
    }
    assert(AudioSamples.decodePcm(weird).get.toSeq == Seq(0, 32767, -32768))
    // 12-bit stays out of scope — declines, never guesses
    val w12 = wav16.clone()
    // bits-per-sample field of fmt: RIFF(12) + 'fmt '(8) + 14 = offset 34
    w12(34) = 12
    assert(AudioSamples.decodePcm(w12).isEmpty)
  }

  test("DIB frame path: byte-different encodes of the same frames hash identically") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    val w = 27; val h = 16
    val frames = (0 until 3).map(f => Array.tabulate(w * h)(p => (p * 7 + f * 31) % 256))
    val base = Multimodal.VideoFrames.synthDibAvi(w, h, frames, 40000)
    val relaid = Multimodal.VideoFrames.synthDibAvi(w, h, frames, 40000, junk = true)
    assert(!base.sameElements(relaid)) // different bytes...
    val (dw, dh, sums, n) = Multimodal.VideoFrames.decodeDibLumaSums(base).get
    assert((dw, dh, n) == (w, h, 3))
    // gray pixels: luma is the identity, so sums are the plain per-pixel
    // frame sums — decode inverts encode exactly (incl. bottom-up unflip)
    val expectSums = Array.tabulate(w * h)(p => frames.map(_(p)).sum)
    assert(sums.sameElements(expectSums))
    assert(Multimodal.VideoFrames.decodeDibLumaSums(relaid).get._3.sameElements(expectSums))
    // ...same frames → identical perceptual hash, and it is the FRAME
    // hash (2D over temporal sums), not any container/payload walk
    assert(PayloadDHashExpr.hash(base) == PayloadDHashExpr.hash(relaid))
    assert(PayloadDHashExpr.hash(base) == PayloadDHashExpr.hashPixels(w, h, expectSums))
    // the legacy header-only AVI (no strl/strf) keeps the payload walk
    val legacy = Multimodal.VideoHeader.synthAvi(4, 4, 2, 40000, "abcdef".getBytes("UTF-8"))
    assert(Multimodal.VideoFrames.decodeDibLumaSums(legacy).isEmpty)
    // a non-4-aligned width exercises DIB row padding: w=5 → rowBytes 16
    val odd = (0 until 2).map(f => Array.tabulate(5 * 3)(p => (p * 11 + f) % 256))
    val oddAvi = Multimodal.VideoFrames.synthDibAvi(5, 3, odd, 40000, junk = true)
    val (_, _, oddSums, oddN) = Multimodal.VideoFrames.decodeDibLumaSums(oddAvi).get
    assert(oddN == 2 && oddSums.sameElements(Array.tabulate(5 * 3)(p => odd.map(_(p)).sum)))
  }

  test("JPEG entropy path: different Huffman codings of the same blocks hash identically") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.JpegGray
    val q8 = Array.fill(64)(8)
    // 27×16 → 4×2 blocks with real edge cropping (32→27, no vertical crop)
    val vals = Array(0, 255, 37, 128, 200, 9, 77, 130)
    val blocks = vals.map { v => val zz = new Array[Int](64); zz(0) = v - 128; zz }.toSeq
    val a = JpegGray.synthBaselineJpeg(27, 16, blocks, q8,
      JpegGray.DcAnnexK, JpegGray.AcSmallA, 0, "layoutA".getBytes("US-ASCII"))
    val bJ = JpegGray.synthBaselineJpeg(27, 16, blocks, q8,
      JpegGray.DcFlat, JpegGray.AcSmallB, 2, "layout-BB".getBytes("US-ASCII"))
    assert(!a.sameElements(bJ)) // different Huffman CODES for the same values
    val (w, h, lum) = JpegGray.decodeJpegLuma(a).get
    assert((w, h) == (27, 16))
    // DC-only + q=8: every pixel of block b is exactly vals(b)
    val expected = Array.tabulate(27 * 16)(p => vals(((p / 27) / 8) * 4 + (p % 27) / 8))
    assert(lum.sameElements(expected))
    assert(JpegGray.decodeJpegLuma(bJ).get._3.sameElements(expected)) // restart path too
    assert(PayloadDHashExpr.hash(a) == PayloadDHashExpr.hash(bJ))
    assert(PayloadDHashExpr.hash(a) == PayloadDHashExpr.hashPixels(27, 16, expected))
    // the legacy header-only JPEG (no SOS) keeps the COM-payload walk
    val legacy = Multimodal.ImageHeader.synthJpeg(4, 4, "abcdef".getBytes("UTF-8"))
    assert(JpegGray.decodeJpegLuma(legacy).isEmpty)
    assert(PayloadDHashExpr.hash(legacy) ==
      PayloadDHashExpr.hashSeq("abcdef".codePoints().toArray))
  }

  test("JPEG marker hygiene: TEM/fill bytes skipped; non-baseline SOS progression rejected") {
    import graft.functions.Multimodal.JpegGray
    import JpegGray._
    val q8 = Array.fill(64)(8)
    val vals = Array(10, 250, 60, 140, 33, 99, 180, 5)
    val blocks = vals.map { v => val zz = new Array[Int](64); zz(0) = v - 128; zz }.toSeq
    val base = synthBaselineJpeg(27, 16, blocks, q8,
      DcAnnexK, AcSmallA, 0, "p".getBytes("US-ASCII"))
    val expected = decodeJpegLuma(base).get._3
    // TEM (FF 01) and a bare 0xFF fill byte after SOI are legal standalone
    // noise — a correct segment walk skips them instead of misparsing the
    // following bytes as a segment length (which rejected valid files)
    val withTem = base.take(2) ++ Array[Byte](0xff.toByte, 0x01) ++ base.drop(2)
    val withFill = base.take(2) ++ Array[Byte](0xff.toByte) ++ base.drop(2)
    assert(decodeJpegLuma(withTem).get._3.sameElements(expected))
    assert(decodeJpegLuma(withFill).get._3.sameElements(expected))
    // locate SOS: a baseline scan must carry Ss=0, Se=63, Ah=Al=0 — a
    // spec-invalid progression byte must decode to None, never wrong luma
    val sosAt = {
      var i = 2; var at = -1
      while (at < 0) {
        val m = base(i + 1) & 0xff
        val len = ((base(i + 2) & 0xff) << 8) | (base(i + 3) & 0xff)
        if (m == 0xda) at = i else i += 2 + len
      }
      at
    }
    val ns = base(sosAt + 4) & 0xff
    def patchSos(off: Int, v: Int): Array[Byte] = {
      val b = base.clone(); b(sosAt + 4 + off) = v.toByte; b
    }
    assert(decodeJpegLuma(patchSos(1 + 2 * ns, 1)).isEmpty)  // Ss = 1
    assert(decodeJpegLuma(patchSos(2 + 2 * ns, 62)).isEmpty) // Se = 62
    assert(decodeJpegLuma(patchSos(3 + 2 * ns, 0x01)).isEmpty) // Al = 1
    assert(decodeJpegLuma(patchSos(3 + 2 * ns, 0x10)).isEmpty) // Ah = 1
  }

  test("PCM synth fails fast on samples outside int16 instead of wrapping") {
    import graft.functions.Multimodal.AudioSamples
    // the -32896 floor of decodePcm's 8-bit map is one 257-step below
    // int16 — re-encoding it must throw, not wrap to +32640
    val out = AudioSamples.decodePcm(
      AudioSamples.synthPcm8Wav(8000, 1, Array(0, 128, 255))).get
    assert(out.min == -32896)
    intercept[IllegalArgumentException] {
      AudioSamples.synthPcmWav(8000, 1, out)
    }
    intercept[IllegalArgumentException] {
      AudioSamples.synthPcm24Wav(8000, 1, Array(32768))
    }
  }

  test("color JPEG: MCU interleave, 4:2:0/4:2:2/4:4:4 subsampling, exact color luma") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.JpegGray
    import JpegGray._
    val q8 = Array.fill(64)(8)
    def dc(v: Int) = { val zz = new Array[Int](64); zz(0) = v - 128; zz }
    // 54×32 luma field (7×4 visible blocks) + per-16×16-region chroma
    val yVals = Array.tabulate(28)(b => (b * 37 + 11) % 256)
    val cbVals = Array.tabulate(8)(r => (r * 53 + 7) % 256)
    val crVals = Array.tabulate(8)(r => (r * 71 + 190) % 256)
    def reg(b: Int) = (b / 7 / 2) * 4 + (b % 7) / 2
    val lumVals = Array.tabulate(28)(b => ycbcrLuma(yVals(b), cbVals(reg(b)), crVals(reg(b))))
    val expected = Array.tabulate(54 * 32)(p => lumVals(((p / 54) / 8) * 7 + (p % 54) / 8))
    val gray = synthBaselineJpeg(54, 32, lumVals.map(dc).toSeq, q8,
      DcAnnexK, AcSmallA, 0, "g".getBytes("US-ASCII"))
    // padded 8-wide luma plane shared by 4:2:0 and 4:2:2
    val yB = for (by <- 0 until 4; bx <- 0 until 8) yield dc(yVals(by * 7 + math.min(bx, 6)))
    val cb420 = for (ry <- 0 until 2; rx <- 0 until 4) yield dc(cbVals(ry * 4 + rx))
    val cr420 = for (ry <- 0 until 2; rx <- 0 until 4) yield dc(crVals(ry * 4 + rx))
    val c420 = synthBaselineJpegColor(54, 32, 2, 2, yB, cb420, cr420, q8, q8,
      DcAnnexK, AcSmallA, DcFlat, AcSmallB, 0, "c420".getBytes("US-ASCII"))
    val cb422 = for (by <- 0 until 4; rx <- 0 until 4) yield dc(cbVals((by / 2) * 4 + rx))
    val cr422 = for (by <- 0 until 4; rx <- 0 until 4) yield dc(crVals((by / 2) * 4 + rx))
    val c422 = synthBaselineJpegColor(54, 32, 2, 1, yB, cb422, cr422, q8, q8,
      DcFlat, AcSmallB, DcAnnexK, AcSmallA, 3, "c422".getBytes("US-ASCII"))
    // 4:4:4: one block per MCU per component, 7×4 MCUs, no padding
    val y444 = (0 until 28).map(b => dc(yVals(b)))
    val cb444 = for (by <- 0 until 4; bx <- 0 until 7) yield dc(cbVals((by / 2) * 4 + bx / 2))
    val cr444 = for (by <- 0 until 4; bx <- 0 until 7) yield dc(crVals((by / 2) * 4 + bx / 2))
    val c444 = synthBaselineJpegColor(54, 32, 1, 1, y444, cb444, cr444, q8, q8,
      DcAnnexK, AcSmallB, DcFlat, AcSmallA, 0, "c444".getBytes("US-ASCII"))
    // four byte-different encodings, one pixel field
    val all = Seq(gray, c420, c422, c444)
    for (Seq(x, yb) <- all.combinations(2)) assert(!x.sameElements(yb))
    for (bytes <- all) {
      val (w, h, lum) = decodeJpegLuma(bytes).get
      assert((w, h) == (54, 32))
      assert(lum.sameElements(expected))
    }
    assert(all.map(PayloadDHashExpr.hash).distinct.size == 1)
    // neutral chroma is the exact identity: color of (Y, 128, 128)
    // decodes to the Y plane itself
    val neutral = synthBaselineJpegColor(54, 32, 2, 2, yB,
      Seq.fill(8)(dc(128)), Seq.fill(8)(dc(128)), q8, q8,
      DcAnnexK, AcSmallA, DcFlat, AcSmallB, 0, "n".getBytes("US-ASCII"))
    val expY = Array.tabulate(54 * 32)(p => yVals(((p / 54) / 8) * 7 + (p % 54) / 8))
    assert(decodeJpegLuma(neutral).get._3.sameElements(expY))
    // a color frame missing its chroma Huffman tables declines cleanly
    // (DHT id 1 never arrives when we corrupt the class nibble): covered
    // by the generic fuzz harness; here pin the scope gate directly —
    // 4-component frames are out of scope
    val sof4 = c420.clone()
    val sofIdx = {
      var i = 2; var at = -1
      while (at < 0) {
        val m = sof4(i + 1) & 0xff
        val len = ((sof4(i + 2) & 0xff) << 8) | (sof4(i + 3) & 0xff)
        if (m == 0xc0) at = i else i += 2 + len
      }
      at
    }
    sof4(sofIdx + 9) = 4 // ncomp byte of SOF0
    assert(decodeJpegLuma(sof4).isEmpty)
  }

  test("progressive JPEG: successive approximation + spectral selection == baseline pixels") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.JpegGray
    import JpegGray._
    val q = Array.tabulate(64)(i => 1 + (i * 7) % 31)
    // 27×16 → 4×2 blocks; DC everywhere, AC runs/sizes the small tables
    // can code (runs accumulate from the allowed (run,size) pairs)
    val rng = new scala.util.Random(20260815)
    val allowed = Seq((0, 1), (1, 1), (2, 1), (3, 1), (0, 2), (1, 2), (2, 2), (0, 3))
    val blocks = (0 until 8).map { i =>
      val zz = new Array[Int](64)
      zz(0) = rng.nextInt(256) - 128
      var k = 1
      while (k < 60) {
        val (run, s) = allowed(rng.nextInt(allowed.size))
        k += run
        if (k < 60) {
          val mag = (1 << (s - 1)) + rng.nextInt(1 << (s - 1))
          zz(k) = if (rng.nextBoolean()) mag else -mag
          k += 1
        }
        k += rng.nextInt(3) * 16 // occasional ZRL-sized gaps
      }
      zz
    }
    val base = synthBaselineJpeg(27, 16, blocks, q, DcAnnexK, AcSmallA, 0,
      "base".getBytes("US-ASCII"))
    val expected = decodeJpegLuma(base).get._3
    // the libjpeg-shaped script: DC first at Al=1, AC bands at Al=1,
    // then DC and AC refinement passes restoring full precision
    val script = Seq(
      (Seq(0), 0, 0, 0, 1), (Seq(0), 1, 5, 0, 1), (Seq(0), 6, 63, 0, 1),
      (Seq(0), 0, 0, 1, 0), (Seq(0), 1, 5, 1, 0), (Seq(0), 6, 63, 1, 0))
    val prog = synthProgressiveJpeg(27, 16, 1, 1, blocks, Nil, Nil, q, q,
      DcAnnexK, AcProgA, DcFlat, AcProgB, script, "prog".getBytes("US-ASCII"))
    assert(!prog.sameElements(base))
    val (pw, ph, plum) = decodeJpegLuma(prog).get
    assert((pw, ph) == (27, 16))
    assert(plum.sameElements(expected),
      plum.zip(expected).zipWithIndex.filter(t => t._1._1 != t._1._2).take(8).mkString(","))
    assert(PayloadDHashExpr.hash(prog) == PayloadDHashExpr.hash(base))
    // two-level successive approximation (Al=2 → 1 → 0) on the same blocks
    val script2 = Seq(
      (Seq(0), 0, 0, 0, 2), (Seq(0), 1, 63, 0, 2),
      (Seq(0), 0, 0, 2, 1), (Seq(0), 1, 63, 2, 1),
      (Seq(0), 0, 0, 1, 0), (Seq(0), 1, 63, 1, 0))
    val prog2 = synthProgressiveJpeg(27, 16, 1, 1, blocks, Nil, Nil, q, q,
      DcFlat, AcProgB, DcAnnexK, AcProgA, script2, "p2".getBytes("US-ASCII"))
    assert(decodeJpegLuma(prog2).get._3.sameElements(expected))
  }

  test("progressive COLOR JPEG: interleaved DC scans + per-component AC bands == color pixels") {
    import graft.functions.{Multimodal, PayloadDHashExpr}
    import Multimodal.JpegGray
    import JpegGray._
    val q8 = Array.fill(64)(8)
    def dc(v: Int) = { val zz = new Array[Int](64); zz(0) = v - 128; zz }
    val yVals = Array.tabulate(28)(b => (b * 37 + 11) % 256)
    val cbVals = Array.tabulate(8)(r => (r * 53 + 7) % 256)
    val crVals = Array.tabulate(8)(r => (r * 71 + 190) % 256)
    def reg(b: Int) = (b / 7 / 2) * 4 + (b % 7) / 2
    val lumVals = Array.tabulate(28)(b => ycbcrLuma(yVals(b), cbVals(reg(b)), crVals(reg(b))))
    val expected = Array.tabulate(54 * 32)(p => lumVals(((p / 54) / 8) * 7 + (p % 54) / 8))
    val yB = for (by <- 0 until 4; bx <- 0 until 8) yield dc(yVals(by * 7 + math.min(bx, 6)))
    val cbB = for (ry <- 0 until 2; rx <- 0 until 4) yield dc(cbVals(ry * 4 + rx))
    val crB = for (ry <- 0 until 2; rx <- 0 until 4) yield dc(crVals(ry * 4 + rx))
    val script = Seq(
      (Seq(0, 1, 2), 0, 0, 0, 1),                                  // interleaved DC
      (Seq(0), 1, 5, 0, 0), (Seq(2), 1, 63, 0, 0), (Seq(1), 1, 63, 0, 0),
      (Seq(0), 6, 63, 0, 0),
      (Seq(0, 1, 2), 0, 0, 1, 0))                                  // DC refine
    val prog = synthProgressiveJpeg(54, 32, 2, 2, yB, cbB, crB, q8, q8,
      DcAnnexK, AcProgA, DcFlat, AcProgB, script, "pc".getBytes("US-ASCII"))
    val (w, h, lum) = decodeJpegLuma(prog).get
    assert((w, h) == (54, 32))
    assert(lum.sameElements(expected))
    // byte-different from the BASELINE color encoding, hash-identical
    val c420 = synthBaselineJpegColor(54, 32, 2, 2, yB, cbB, crB, q8, q8,
      DcAnnexK, AcSmallA, DcFlat, AcSmallB, 0, "c420".getBytes("US-ASCII"))
    assert(!prog.sameElements(c420))
    assert(PayloadDHashExpr.hash(prog) == PayloadDHashExpr.hash(c420))
  }

  test("boxDownsample/resizePngToFit: exact floor means, partial edge boxes, no upscale") {
    import graft.functions.Multimodal.ImagePixels
    // 5×3 fit 2×2 → k = 3, out 2×1: boxes 3×3 and 2×3 (partial width)
    val lum = Array(
      1, 2, 3, 10, 20,
      4, 5, 6, 30, 40,
      7, 8, 9, 50, 60)
    val (ow, oh, out) = ImagePixels.boxDownsample(5, 3, lum, 2, 2)
    assert((ow, oh) == (2, 1))
    assert(out(0) == (1 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9) / 9)
    assert(out(1) == (10 + 20 + 30 + 40 + 50 + 60) / 6)
    // already fits → k = 1, identity
    val (w1, h1, same) = ImagePixels.boxDownsample(5, 3, lum, 8, 8)
    assert((w1, h1) == (5, 3) && same.sameElements(lum))
    // full chain through real bytes: any (level, filter) encode resizes
    // to the same pixels, and the re-encode decodes back exactly
    val pix = ImagePixels.pixelsFromText("resize me through real zlib", 27, 16)
    val expected = ImagePixels.boxDownsample(27, 16, pix, 10, 6)
    for (level <- Seq(1, 9); filter <- 0 to 4) {
      val png = ImagePixels.encodePngGray(27, 16, pix, level, filter)
      val (ow2, oh2, bytes) = ImagePixels.resizePngToFit(png, 10, 6).get
      val (dw, dh, lum2) = ImagePixels.decodePngLuma(bytes).get
      assert((ow2, oh2) == (9, 6) && (dw, dh) == (9, 6))
      assert(lum2.sameElements(expected._3))
    }
    // header-only PNG (tEXt payload, no IDAT): pixel path declines
    val headerOnly = graft.functions.Multimodal.ImageHeader.synthPng(4, 4, "xy".getBytes("UTF-8"))
    assert(ImagePixels.resizePngToFit(headerOnly, 2, 2).isEmpty)
    // audio decimate: floor means on NEGATIVE sums (floorDiv, not trunc)
    // and a partial tail window
    import graft.functions.Multimodal.AudioSamples
    assert(AudioSamples.decimate(Array(-7, 0, 0, 0, 5), 4).toSeq == Seq(-2, 5))
    assert(AudioSamples.decimate(Array(1, 2, 3), 1).toSeq == Seq(1, 2, 3))
  }

  test("JPEG AC decode: runs, signs, ZRL, and dequant invert the encoder exactly") {
    import graft.functions.Multimodal.JpegGray
    // quant table varies per coefficient so dequant is actually exercised
    val q = Array.tabulate(64)(i => 1 + (i * 7) % 31)
    // one 8×8 image, one block: DC plus AC at assorted zigzag positions —
    // runs 0-3 directly, a 19-gap via ZRL + run 3, sizes 1-3 both signs
    val zz = new Array[Int](64)
    zz(0) = -60
    zz(1) = 1; zz(2) = -2; zz(5) = 3; zz(7) = -1; zz(11) = -1
    zz(31) = -1 // gap of 19 zeros from 11: ZRL (16) + run 3
    zz(33) = 2; zz(63) = 0
    val bytes = JpegGray.synthBaselineJpeg(8, 8, Seq(zz), q,
      JpegGray.DcAnnexK, JpegGray.AcSmallA, 0, "ac".getBytes("US-ASCII"))
    val (_, _, lum) = JpegGray.decodeJpegLuma(bytes).get
    // reference: dequant + dezigzag by hand, then the same textbook IDCT —
    // this pins the ENTROPY layer (Huffman, run/size, ZRL, sign extension,
    // DC prediction, dequant, zigzag) as an exact round-trip
    val zig = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    val f = new Array[Int](64)
    for (i <- 0 until 64) f(zig(i)) = zz(i) * q(i)
    assert(lum.sameElements(JpegGray.idct8x8(f)))
    // multi-block DC prediction across a 16×8 image (diff coding, both signs)
    val b2 = Seq({ val z = new Array[Int](64); z(0) = 100; z },
                 { val z = new Array[Int](64); z(0) = -100; z(1) = 5; z })
    val two = JpegGray.synthBaselineJpeg(16, 8, b2, q,
      JpegGray.DcFlat, JpegGray.AcSmallB, 0, "two".getBytes("US-ASCII"))
    val (_, _, lum2) = JpegGray.decodeJpegLuma(two).get
    val fA = new Array[Int](64); fA(0) = 100 * q(0)
    val fB = new Array[Int](64)
    for (i <- 0 until 64) fB(zig(i)) = b2(1)(i) * q(i)
    val eA = JpegGray.idct8x8(fA); val eB = JpegGray.idct8x8(fB)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert(lum2(y * 16 + x) == eA(y * 8 + x))
      assert(lum2(y * 16 + 8 + x) == eB(y * 8 + x))
    }
  }

  test("searchTopDocs: BM25-rational retrieval ranks the term-dense doc first") {
    val df = Seq(
      (1L, "alpha alpha alpha beta"),
      (2L, "alpha gamma gamma gamma"),
      (3L, "delta delta delta delta")).toDF("doc_id", "text")
    val terms = Seq("alpha").map(Tuple1(_)).toDF("token")
    val out = TextAnalysis.searchTopDocs(df, "doc_id", "text", terms, k = 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    // doc 3 has no query term → absent; doc 1 (tf=3) beats doc 2 (tf=1)
    assert(out.sortBy(_._2) == Seq((1L, 1), (2L, 2)), out)
  }

  test("sampleToTokenBudgetSqrt: temperature flattening boosts small strata") {
    import graft.functions.Sampling
    // big stratum 'a' (1600 tokens), small 'b' (100): plain proportional
    // budgeting gives b ~6% of the pie; sqrt gives 10/(40+10) = 20%
    val df = (1 to 16).map(i => (i.toLong, "a", 100L)) ++
      Seq((100L, "b", 50L), (101L, "b", 50L))
    val out = Sampling.sampleToTokenBudgetSqrt(df.toDF("id", "s", "ntok"),
      "s", "ntok", totalBudget = 500L, orderBy = Seq($"id"))
      .groupBy("s").agg(sum("ntok").as("got"))
      .as[(String, Long)].collect().toMap
    // budgets: z = 40+10 = 50 → a: floor(500·0.8)=400, b: floor(500·0.2)=100
    assert(out("a") == 400L && out("b") == 100L, out)
  }

  test("dsirImportance: target-like docs outscore off-target docs") {
    val raw = Seq(
      (1L, "the cat sat on the mat"),   // English-ish — matches target grams
      (2L, "le chat est sur le tapis"), // off-target
      (3L, "the cat sat here now")).toDF("doc_id", "text")
    val target = Seq((10L, "the cat sat on the mat again")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirImportance(raw, "doc_id", "text", target)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // mean-ratio normalization: doc 1 shares 5/5 grams with the target,
    // doc 3 shares 2/4, doc 2 none — ordering follows affinity, not length
    assert(out(1L) > out(3L) && out(3L) > out(2L), out)
  }

  test("exactIntQuantiles matches the sorted definition on random data") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(997)(rnd.nextInt(40).toLong)
    val df = vals.map(Tuple1(_)).toDF("v").repartition(13)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = TextAnalysis.exactIntQuantiles(df, $"v", qs)
      .as[(Double, Long)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val expected = sorted(math.max(1, math.ceil(q * vals.size.toDouble).toLong).toInt - 1)
      assert(got(q) == expected, s"q=$q got=${got(q)} want=$expected")
    }
  }

  test("canonicalizeUrl: fragment, default ports, tracking params, case, bare slash") {
    val out = Seq(
      1L -> "https://Example.COM:443/a/b?utm_source=x&id=7&gclid=g#frag",
      2L -> "http://host.org:80/p?fbclid=f",
      3L -> "http://host.org:8080/p?id=1", // non-default port survives
      4L -> "HTTPS://HOST.org/",
      5L -> "https://host.org/a?utm_a=1&utm_b=2", // all params stripped
      6L -> "https://host.org/a?id=1&id=2") // duplicate keys survive in order
      .toDF("id", "u")
      .select($"id", TextAnalysis.canonicalizeUrl($"u").as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "https://example.com/a/b?id=7")
    assert(out(2L) == "http://host.org/p")
    assert(out(3L) == "http://host.org:8080/p?id=1")
    assert(out(4L) == "https://host.org")
    assert(out(5L) == "https://host.org/a")
    assert(out(6L) == "https://host.org/a?id=1&id=2")
  }

  test("salientTerms: BM25-rational ranking on a hand example") {
    // 3 docs; 'rare' appears twice in doc 1 and nowhere else → top term;
    // 'common' is in every doc → idf (3-3+0.5)/(3+0.5)=1/7, never top
    val df = Seq(
      (1L, "common rare rare alpha"),
      (2L, "common beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.salientTerms(df, "doc_id", "text", k = 1)
      .select("doc_id", "token", "tf", "df")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "rare", 2L, 1L), (2L, "beta", 2L, 1L), (3L, "gamma", 1L, 1L)))
  }

  test("kmeansAssign: separates obvious clusters, deterministic across partitionings") {
    import graft.functions.Similarity
    // two tight groups on orthogonal axes; seeds (ids 0,1) land one per group
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f), 2L -> Array(0.9f, 0.1f, 0.0f),
      4L -> Array(0.95f, 0.05f, 0.0f),
      1L -> Array(0.0f, 1.0f, 0.0f), 3L -> Array(0.1f, 0.9f, 0.0f),
      5L -> Array(0.0f, 0.95f, 0.05f))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, rounds = 3)
      .as[(Long, Int)].collect().toMap
    assert(Set(0L, 2L, 4L).map(out) == Set(0) && Set(1L, 3L, 5L).map(out) == Set(1), out)
    // identical assignment regardless of input partitioning
    val out7 = Similarity.kmeansAssign(df.repartition(7), "vec_id", "embedding",
      k = 2, rounds = 3).as[(Long, Int)].collect().toMap
    assert(out7 == out)
  }

  test("scrubPii: typed redaction with per-category counts, near-misses survive") {
    val out = TextAnalysis.scrubPii(Seq(
      (1L, "mail alice@foo.org or bob.smith+x@bar.co now"),
      (2L, "host 10.0.0.1 called (555) 123-4567 then 555-987-6543 x9"),
      (3L, "dial +44 123-456-7890 about build 1.2.3.4"),
      (4L, "ping admin@localhost at 12-34 5678 done"), // no TLD, short runs
      (5L, "plain words only")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == (("mail <EMAIL> or <EMAIL> now", 2L, 0L, 0L)))
    assert(out(2L) == (("host <IP> called <PHONE> then <PHONE> x9", 0L, 1L, 2L)))
    // version string trips the conservative IPv4 shape — the documented
    // false positive, identical in the DuckDB oracle
    assert(out(3L) == (("dial <PHONE> about build <IP>", 0L, 1L, 1L)))
    assert(out(4L) == (("ping admin@localhost at 12-34 5678 done", 0L, 0L, 0L)))
    assert(out(5L) == (("plain words only", 0L, 0L, 0L)))
  }

  test("bigram LM: counts, signals, and add-k perplexity match the hand formula") {
    import graft.functions.LanguageModel
    val corpus = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "dog barks")).toDF("doc_id", "text")
    val lm = LanguageModel.buildBigramLm(corpus, "text", vocabSize = 10, maxBigrams = 100)
    assert(lm.totalTokens == 8L)
    assert(lm.vocab == Map("the" -> 2L, "cat" -> 2L, "sat" -> 1L, "ran" -> 1L,
      "dog" -> 1L, "barks" -> 1L))
    assert(lm.bigrams == Map(("the", "cat") -> 2L, ("cat", "sat") -> 1L,
      ("cat", "ran") -> 1L, ("dog", "barks") -> 1L))

    // signals on a doc with one OOV token and one unseen in-vocab pair
    val scored = LanguageModel.scoreDocs(
      Seq((9L, "the cat UNSEEN sat the")).toDF("doc_id", "text"),
      "doc_id", "text", lm, addK = 0.5)
    val row = scored.collect()(0)
    assert(row.getAs[Long]("oov_tokens") == 1L) // "unseen" (lowercased probe)
    // pairs: (the,cat)✓ (cat,unseen)✗ (unseen,sat)✗ (sat,the)✓in-vocab
    assert(row.getAs[Long]("invocab_bigrams") == 2L)
    assert(row.getAs[Long]("hit_bigrams") == 1L) // only (the,cat) is in the table
    assert(row.getAs[Long]("n_bigrams") == 4L)
    // hand formula, k=0.5, V=6 (vocab smaller than the cap), N=8:
    val k = 0.5; val V = lm.vocab.size; val N = lm.totalTokens.toDouble
    def biP(c12: Double, c1: Double) = (c12 + k) / (c1 + k * V)
    def uniP(c2: Double) = (c2 + k) / (N + k * V)
    val expected = -(math.log(biP(2, 2)) // the→cat
      + math.log(uniP(0)) // cat→unseen: backoff, OOV unigram
      + math.log(uniP(1)) // unseen→sat: backoff (prev OOV)
      + math.log(biP(0, 1))) / 4 // sat→the: in-vocab pair, count 0
    assert(math.abs(row.getAs[Double]("lm_ppl") - math.exp(expected)) < 1e-12)
    // single-token doc: no bigrams → null perplexity, zero signals
    val tiny = LanguageModel.scoreDocs(
      Seq((10L, "solo")).toDF("doc_id", "text"), "doc_id", "text", lm).collect()(0)
    assert(tiny.isNullAt(tiny.fieldIndex("lm_ppl")) && tiny.getAs[Long]("n_bigrams") == 0L)

    // maxBigrams cap keeps the most frequent pair only (ties lexicographic)
    val capped = LanguageModel.buildBigramLm(corpus, "text", vocabSize = 10, maxBigrams = 1)
    assert(capped.bigrams == Map(("the", "cat") -> 2L))
    // vocab cap: V=2 keeps {cat, the} (count desc, token asc)
    val vcapped = LanguageModel.buildBigramLm(corpus, "text", vocabSize = 2, maxBigrams = 10)
    assert(vcapped.vocab.keySet == Set("cat", "the"))
    // reference-like text scores lower perplexity than gibberish
    val cmp = LanguageModel.scoreDocs(Seq(
      (1L, "the cat sat"), (2L, "zz qq ww rr")).toDF("doc_id", "text"),
      "doc_id", "text", lm).select($"doc_id", $"lm_ppl").as[(Long, Double)].collect().toMap
    assert(cmp(1L) < cmp(2L))
  }

  test("int8 quantization: round-trip error bound, constant vectors, quantized recall") {
    val vecs = Seq(
      (0L, Array(0.1f, -0.5f, 0.9f, 0.3f)),
      (1L, Array(2.0f, 2.0f, 2.0f, 2.0f)), // constant → all-zero codes
      (2L, Array(-1.0f, 0.0f, 1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id"),
      Similarity.quantizeInt8(col("embedding")).as("q"),
      col("embedding"))
    val rows = q.select(col("vec_id"), col("q.mn"), col("q.mx"), col("q.codes"),
        Similarity.dequantizeInt8(col("q")).as("deq"), col("embedding"))
      .collect()
    rows.foreach { r =>
      val mn = r.getDouble(1); val mx = r.getDouble(2)
      val codes = r.getSeq[Int](3)
      val deq = r.getSeq[Double](4)
      val orig = r.getSeq[Float](5)
      assert(codes.forall(c => c >= 0 && c <= 255))
      if (r.getLong(0) == 1L) {
        assert(codes.forall(_ == 0) && deq.forall(_ == 2.0))
      } else {
        // affine round-trip error ≤ half a quantization step
        val step = (mx - mn) / 255.0
        orig.zip(deq).foreach { case (o, d) =>
          assert(math.abs(o.toDouble - d) <= step / 2 + 1e-12,
            s"vec ${r.getLong(0)}: |$o − $d| > step/2 ($step)")
        }
      }
    }
    // quantized top-k recalls the exact float scan on separated data: the
    // sf0.001 embeddings (64-dim random) quantize with recall@5 ≥ 0.8
    val e = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def topset(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val exact = topset(Similarity.bruteForceTopK(e, "vec_id", "embedding",
      queries, "qid", "qv", k = 5))
    val quant = topset(Similarity.quantizedTopK(e, "vec_id", "embedding",
      queries, "qid", "qv", k = 5))
    val recalls = exact.map { case (qid, ex) =>
      (ex intersect quant(qid)).size.toDouble / ex.size }
    assert(recalls.forall(_ >= 0.8), s"quantized recall@5 too low: $recalls")
  }

  test("c4KeepLine: each rule fires independently") {
    val lines = Seq(
      (1L, "this line has enough words and ends properly."), // pass
      (2L, "short line."), // < 5 words
      (3L, "this line has plenty of words but no terminal punctuation"),
      (4L, "please enable JavaScript to use this website properly."), // blocklist (case-insens)
      (5L, "we use cookie banners on every single page here."), // blocklist
      (6L, "  padded line with exactly five words!  "), // trims, '!' terminal
      (7L, "does a question mark count as terminal punctuation?"), // pass
      (8L, "")) // empty
      .toDF("id", "l")
      .select($"id", TextAnalysis.c4KeepLine($"l", 5, TextAnalysis.C4Blocklist).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(lines(1L) && lines(6L) && lines(7L))
    assert(!lines(2L) && !lines(3L) && !lines(4L) && !lines(5L) && !lines(8L))
  }

  test("scrubDupSpans: first owner keeps the span, later docs lose it, short docs untouched") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique-one tail-a"),
      (2L, "alpha beta gamma delta epsilon zeta unique-two tail-b"), // shares 5-gram prefix with 1
      (3L, "totally different words here nothing shared at all today"),
      (4L, "tiny doc")) // < 5 tokens: no grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.scrubDupSpans(d, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 owns the shared grams (min id) → untouched
    assert(out(1L) == ((8L, 0L, "alpha beta gamma delta epsilon zeta unique-one tail-a")))
    // doc 2: shared grams start at 0 and 1 → positions 0..5 scrubbed, 6,7 kept
    assert(out(2L) == ((8L, 6L, "unique-two tail-b")))
    assert(out(3L)._2 == 0L) // nothing shared
    assert(out(4L) == ((2L, 0L, "tiny doc"))) // short doc passes through
  }

  test("scrubDupSpans keepFirst=false scrubs every occurrence") {
    val d = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scrubDupSpans(d, "doc_id", "text", k = 5, keepFirst = false)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    // the shared gram "one two three four five" dies in BOTH docs
    assert(out(1L) == "six")
    assert(out(2L) == "seven")
  }

  test("ngramOverlapContaminated flags a leaked eval sentence inside a longer page") {
    val evalDocs = Seq((100L, "what is the capital of france paris is the answer"))
      .toDF("eid", "etext") // 10 tokens
    val train = Seq(
      (1L, "some crawl page mentions that what is the capital of france paris is the answer among other things entirely"),
      (2L, "a completely unrelated page about cooking pasta with plenty of words to spare here"),
      (3L, "capital of france")) // 3 tokens — whole-text gram, not a 10-gram match
      .toDF("doc_id", "text")
    val out = graft.functions.Dedup
      .ngramOverlapContaminated(train, "doc_id", "text", evalDocs, "etext", n = 10)
      .as[(Long, Long)].collect().toMap
    assert(out.contains(1L) && out(1L) >= 1L) // the leaked 10-gram fires
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("domainStats counts distinct docs and total mentions per host") {
    val d = Seq(
      (1L, "see https://a.example.com/x and https://a.example.com/y twice"),
      (2L, "also https://A.EXAMPLE.com/z case-folds plus http://other.org/1"),
      (3L, "no urls at all here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.domainStats(d, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a.example.com") == ((2L, 3L)))
    assert(out("other.org") == ((1L, 1L)))
    assert(out.size == 2)
  }

  test("meanPoolExact: bit-identical across partitionings; matches the plain mean") {
    val rows = (0L until 40L).map(i =>
      (i % 3, i, Array.tabulate(4)(d => (math.sin(i * 7.0 + d) * 0.1).toFloat)))
    val d = rows.toDF("label", "vec_id", "embedding")
    def run(parts: Int): Map[Long, (Long, Seq[Double])] =
      Similarity.meanPoolExact(d.repartition(parts), "label", "vec_id", "embedding",
          blockSize = 4)
        .as[(Long, Long, Seq[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val a = run(1)
    val b = run(7)
    // the fold order is a pure function of the data — identical BITS
    assert(a.forall { case (l, (n, c)) =>
      b(l)._1 == n && b(l)._2.zip(c).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y) } })
    // and within float tolerance of the naive mean
    rows.groupBy(_._1).foreach { case (l, rs) =>
      val naive = (0 until 4).map(dm => rs.map(_._3(dm).toDouble).sum / rs.size)
      naive.zip(a(l)._2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
  }

  test("learnBpe reproduces the textbook merge sequence with deterministic ties") {
    // Sennrich et al. example: {low:5, lower:2, newest:6, widest:3}
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = Seq((1L, text)).toDF("id", "text")
    val merges = graft.functions.Bpe.learnBpe(d, "text", numMerges = 4)
    // round 1: (e,s)=9 ties (s,t)=9 → lexicographic left wins; round 2:
    // (es,t)=9; round 3: (l,o)=7 ties (o,w)=7 → (l,o); round 4: (lo,w)=7
    assert(merges.map(m => (m._2, m._3, m._4)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("bpeTokenCount: canonical leftmost-simultaneous merge semantics") {
    val merges = Seq(("e", "s"), ("es", "t"))
    val out = Seq((1L, "lowest"), (2L, "aaaaa"), (3L, "a b"), (4L, "test"))
      .toDF("id", "text")
      .select($"id", graft.functions.Bpe.bpeTokenCount($"text", merges).as("n"),
        graft.functions.Bpe.bpeTokenCount($"text", Seq(("a", "a"))).as("na"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == 4) // l o w est
    assert(out(2L)._2 == 3) // aa aa a — odd run folds leftmost-first
    assert(out(3L)._1 == 2) // two 1-char words
    assert(out(4L)._1 == 2) // t es t, then (es,t) fires again: t est
  }

  test("editDistanceNearDupPairs: LSH candidates verified by exact Levenshtein") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank at dawn every single morning"
    val d = Seq(
      (1L, base),
      (2L, base + " xx"), // near-dup, edit 3
      (3L, base.replace("quick", "rapid")), // 5 substitutions-ish, still similar
      (4L, "completely different content about cooking pasta with tomatoes and basil leaves for dinner tonight again"))
      .toDF("doc_id", "text")
    val out = Dedup.editDistanceNearDupPairs(d, "doc_id", "text",
        ngramSize = 8, threshold = 0.4, maxDist = 10)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 3)
    assert(out.contains((1L, 3L)) && out((1L, 3L)) <= 10)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("invertedIndex: per-doc-distinct tokens, sorted postings, df floor") {
    val d = Seq(
      (3L, "alpha beta alpha"), // alpha counted once for doc 3
      (1L, "alpha gamma"),
      (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(d, "doc_id", "text", minDf = 2L)
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("alpha") == ((2L, Seq(1L, 3L))))
    assert(out("beta") == ((2L, Seq(2L, 3L))))
    assert(out("gamma") == ((2L, Seq(1L, 2L))))
  }

  test("pageRankExact: hand-computed integer ranks; invariant across partitionings") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c")).toDF("src", "dst")
    def run(parts: Int) = graft.functions.Graph
      .pageRankExact(edges.repartition(parts), "src", "dst", iterations = 2)
      .as[(String, Long)].collect().toMap
    val r = run(1)
    // iter1: a=150000+floor(1000000*85/100)=1000000; b=c=150000+floor(1000000*85/200)=575000
    // iter2: a=150000+floor(575000*85/100)=638750;  b=c=150000+floor(1000000*85/200)=575000
    assert(r == Map("a" -> 638750L, "b" -> 575000L, "c" -> 575000L), r.toString)
    assert(run(5) == r) // integer arithmetic → partitioning-invariant
  }

  test("embeddingProfile: exact per-dimension stats") {
    val d = Seq(
      (1L, Array(1.0f, -2.0f)),
      (2L, Array(0.5f, 0.0f)),
      (3L, Array(-1.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingProfile(d, "embedding")
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0) == ((3L, 2L, -1.0, 1.0)))
    assert(out(1) == ((3L, 1L, -2.0, 3.0)))
  }

  test("fixMojibake: repairs Latin-1 misdecodes, leaves ASCII and invalid bytes alone") {
    val d = Seq(
      (1L, "plain ascii stays put"),
      (2L, "caf\u00C3\u00A9 cr\u00C3\u00A8me"), // cafÃ© crÃ¨me → café crème
      (3L, "stray \u00C3 alone is not valid utf-8"), // malformed → untouched
      (4L, "real caf\u00E9 is already fine")) // é alone: 1 char, no shrink
      .toDF("doc_id", "text")
    val out = d.select($"doc_id", TextAnalysis.fixMojibake($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "plain ascii stays put")
    assert(out(2L) == "caf\u00E9 cr\u00E8me")
    assert(out(3L) == "stray \u00C3 alone is not valid utf-8")
    assert(out(4L) == "real caf\u00E9 is already fine")
  }

  test("ccnetBuckets: per-language terciles are balanced and rate-ordered") {
    val out = PipelineQueries.ccnetBucketsQ(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Double, String)].collect()
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
      // ntile(3): bucket sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
      // every head-rate >= every tail-rate within the language
      val head = rows.filter(_._4 == "head").map(_._3)
      val tail = rows.filter(_._4 == "tail").map(_._3)
      if (head.nonEmpty && tail.nonEmpty) assert(head.min >= tail.max)
    }
  }

  test("ccCorpusAndPairs: staged artifact serves repeated calls identically") {
    val sfDir = "/root/testdata/sf0.001"
    val (c1, p1) = PipelineQueries.ccCorpusAndPairs(spark, sfDir)
    val (c2, p2) = PipelineQueries.ccCorpusAndPairs(spark, sfDir)
    assert(c1.count() == c2.count())
    assert(p1.count() == p2.count())
    // the staged pairs equal a fresh mine (order-free compare on id pairs)
    val (_, fresh, sets) = PipelineQueries.mineCcCorpusAndPairs(spark, sfDir)
    val staged = p1.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mined = fresh.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    sets.unpersist()
    assert(staged == mined)
  }

  test("dedupMinHashIncremental: staged batch-0 store equals the fresh two-batch run") {
    val sfDir = "/root/testdata/sf0.001"
    // staged path (first call builds kept0/store artifacts, second reuses)
    val s1 = PipelineQueries.dedupMinHashIncremental(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val s2 = PipelineQueries.dedupMinHashIncremental(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(s1 == s2)
    // fresh unstaged witness over the same portable-md5 buckets
    val fresh = PipelineQueries.incrementalKeepFromBuckets(spark,
      PipelineQueries.portableBandBuckets(
        PipelineQueries.docsWithNearDups(spark, sfDir)).cache())
      .as[(Long, Long)].collect().toSet
    assert(s1 == fresh)
  }

  test("dedupEdit: staged signature relations equal the fresh unstaged pipeline") {
    val sfDir = "/root/testdata/sf0.001"
    // staged contract path (first call materializes sets/sigs/banded,
    // second serves from the artifacts)
    val s1 = PipelineQueries.queries("p_dedup_edit")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val s2 = PipelineQueries.queries("p_dedup_edit")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(s1 == s2)
    // fresh witness: identical arguments, no staging hook
    val fresh = graft.functions.Dedup.editDistanceNearDupPairs(
        PipelineQueries.docsWithNearDups(spark, sfDir, sliceMod = 2),
        "doc_id", "text", ngramSize = 12, threshold = 0.55, maxDist = 30,
        maxBucketSize = 1000)
      .selectExpr("id_a", "id_b", "cast(edit_dist as bigint)")
      .as[(Long, Long, Long)].collect().toSet
    assert(s1 == fresh)
  }

  /** The exact on-disk path [[PipelineQueries.stagedParquet]] writes for
    * (this app, `sfDir`, `name`) — mirrors its key construction. */
  private def stagedDir(sfDir: String, name: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-media-$name-" + spark.sparkContext.applicationId + "-" +
        sfDir.replaceAll("[^A-Za-z0-9.-]", "_")).toString

  test("stagedMedia: the staged media artifact is byte-identical to a fresh synthesis") {
    val sfDir = "/root/testdata/sf0.001"
    // dedupJpegProgressive is the round-12 flag row — its staged query
    // must equal the keep-set over freshly synthesized containers
    val staged = PipelineQueries.dedupJpegProgressive(spark, sfDir)
      .as[Long].collect().toSeq
    val fresh = graft.functions.Multimodal.imageNearDupKeep(
        PipelineQueries.jpegProgressiveMedia(spark, sfDir),
        "media_id", "content", maxHamming = 3)
      .orderBy("media_id").select("media_id").as[Long].collect().toSeq
    assert(staged == fresh)
    // and the artifact bytes themselves match the fresh encode, row for
    // row (md5 over content — the strongest staged ≡ fresh witness)
    val freshHash = PipelineQueries.imagePxMedia(spark, sfDir)
      .select(col("media_id"), md5(col("content")).as("h"))
      .as[(Long, String)].collect().toMap
    PipelineQueries.dedupImagePx(spark, sfDir).count() // forces staging
    val stagedHash = spark.read.parquet(stagedDir(sfDir, "imagepx"))
      .select(col("media_id"), md5(col("content")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(stagedHash == freshHash)
  }

  test("dedupMinHashPortable: staged md5 relations equal the fresh derivation") {
    val sfDir = "/root/testdata/sf0.001"
    val s1 = PipelineQueries.dedupMinHashPortable(spark, sfDir)
      .as[Long].collect().toSeq
    // second call reads the staged artifacts — identical result
    val s2 = PipelineQueries.dedupMinHashPortable(spark, sfDir)
      .as[Long].collect().toSeq
    assert(s1 == s2)
    // fresh witness: the unstaged band relation drives the same
    // bucket-min + keep rule through the incremental helper's math
    val corpus = PipelineQueries.docsWithNearDups(spark, sfDir)
    val freshBuckets = PipelineQueries.portableBandBuckets(corpus).cache()
    val stagedBuckets = spark.read.parquet(stagedDir(sfDir, "mhport-banded"))
      .as[(Long, String)].collect().toSet
    assert(stagedBuckets == freshBuckets.as[(Long, String)].collect().toSet)
    freshBuckets.unpersist()
  }

  test("profileTable: empty table profiles to zeros, not nulls") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val out = graft.ops.Profile.profileTable(empty)
      .orderBy("column_name").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    assert(out.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("incremental fast twin: production banding drops the constructed copies") {
    val out = SparkEntry.benchOnlyQueries("p_dedup_incremental_fast")(
      spark, "/root/testdata/sf0.001").select("doc_id", "batch")
      .as[(Long, Long)].collect()
    val kept = out.map(_._1).toSet
    assert(out.nonEmpty && out.map(_._2).toSet == Set(0L, 1L))
    // every constructed copy (id = base + 100000) pairs with its base at
    // j = m/(m+3); at 16 hashes / 8 two-row bands the per-pair miss is
    // tiny, so ≥ 90% of copies must drop (hash-family-specific misses
    // keep this a floor, not an equality — the md5 twin is the
    // certified row)
    val copies = kept.count(_ >= 100000)
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(copies <= total / 10, s"copies kept: $copies of $total")
  }
}
