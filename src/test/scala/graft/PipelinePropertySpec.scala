package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized cross-checks of the distributed operators against naive
  * in-memory reference implementations (seeded — fully deterministic).
  * These guard the operator SEMANTICS the DuckDB oracles assume: if the
  * Spark plan and the reference ever disagree on any generated corpus,
  * the encoding tricks (boundary-safe BPE replace, gram ownership) have
  * silently diverged from the algorithm they claim to implement.
  */
class PipelinePropertySpec extends GraftSuite {
  import spark.implicits._

  // ---- naive BPE reference (textbook algorithm, no encoding tricks) ----

  private def naiveApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def naiveLearn(wordFreq: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var segs = wordFreq.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toVector.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        segs = segs.map { case (syms, f) => (naiveApply(syms, l, r), f) }
        round += 1
      }
    }
    merges.result()
  }

  private def naiveTokens(text: String, merges: Seq[(String, String)]): Int =
    text.trim.toLowerCase.split("\\s+").map { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (l, r)) => naiveApply(s, l, r)
      }.length
    }.sum

  test("learnBpe + bpeTokenCount match the naive reference on random corpora") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val vocab = Vector("a", "b", "c", "d")
      def word() = (0 until (1 + rnd.nextInt(5))).map(_ => vocab(rnd.nextInt(4))).mkString
      val words = (0 until 40).map(_ => word())
      val text = words.mkString(" ")
      val d = Seq((1L, text)).toDF("id", "text")

      val got = graft.functions.Bpe.learnBpe(d, "text", numMerges = 5)
      val wf = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val want = naiveLearn(wf, 5)
      assert(got.map(m => (m._2, m._3, m._4)) == want, s"seed=$seed merges diverge")

      val merges = got.map(m => (m._2, m._3))
      val gotN = d.select(graft.functions.Bpe.bpeTokenCount($"text", merges))
        .as[Int].collect()(0)
      assert(gotN == naiveTokens(text, merges), s"seed=$seed token count diverges")
    }
  }

  // ---- naive duplicated-span scrub reference ----

  private def naiveScrub(
      corpus: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toVector }.toMap
    val gramsOf = toks.map { case (id, ts) =>
      id -> (if (ts.length < k) Vector.empty[(Int, String)]
             else (0 to ts.length - k).map(i => i -> ts.slice(i, i + k).mkString(" ")).toVector)
    }
    val owners = gramsOf.toVector
      .flatMap { case (id, gs) => gs.map(_._2).distinct.map(g => g -> id) }
      .groupBy(_._1).collect { case (g, ids) if ids.map(_._2).distinct.size >= 2 =>
        g -> ids.map(_._2).min }
    toks.map { case (id, ts) =>
      val starts = gramsOf(id).collect {
        case (p, g) if owners.get(g).exists(_ != id) => p }
      val covered = starts.flatMap(s => s until s + k).toSet
      val kept = ts.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      id -> ((ts.length.toLong, (ts.length - kept.length).toLong, kept.mkString(" ")))
    }
  }

  test("scrubDupSpans matches the naive reference on random corpora") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed + 100)
      val vocab = Vector("red", "blue", "green", "gold", "gray")
      def doc() = (0 until (3 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(5))).mkString(" ")
      val corpus = (1L to 8L).map(i => i -> doc())
      val d = corpus.toDF("doc_id", "text")
      val got = graft.functions.TextAnalysis.scrubDupSpans(d, "doc_id", "text", k = 3)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = naiveScrub(corpus, 3)
      assert(got == want, s"seed=$seed scrub diverges\n got=$got\nwant=$want")
    }
  }

  // ---- naive epoch-mix reference (per-row md5 arithmetic in plain Scala) ----

  private def naiveEpochMix(
      rows: Seq[(Long, String)], factors: Seq[(String, Double)], salt: String): Seq[(Long, String, Int)] = {
    val fm = factors.toMap
    rows.flatMap { case (id, s) =>
      val f = fm.getOrElse(s, 1.0)
      val whole = math.floor(f).toInt
      val thr = f"${math.min(0xffffffffL, math.round((f - math.floor(f)) * 4294967296.0))}%08x"
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + salt).getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
      val n = whole + (if (hex < thr) 1 else 0)
      (0 until n).map(e => (id, s, e))
    }
  }

  test("epochMix matches the naive md5 reference on random factor maps") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val strata = Vector("a", "b", "c", "d", "e")
      val rows = (1L to 300L).map(i => (i, strata(rnd.nextInt(strata.length))))
      // random factors in [0, 3.2), with one stratum deliberately absent
      val factors = strata.take(4).map(s => s -> rnd.nextDouble() * 3.2)
      val got = graft.functions.Sampling.epochMix(
          rows.toDF("doc_id", "lang"), "lang", "doc_id", factors, salt = s"s$seed")
        .select("doc_id", "lang", "epoch")
        .as[(Long, String, Int)].collect().sorted.toSeq
      val want = naiveEpochMix(rows, factors, s"s$seed").sorted
      assert(got == want, s"seed=$seed epochMix diverges: got ${got.size} want ${want.size}")
    }
  }
}
