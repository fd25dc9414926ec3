package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the round-7 byte-loop expressions: each is
  * checked against a naive split/regex reference implementation over
  * adversarial generated text (newlines, runs of spaces/tabs, bullets,
  * dots, multi-byte chars), so the hand-rolled scanners can't silently
  * diverge from the `split`-semantics contracts their oracles assume.
  * Pure JVM — no Spark session needed.
  */
object TextExprPropertySpec extends Properties("TextExprs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // text over an alphabet rich in the edge characters the scanners parse
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("a", "b", "cat", "the", "•", "…", "-", "*", "."),
      3 -> Gen.oneOf(" ", "  ", "\t"),
      2 -> Gen.const("\n"),
      1 -> Gen.oneOf("...", "....", "- x", "  - y", "z..."))).map(_.mkString)

  private def lines(t: String): Array[String] = t.split("\n", -1)

  property("LineStatsExpr.NLines == split('\\n', -1) length") =
    Prop.forAll(textGen) { t =>
      graft.functions.LineStatsExpr.stat(t.getBytes("UTF-8"),
        graft.functions.LineStatsExpr.NLines) == lines(t).length
    }

  property("LineStatsExpr.BulletLines == space-ltrim'd startsWith -/*/•") =
    Prop.forAll(textGen) { t =>
      val expected = lines(t).count { l =>
        val s = l.dropWhile(_ == ' ')
        s.startsWith("-") || s.startsWith("*") || s.startsWith("•")
      }
      graft.functions.LineStatsExpr.stat(t.getBytes("UTF-8"),
        graft.functions.LineStatsExpr.BulletLines) == expected
    }

  property("LineStatsExpr.EllipsisLines == space-rtrim'd endsWith ...") =
    Prop.forAll(textGen) { t =>
      val expected = lines(t).count(_.reverse.dropWhile(_ == ' ').startsWith("..."))
      graft.functions.LineStatsExpr.stat(t.getBytes("UTF-8"),
        graft.functions.LineStatsExpr.EllipsisLines) == expected
    }

  property("LineStatsExpr.DistinctLines == distinct line strings") =
    Prop.forAll(textGen) { t =>
      graft.functions.LineStatsExpr.stat(t.getBytes("UTF-8"),
        graft.functions.LineStatsExpr.DistinctLines) == lines(t).distinct.length
    }

  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    Seq("the", "cat", "a").foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  property("DistinctStopwordHitsExpr == distinct lowercased-token intersection") =
    Prop.forAll(textGen) { t =>
      // reference: trim + \s+ split (dropping the leading-empty artifact),
      // lowercase, intersect
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSet
      val expected = toks.count(w => stopSet.contains(UTF8String.fromString(w)))
      graft.functions.DistinctStopwordHitsExpr.distinctHits(
        t.trim.getBytes("UTF-8"), stopSet) == expected
    }

  property("quantizeInt8 round-trip error ≤ half a step; codes within [0,255]") = {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f)).map(_.toArray)
    Prop.forAll(vecGen) { v =>
      val mn = v.min.toDouble
      val mx = v.max.toDouble
      val codes = v.map { x =>
        if (mx == mn) 0
        else math.min(255, math.round((x.toDouble - mn) * 255.0 / (mx - mn)).toInt)
      }
      val step = if (mx == mn) 0.0 else (mx - mn) / 255.0
      val deq = codes.map(c => mn + c.toDouble * (mx - mn) / 255.0)
      codes.forall(c => c >= 0 && c <= 255) &&
        v.zip(deq).forall { case (o, d) => math.abs(o.toDouble - d) <= step / 2 + 1e-9 }
    }
  }

  property("BigramLm signals: hand walk over random token streams") = {
    val lm = graft.functions.LanguageModel.BigramLm(
      vocab = Map("a" -> 5L, "b" -> 3L, "c" -> 2L),
      bigrams = Map(("a", "b") -> 2L, ("b", "c") -> 1L),
      totalTokens = 10L, vocabSize = 3)
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "z", "A", "B")).map(_.mkString(" "))
    Prop.forAll(tokGen) { t =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toList
      val inV = (w: String) => lm.vocab.contains(w)
      val expOov = toks.count(w => !inV(w))
      val pairs = if (toks.size < 2) Nil else toks.zip(toks.tail)
      val expInv = pairs.count { case (x, y) => inV(x) && inV(y) }
      val expHit = pairs.count(p => lm.bigrams.contains(p))
      val bytes = t.trim.getBytes("UTF-8")
      import graft.functions.BigramLmStatExpr._
      stat(bytes, lm.runtime, OovTokens) == expOov &&
        stat(bytes, lm.runtime, InvocabBigrams) == expInv &&
        stat(bytes, lm.runtime, HitBigrams) == expHit
    }
  }

  // include multi-byte codepoints AND combining sequences: the dHash
  // grid must count CODEPOINTS (the declared contract unit), not UTF-16
  // units, bytes, or grapheme clusters — "é" and the ZWJ emoji pin
  // that a combining sequence contributes one cell entry PER CODEPOINT
  // (a grapheme-indexing engine would diverge; see PayloadDHashExpr doc)
  private val payloadGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(5)),
      2 -> Gen.oneOf("世", "界", "é", "ß", " "),
      1 -> Gen.oneOf("𝄞", "e\u0301" /* e + combining acute */,
        "\ud83d\udc69\u200d\ud83d\udcbb" /* ZWJ emoji */))).map(_.mkString)

  property("PayloadDHashExpr == naive codepoint-grid dHash through all containers") =
    Prop.forAll(payloadGen) { t =>
      // independent naive reference: functional-style grid over codepoints
      val cps = t.codePoints.toArray
      val n = cps.length
      val cells = (0 until 72).map { k =>
        val lo = (k.toLong * n / 72).toInt; val hi = ((k + 1).toLong * n / 72).toInt
        (cps.slice(lo, hi).map(_.toLong).sum, (hi - lo).toLong)
      }
      val expected = (0 until 64).foldLeft(0L) { (h, j) =>
        val (s1, l1) = cells((j / 8) * 9 + (j % 8))
        val (s2, l2) = cells((j / 8) * 9 + (j % 8) + 1)
        if (s1 * l2 > s2 * l1) h | (1L << j) else h
      }
      val bytes = t.getBytes("UTF-8")
      import graft.functions.{Multimodal, PayloadDHashExpr}
      val viaPng = PayloadDHashExpr.hash(Multimodal.ImageHeader.synthPng(4, 4, bytes))
      val viaJpg = PayloadDHashExpr.hash(Multimodal.ImageHeader.synthJpeg(4, 4, bytes))
      // a WAV with an even-length data chunk IS valid mono PCM16 and takes
      // the sample path (its own property below) — the payload-walk
      // contract only binds the odd-length (invalid-PCM) case
      val viaWav = bytes.length % 2 == 0 ||
        PayloadDHashExpr.hash(Multimodal.AudioHeader.synthWav(8000, 1, bytes)) == expected
      val viaAvi = PayloadDHashExpr.hash(Multimodal.VideoHeader.synthAvi(4, 4, 2, 40000, bytes))
      viaPng == expected && viaJpg == expected && viaWav && viaAvi == expected
    }

  private val samplesGen: Gen[List[Int]] =
    Gen.listOf(Gen.chooseNum(-32768, 32767))

  property("PCM WAV dHash == naive sample-grid dHash, container-layout-invariant") =
    Prop.forAll(samplesGen, Gen.chooseNum(1, 4)) { (sampleList, channels) =>
      import graft.functions.{Multimodal, PayloadDHashExpr}
      val samples = sampleList.toArray
      val expected = PayloadDHashExpr.hashSeq(samples)
      val mono = Multimodal.AudioSamples.synthPcmWav(16000, 1, samples)
      val multi = Multimodal.AudioSamples.synthPcmWav(8000, channels, samples, junk = true)
      // decode must invert the encode exactly (mixdown of replicated
      // channels is the identity), and the hash must be invariant to
      // channel count, sample rate, and the junk LIST chunk
      Multimodal.AudioSamples.decodePcm16(mono).get.sameElements(samples) &&
        Multimodal.AudioSamples.decodePcm16(multi).get.sameElements(samples) &&
        PayloadDHashExpr.hash(mono) == expected &&
        PayloadDHashExpr.hash(multi) == expected
    }

  private val frameGen: Gen[(Int, Int, Int)] = for {
    w <- Gen.chooseNum(1, 24)
    h <- Gen.chooseNum(1, 12)
    n <- Gen.chooseNum(1, 4)
  } yield (w, h, n)

  property("DIB AVI dHash == naive frame-sum dHash, container-layout-invariant") =
    Prop.forAll(frameGen, Gen.chooseNum(0L, Long.MaxValue)) { case ((w, h, n), seed) =>
      import graft.functions.{Multimodal, PayloadDHashExpr}
      // deterministic pseudo-random gray frames from the seed
      val frames = (0 until n).map(f =>
        Array.tabulate(w * h)(p => (((seed + f * 131 + p * 31) % 256) + 256).toInt % 256))
      val expectSums = Array.tabulate(w * h)(p => frames.map(_(p)).sum)
      val expected = PayloadDHashExpr.hashPixels(w, h, expectSums)
      val base = Multimodal.VideoFrames.synthDibAvi(w, h, frames, 40000)
      val relaid = Multimodal.VideoFrames.synthDibAvi(w, h, frames, 40000, junk = true)
      // decode must invert the encode exactly (gray luma is the identity,
      // bottom-up rows unflipped, row padding skipped), and the hash must
      // be invariant to the JUNK chunk, idx1 index, and buffer-size hint
      Multimodal.VideoFrames.decodeDibLumaSums(base).get._3.sameElements(expectSums) &&
        Multimodal.VideoFrames.decodeDibLumaSums(relaid).get._3.sameElements(expectSums) &&
        PayloadDHashExpr.hash(base) == expected &&
        PayloadDHashExpr.hash(relaid) == expected
    }

  property("baseline JPEG: DC-only blocks decode flat under BOTH Huffman layouts") =
    Prop.forAll(Gen.listOfN(8, Gen.chooseNum(0, 255)), Gen.chooseNum(1, 4)) { (valList, dri) =>
      import graft.functions.Multimodal.JpegGray
      val vals = valList.toArray
      val q8 = Array.fill(64)(8)
      val blocks = vals.toSeq.map { v => val zz = new Array[Int](64); zz(0) = v - 128; zz }
      val expected = Array.tabulate(27 * 16)(p => vals(((p / 27) / 8) * 4 + (p % 27) / 8))
      val a = JpegGray.synthBaselineJpeg(27, 16, blocks, q8,
        JpegGray.DcAnnexK, JpegGray.AcSmallA, 0, "A".getBytes("US-ASCII"))
      val b = JpegGray.synthBaselineJpeg(27, 16, blocks, q8,
        JpegGray.DcFlat, JpegGray.AcSmallB, dri, "B2".getBytes("US-ASCII"))
      JpegGray.decodeJpegLuma(a).get._3.sameElements(expected) &&
        JpegGray.decodeJpegLuma(b).get._3.sameElements(expected)
    }

  // the (run, size) pairs the compact AC tables carry:
  // 0x01 0x11 0x21 0x31 / 0x02 0x12 0x22 / 0x03
  private val acPosVal: Gen[List[(Int, Int)]] =
    Gen.listOf(for {
      rs <- Gen.oneOf((0, 1), (1, 1), (2, 1), (3, 1), (0, 2), (1, 2), (2, 2), (0, 3))
      mag <- Gen.chooseNum(1 << (rs._2 - 1), (1 << rs._2) - 1)
      neg <- Gen.oneOf(true, false)
    } yield (rs._1, if (neg) -mag else mag))

  property("baseline JPEG: AC entropy coding round-trips against the reference IDCT") =
    Prop.forAll(Gen.chooseNum(-128, 127), acPosVal) { (dc, acs) =>
      import graft.functions.Multimodal.JpegGray
      val q = Array.tabulate(64)(i => 1 + (i * 5) % 29)
      val zz = new Array[Int](64)
      zz(0) = dc
      var k = 1
      acs.foreach { case (run, v) => k += run; if (k < 64) { zz(k) = v; k += 1 } }
      val bytes = JpegGray.synthBaselineJpeg(8, 8, Seq(zz), q,
        JpegGray.DcAnnexK, JpegGray.AcSmallA, 0, "ac".getBytes("US-ASCII"))
      val zig = Array(
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
      val f = new Array[Int](64)
      for (i <- 0 until 64) f(zig(i)) = zz(i) * q(i)
      JpegGray.decodeJpegLuma(bytes).get._3.sameElements(JpegGray.idct8x8(f))
    }

  property("color JPEG: DC-only Y/Cb/Cr decode to the exact integer color luma, any subsampling") =
    Prop.forAll(
      Gen.listOfN(8, Gen.chooseNum(0, 255)), // Y per visible 8×8 block (4×2 grid, 27×16 px)
      Gen.listOfN(2, Gen.chooseNum(0, 255)), // Cb per 16×16 region (2 across)
      Gen.listOfN(2, Gen.chooseNum(0, 255)), // Cr per 16×16 region
      Gen.oneOf((2, 2), (2, 1), (1, 2), (1, 1)),
      Gen.chooseNum(0, 3)) { (yL, cbL, crL, samp, dri) =>
      import graft.functions.Multimodal.JpegGray
      val (hs, vs) = samp
      val q8 = Array.fill(64)(8)
      def dc(v: Int) = { val z = new Array[Int](64); z(0) = v - 128; z }
      val yv = yL.toArray; val cb = cbL.toArray; val cr = crL.toArray
      // 27×16 luma: 4×2 visible blocks; chroma region = x half (0..1)
      val mcusX = (27 + 8 * hs - 1) / (8 * hs); val mcusY = (16 + 8 * vs - 1) / (8 * vs)
      val bwY = mcusX * hs; val bhY = mcusY * vs
      val yB = for (by <- 0 until bhY; bx <- 0 until bwY)
        yield dc(yv(math.min(by, 1) * 4 + math.min(bx, 3)))
      // one chroma block per MCU; its constant value is the region value
      // of the MCU's left edge — constant per 16-wide x half by
      // construction when hs=2; when hs=1 two MCUs share a region value
      val cbB = for (my <- 0 until mcusY; mx <- 0 until mcusX)
        yield dc(cb(math.min(mx * hs * 8 / 16, 1)))
      val crB = for (my <- 0 until mcusY; mx <- 0 until mcusX)
        yield dc(cr(math.min(mx * hs * 8 / 16, 1)))
      val bytes = JpegGray.synthBaselineJpegColor(27, 16, hs, vs, yB, cbB, crB,
        q8, q8, JpegGray.DcAnnexK, JpegGray.AcSmallA, JpegGray.DcFlat, JpegGray.AcSmallB,
        dri, "prop".getBytes("US-ASCII"))
      val (w, h, lum) = JpegGray.decodeJpegLuma(bytes).get
      val expected = Array.tabulate(27 * 16) { p =>
        val x = p % 27; val y = p / 27
        val b = (y / 8) * 4 + (x / 8)
        val r = math.min(x / 16, 1)
        JpegGray.ycbcrLuma(yv(b), cb(r), cr(r))
      }
      (w, h) == (27, 16) && lum.sameElements(expected)
    }

  property("progressive JPEG == baseline decode of the same blocks, any script depth") =
    Prop.forAll(
      Gen.listOfN(8, Gen.chooseNum(-128, 127)),
      Gen.listOf(for {
        rs <- Gen.oneOf((0, 1), (1, 1), (2, 1), (3, 1), (0, 2), (1, 2), (2, 2), (0, 3))
        mag <- Gen.chooseNum(1 << (rs._2 - 1), (1 << rs._2) - 1)
        neg <- Gen.oneOf(true, false)
        zrl <- Gen.chooseNum(0, 1)
      } yield (rs._1 + zrl * 16, if (neg) -mag else mag)),
      Gen.chooseNum(0, 1)) { (dcs, acs, deep) =>
      import graft.functions.Multimodal.JpegGray
      import JpegGray._
      val q = Array.tabulate(64)(i => 1 + (i * 5) % 29)
      val blocks = dcs.zipWithIndex.map { case (dc, bi) =>
        val zz = new Array[Int](64)
        zz(0) = dc
        var k = 1
        acs.drop(bi % 3).foreach { case (run, v) =>
          k += run; if (k < 64) { zz(k) = v; k += 1 }
        }
        zz
      }
      val base = synthBaselineJpeg(27, 16, blocks, q, DcAnnexK, AcSmallA, 0,
        "b".getBytes("US-ASCII"))
      val expected = decodeJpegLuma(base).get._3
      val script =
        if (deep == 0) Seq(
          (Seq(0), 0, 0, 0, 1), (Seq(0), 1, 5, 0, 1), (Seq(0), 6, 63, 0, 1),
          (Seq(0), 0, 0, 1, 0), (Seq(0), 1, 5, 1, 0), (Seq(0), 6, 63, 1, 0))
        else Seq(
          (Seq(0), 0, 0, 0, 2), (Seq(0), 1, 63, 0, 2),
          (Seq(0), 0, 0, 2, 1), (Seq(0), 1, 63, 2, 1),
          (Seq(0), 0, 0, 1, 0), (Seq(0), 1, 63, 1, 0))
      val prog = synthProgressiveJpeg(27, 16, 1, 1, blocks, Nil, Nil, q, q,
        DcAnnexK, AcProgA, DcFlat, AcProgB, script, "p".getBytes("US-ASCII"))
      decodeJpegLuma(prog).get._3.sameElements(expected)
    }

  property("palette/Adam7 PNG round-trip: any dims, any filter, permuted PLTE") =
    Prop.forAll(Gen.chooseNum(1, 40), Gen.chooseNum(1, 24),
      Gen.chooseNum(0, 4), Gen.chooseNum(0, 255)) { (w, h, f, seed) =>
      import graft.functions.Multimodal.ImagePixels
      val px = Array.tabulate(w * h)(p => (p * 31 + seed) % 256)
      val adam = ImagePixels.encodePngGrayAdam7(w, h, px, level = 6, filter = f)
      def perm(v: Int) = (v * 11 + seed) % 256 // gcd(11,256)=1 — bijective
      val palette = new Array[Int](256 * 3)
      (0 until 256).foreach { v =>
        val j = perm(v)
        palette(3 * j) = v; palette(3 * j + 1) = v; palette(3 * j + 2) = v
      }
      val pal = ImagePixels.encodePngPalette(w, h, palette, px.map(perm),
        level = 1, filter = (f + 1) % 5)
      val a = ImagePixels.decodePngLuma(adam)
      val p = ImagePixels.decodePngLuma(pal)
      a.exists(_._3.sameElements(px)) && p.exists(_._3.sameElements(px))
    }

  // ---- decoder totality: these codecs parse UNTRUSTED bytes inside
  // executors, so ANY corruption must yield a hash or a clean fallback,
  // never an exception, a giant allocation, or a hang ----

  private def validContainers(seed: Int): Seq[Array[Byte]] = {
    import graft.functions.Multimodal._
    val px = Array.tabulate(27 * 16)(p => (p * 7 + seed) % 256)
    val samples = Array.tabulate(100)(i => ((i * 131 + seed) % 65536) - 32768)
    val frames = (0 until 2).map(f => Array.tabulate(9 * 6)(p => (p + f + seed) % 256))
    val zz = { val z = new Array[Int](64); z(0) = seed % 128; z }
    val idPalette = Array.tabulate(256 * 3)(i => i / 3) // entry v = (v,v,v)
    Seq(
      ImagePixels.encodePngGray(27, 16, px, level = 6, filter = seed % 5),
      ImagePixels.encodePngPalette(27, 16, idPalette, px, level = 6,
        filter = (seed + 1) % 5),
      ImagePixels.encodePngGrayAdam7(27, 16, px, level = 6, filter = (seed + 2) % 5),
      AudioSamples.synthPcmWav(8000, 1 + seed % 2, samples, junk = seed % 2 == 0),
      AudioSamples.synthPcm8Wav(8000, 1 + seed % 2,
        samples.map(s => (s + 32768) >> 8), junk = seed % 2 == 1),
      AudioSamples.synthFloatWav(8000, 1 + seed % 2, samples),
      AudioSamples.synthPcm24Wav(8000, 1 + seed % 2, samples, junk = seed % 2 == 0),
      VideoFrames.synthDibAvi(9, 6, frames, 40000, junk = seed % 2 == 0),
      JpegGray.synthBaselineJpeg(16, 8, Seq(zz, zz), Array.fill(64)(8),
        JpegGray.DcAnnexK, JpegGray.AcSmallA, seed % 3, "f".getBytes("US-ASCII")),
      JpegGray.synthBaselineJpegColor(16, 8, 2, 1, Seq(zz, zz), Seq(zz), Seq(zz),
        Array.fill(64)(8), Array.fill(64)(8),
        JpegGray.DcAnnexK, JpegGray.AcSmallA, JpegGray.DcFlat, JpegGray.AcSmallB,
        seed % 3, "fc".getBytes("US-ASCII")),
      JpegGray.synthProgressiveJpeg(16, 8, 1, 1, Seq(zz, zz), Nil, Nil,
        Array.fill(64)(8), Array.fill(64)(8),
        JpegGray.DcAnnexK, JpegGray.AcProgA, JpegGray.DcFlat, JpegGray.AcProgB,
        Seq((Seq(0), 0, 0, 0, 1), (Seq(0), 1, 63, 0, 1),
          (Seq(0), 0, 0, 1, 0), (Seq(0), 1, 63, 1, 0)),
        "fp".getBytes("US-ASCII")),
      ImageHeader.synthPng(4, 4, Array.tabulate(20)(i => (i + seed).toByte)),
      VideoHeader.synthAvi(4, 4, 2, 40000, Array.tabulate(20)(i => (i + seed).toByte)))
  }

  property("decoder totality: corrupted containers never throw from the hash chain") =
    Prop.forAll(Gen.chooseNum(0, 10000), Gen.chooseNum(0, 2), Gen.chooseNum(0, 1 << 20)) {
      (seed, mode, r) =>
        import graft.functions.PayloadDHashExpr
        validContainers(seed).forall { bytes =>
          val at = java.lang.Math.floorMod(r, math.max(1, bytes.length))
          val mutated = mode match {
            case 0 => bytes.take(at) // truncate
            case 1 => // flip one byte
              val c = bytes.clone(); c(at) = (c(at) ^ 0xff).toByte; c
            case _ => // overwrite a byte with an arbitrary value
              val c = bytes.clone(); c(at) = (r >> 8).toByte; c
          }
          PayloadDHashExpr.hash(mutated) // Long or null — must not throw
          true
        }
    }

  property("decoder totality: headers declaring giga-pixel dims decline, never allocate") =
    Prop.forAll(Gen.chooseNum(1 << 13, 1 << 15)) { big =>
      import graft.functions.Multimodal._
      // JPEG SOF0 with big×big dims (up to 2^30 px) but a tiny body
      val zz = new Array[Int](64)
      val jpeg = JpegGray.synthBaselineJpeg(16, 8, Seq(zz, zz), Array.fill(64)(8),
        JpegGray.DcAnnexK, JpegGray.AcSmallA, 0, "x".getBytes("US-ASCII"))
      // patch the SOF0 dims in place (offsets: SOI(2) + APP0(18) + COM(5)
      // vary — find 0xFFC0 and patch h/w at +5..+8)
      val j = jpeg.clone()
      val sof = j.indices.dropRight(8).find(i => (j(i) & 0xff) == 0xff && (j(i + 1) & 0xff) == 0xc0).get
      j(sof + 5) = (big >> 8).toByte; j(sof + 6) = big.toByte
      j(sof + 7) = (big >> 8).toByte; j(sof + 8) = big.toByte
      val jpegDeclined = JpegGray.decodeJpegLuma(j).isEmpty
      // DIB AVI whose strf declares big×big
      val avi = VideoFrames.synthDibAvi(9, 6, Seq(Array.fill(54)(0)), 40000).clone()
      def patch32(at: Int, v: Int): Unit = {
        avi(at) = v.toByte; avi(at + 1) = (v >> 8).toByte
        avi(at + 2) = (v >> 16).toByte; avi(at + 3) = (v >> 24).toByte
      }
      val strf = avi.indices.dropRight(48).find(i =>
        avi(i) == 's' && avi(i + 1) == 't' && avi(i + 2) == 'r' && avi(i + 3) == 'f').get
      patch32(strf + 12, big); patch32(strf + 16, big)
      val aviDeclined = VideoFrames.decodeDibLumaSums(avi).isEmpty
      // PNG whose IHDR declares big×big (CRC wrong is fine — dims gate first)
      val png = ImagePixels.encodePngGray(4, 4, Array.fill(16)(0), 1, 0).clone()
      def pbe32(at: Int, v: Int): Unit = {
        png(at) = (v >> 24).toByte; png(at + 1) = (v >> 16).toByte
        png(at + 2) = (v >> 8).toByte; png(at + 3) = v.toByte
      }
      pbe32(16, big); pbe32(20, big)
      val pngDeclined = ImagePixels.decodePngLuma(png).isEmpty
      jpegDeclined && aviDeclined && pngDeclined
    }

  // ---- MojibakeFixExpr (round-11) -------------------------------------

  private def fixStr(s: String): String =
    graft.functions.MojibakeFixExpr.fix(UTF8String.fromString(s)).toString

  /** UTF-8 bytes misdecoded as Latin-1 — the corruption fixMojibake undoes. */
  private def mojify(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private val asciiGen: Gen[String] =
    Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  // strings guaranteed non-ASCII: accented Latin, Greek, CJK, an emoji
  private val richGen: Gen[String] = for {
    pre <- asciiGen
    core <- Gen.nonEmptyListOf(Gen.oneOf(
      "é", "ï", "ü", "ñ", "ç", "ß", "λ", "Ж", "中", "文", "😀", "—")).map(_.mkString)
    post <- asciiGen
  } yield pre + core + post

  property("fixMojibake: ASCII is identity") =
    Prop.forAll(asciiGen) { s => fixStr(s) == s }

  property("fixMojibake: repairs any Latin-1 misdecode of non-ASCII text") =
    Prop.forAll(richGen) { s => fixStr(mojify(s)) == s }

  property("fixMojibake: any repair round-trips back to the input") =
    Prop.forAll(Gen.listOf(Gen.choose(0x20.toChar, 0xFF.toChar)).map(_.mkString)) { s =>
      val f = fixStr(s)
      f == s || mojify(f) == s
    }

  property("fixMojibake: never introduces a replacement char") =
    Prop.forAll(Gen.listOf(Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString)) { s =>
      !fixStr(s).contains('\uFFFD') || s.contains('\uFFFD')
    }

  // ---- WordGramsExpr vs the split("\s+", -1) + sliding-join reference ----

  private def refGrams(t: String, k: Int, distinct: Boolean): Seq[String] = {
    // Java Pattern.split with limit -1 IS Spark split's semantics
    // (leading AND trailing empties kept, "" -> [""])
    val toks = java.util.regex.Pattern.compile("\\s+").split(t, -1)
    val grams =
      if (toks.length < k) Seq(toks.mkString(" "))
      else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
    if (distinct) grams.distinct else grams
  }

  private def fusedGrams(t: String, k: Int, distinct: Boolean): Seq[String] = {
    val a = graft.functions.WordGramsExpr.grams(t.getBytes("UTF-8"), k, distinct)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  private val gramTextGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("a", "bb", "cat", "\u65E5\u672C", "x1"),
      3 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "", "\f"),
      1 -> Gen.const(""))).map(_.mkString)

  property("WordGramsExpr(k=2) == split+slide lambda") =
    Prop.forAll(gramTextGen) { t => fusedGrams(t, 2, false) == refGrams(t, 2, false) }

  property("WordGramsExpr(k=3, distinct) == array_distinct(split+slide)") =
    Prop.forAll(gramTextGen) { t => fusedGrams(t, 3, true) == refGrams(t, 3, true) }

  property("WordGramsExpr handles k > token count (single collapsed gram)") =
    Prop.forAll(Gen.oneOf("", " ", "a", "a b", "\t\t", " a ")) { t =>
      (1 to 5).forall(k => fusedGrams(t, k, false) == refGrams(t, k, false))
    }
}
