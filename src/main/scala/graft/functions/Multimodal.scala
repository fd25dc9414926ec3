package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` content columns plus typed
  * metadata, processed per-partition in batches.
  *
  * Container decode is REAL for all three modalities: PNG IHDR / JPEG SOF
  * frame headers ([[ImageHeader]]), WAV/RIFF fmt+data chunks
  * ([[AudioHeader]]), and AVI/RIFF avih headers ([[VideoHeader]]) are all
  * parsed from the payload bytes — public formats, dependency-free. Only
  * the *feature vector* is a stand-in (a content-hash projection — this
  * container ships no embedding model); a real featurizer (JNI FFmpeg
  * frames → model, or a Python `mapInPandas` worker in PySpark) plugs
  * into the same [[Decoder.decode]] boundary. Everything around it —
  * schema, batching, partition sizing, output contract — is real Spark
  * and tested.
  */
object Multimodal {

  /** Decoder allocation guards: these codecs parse UNTRUSTED bytes inside
    * executors, so a malformed header declaring giga-pixel dims must cost
    * None, not an OOM or a NegativeArraySizeException. 64 MB of decoded
    * bytes / 16 M pixels covers every real fixture by orders of magnitude
    * (an 8K frame is 33 MB decoded); anything larger is out of the
    * documented scope and falls back to the payload walk. */
  private[functions] val MaxDecodeBytes: Long = 1L << 26
  private[functions] val MaxDecodePixels: Long = 1L << 24

  /** A media record: the multimodal table schema. `content` is the opaque
    * payload; `meta` carries source-asserted properties. */
  case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      uri: String,
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Extracted features: fixed-width vector + decoded properties. Audio
    * fields (`sample_rate`, `channels`, `decoded_duration_ms`) are parsed
    * from the payload bytes for WAV; video dims/frames/duration are parsed
    * from AVI avih headers; zero for fields a modality doesn't have. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      content_hash: Long,
      decoded_width: Int,
      decoded_height: Int,
      frames_sampled: Int,
      sample_rate: Int,
      channels: Int,
      decoded_duration_ms: Long,
      feature: Array[Float])

  /** Minimal real encoders/decoders for the two ubiquitous public image
    * container formats — enough to write structurally-valid files whose
    * dimensions are then parsed back from the BYTES, not copied from
    * metadata. PNG: 8-byte signature + IHDR (width/height as big-endian
    * 32-bit at data offsets 0/4) with correct CRC32s; JPEG: SOI + SOF0
    * frame header (height/width as big-endian 16-bit). */
  object ImageHeader {
    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** (width, height) from PNG or JPEG bytes; None if neither parses. */
    def decode(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
        Some((be32(b, 16), be32(b, 20)))
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        jpegSof(b)
      else None

    /** Walk JPEG segments to the first SOFn frame header. */
    private def jpegSof(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val m = b(i + 1) & 0xff
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
        else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return None
          return Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
        } else if (m == 0xd9) return None // EOI before any SOF
        else i += 2 + be16(b, i + 2)
      }
      None
    }

    /** Rewrite the container's declared dimensions IN PLACE on a copy of
      * the bytes: PNG IHDR width/height patched (big-endian 32-bit at data
      * offsets 0/4) with the chunk CRC32 recomputed; JPEG SOFn
      * height/width patched (big-endian 16-bit, no checksum in JPEG).
      * Works on any structurally valid PNG/JPEG, not just synthesized
      * ones. None if the bytes parse as neither. */
    def rewriteDims(b: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR") {
        val out = b.clone()
        def w32(i: Int, v: Int): Unit = {
          out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
          out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
        }
        w32(16, w); w32(20, h)
        val crc = new java.util.zip.CRC32
        crc.update(out, 12, 4 + 13) // chunk type + IHDR data
        w32(29, crc.getValue.toInt)
        Some(out)
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        require(w <= 0xffff && h <= 0xffff, "jpeg dims are 16-bit")
        var i = 2
        while (i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) return None
          val m = b(i + 1) & 0xff
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
          else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 >= b.length) return None
            val out = b.clone()
            out(i + 5) = (h >>> 8).toByte; out(i + 6) = h.toByte
            out(i + 7) = (w >>> 8).toByte; out(i + 8) = w.toByte
            return Some(out)
          } else if (m == 0xd9) return None
          else i += 2 + be16(b, i + 2)
        }
        None
      } else None
    }

    // --- synthesis (for the hermetic verify corpus and tests) ---

    private def chunk(out: java.io.ByteArrayOutputStream, tpe: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit =
        out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      w32(data.length)
      val tb = tpe.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
    }

    /** Structurally valid PNG: signature + IHDR(w,h,8-bit RGB) + a tEXt
      * chunk carrying `payload` + IEND. 57 + payload.length bytes. */
    def synthPng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(PngSig)
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      chunk(out, "IHDR", ihdr)
      chunk(out, "tEXt", payload)
      chunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Minimal JPEG: SOI + SOF0(8-bit, h×w, 3 components) + COM segment
      * carrying `payload` + EOI. 27 + payload.length bytes. */
    def synthJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      require(w <= 0xffff && h <= 0xffff, "jpeg dims are 16-bit")
      require(payload.length <= 0xfffd, "COM payload must fit a 16-bit length")
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      b(0xff, 0xd8) // SOI
      b(0xff, 0xc0, 0x00, 0x11, 0x08, h >>> 8, h, w >>> 8, w, 0x03, // SOF0
        0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
      b(0xff, 0xfe, (payload.length + 2) >>> 8, payload.length + 2) // COM
      out.write(payload)
      b(0xff, 0xd9) // EOI
      out.toByteArray
    }

    /** Extract the embedded payload from a synthesized container: the
      * PNG `tEXt` chunk data or the JPEG `COM` segment body — the walk
      * parses real chunk/segment structure (lengths, markers, EOI), the
      * same standard as [[decode]]. None when no payload chunk exists. */
    def extractPayload(b: Array[Byte]): Option[Array[Byte]] = {
      if (b.length >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i))) {
        var i = 8
        while (i + 8 <= b.length) {
          val len = be32(b, i)
          if (len < 0) return None // corrupt length: no progress, no negative copy
          val tpe = new String(b, i + 4, 4, "US-ASCII")
          if (tpe == "tEXt" && i + 8 + len <= b.length)
            return Some(java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len))
          if (tpe == "IEND") return None
          i += 12 + len // length + type + data + crc
        }
        None
      } else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
          val marker = b(i + 1) & 0xff
          if (marker == 0xd9) return None // EOI
          val len = be16(b, i + 2)
          if (len < 2) return None // segment lengths include their own 2 bytes
          if (marker == 0xfe && i + 2 + len <= b.length)
            return Some(java.util.Arrays.copyOfRange(b, i + 4, i + 2 + len))
          i += 2 + len
        }
        None
      } else None
    }
  }

  /** REAL pixel-level PNG codec — dependency-free (`java.util.zip`
    * Inflater/Deflater + the five standard scanline filters from the PNG
    * spec, RFC 2083 §6). This retires the round-8 "payload-as-luma" stub
    * boundary for PNG: two visually identical PNGs written by different
    * encoders (different zlib levels, different filter choices) have
    * different BYTES but decode to the same pixels, so perceptual dedup
    * must hash pixels, not payload bytes — pinned by MultimodalSpec's
    * different-encoder fixture and the `p_dedup_image_px` contract query.
    * (JPEG/WAV/AVI pixel kernels followed in round 9 — [[JpegGray]],
    * [[AudioSamples]], [[VideoFrames]] — so no payload-walk stub remains
    * on any decode path with a synthesizable fixture.)
    *
    * Decoder scope (documented contract): 8-bit depth, color types 0
    * (gray), 2 (RGB), 3 (palette via PLTE), 4 (gray+alpha), 6 (RGBA),
    * non-interlaced AND Adam7-interlaced, multi-IDAT. Anything else →
    * None (never a wrong answer). */
  object ImagePixels {
    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    /** Integer luma (ITU-R BT.601 weights, floor division — exact and
      * engine-replayable): gray passes through, RGB(A) folds. */
    private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

    /** Adam7 interlace pass geometry: (xStart, yStart, xStep, yStep) per
      * pass, in stream order (PNG spec §8.2). */
    private val Adam7 = Array(
      (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    /** Decode a PNG to (width, height, per-pixel luma ints in row-major
      * order). None when the bytes are not a PNG in the supported scope. */
    def decodePngLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 33 || !PngSig.indices.forall(i => b(i) == PngSig(i))) return None
      if (new String(b, 12, 4, "US-ASCII") != "IHDR") return None
      val w = be32(b, 16); val h = be32(b, 20)
      val bitDepth = b(24) & 0xff; val colorType = b(25) & 0xff
      val interlace = b(28) & 0xff
      if (w <= 0 || h <= 0 || bitDepth != 8 || interlace > 1) return None
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      // gather IDAT chunk data (chunks may split the zlib stream anywhere)
      // and the PLTE palette (must precede IDAT for color type 3)
      val idat = new java.io.ByteArrayOutputStream()
      var plte: Array[Byte] = null
      var i = 8
      var sawEnd = false
      while (i + 8 <= b.length && !sawEnd) {
        val len = be32(b, i)
        if (len < 0 || i + 12 + len > b.length) return None
        val tpe = new String(b, i + 4, 4, "US-ASCII")
        if (tpe == "IDAT") idat.write(b, i + 8, len)
        else if (tpe == "PLTE") {
          if (plte != null || idat.size() > 0) return None // one PLTE, before IDAT
          plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        }
        else if (tpe == "IEND") sawEnd = true
        i += 12 + len
      }
      if (colorType == 3 &&
          (plte == null || plte.length == 0 || plte.length % 3 != 0 ||
            plte.length > 768)) return None
      val nPal = if (plte == null) 0 else plte.length / 3
      val compressed = idat.toByteArray
      if (compressed.isEmpty) return None
      // pass geometry: non-interlaced is one full-size pass; Adam7 is the
      // seven sub-images, each with its own filtered scanline block
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
      def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
        val (xs, ys, dx, dy) = p
        (if (w > xs) (w - xs + dx - 1) / dx else 0,
          if (h > ys) (h - ys + dy - 1) / dy else 0)
      }
      // inflate to exactly the concatenated per-pass scanline blocks.
      // Long arithmetic + the shared pixel cap: a 30-byte file declaring
      // 2-gigapixel dims must cost None, not a multi-GB allocation (these
      // decoders run on untrusted bytes inside executors)
      val expect = passes.map { p =>
        val (pw, ph) = passDims(p)
        if (pw == 0 || ph == 0) 0L else ph.toLong * (1L + pw.toLong * channels)
      }.sum
      if (expect == 0 || expect > MaxDecodeBytes) return None
      val raw = new Array[Byte](expect.toInt)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(compressed)
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && inf.needsInput()) return None // truncated stream
          off += n
        }
        if (off != raw.length) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
      val out = new Array[Int](w * h)
      // per pass: de-filter the block in place (PNG spec §6.2-6.6 —
      // filters reset at each pass boundary), then write lumas into the
      // full-size grid at the pass's (start, step) coordinates
      val bpp = channels
      var passOff = 0
      var ok = true
      passes.foreach { case (xs, ys, dx, dy) =>
        val (pw, ph) = passDims((xs, ys, dx, dy))
        if (ok && pw > 0 && ph > 0) {
          val stride = 1 + pw * channels
          var y = 0
          while (y < ph && ok) {
            val rowOff = passOff + y * stride
            val ft = raw(rowOff) & 0xff
            var x = 1
            while (x < stride) {
              val cur = raw(rowOff + x) & 0xff
              val left = if (x > bpp) raw(rowOff + x - bpp) & 0xff else 0
              val up = if (y > 0) raw(rowOff - stride + x) & 0xff else 0
              val ul = if (y > 0 && x > bpp) raw(rowOff - stride + x - bpp) & 0xff else 0
              val rec = ft match {
                case 0 => cur
                case 1 => cur + left
                case 2 => cur + up
                case 3 => cur + (left + up) / 2
                case 4 =>
                  val p = left + up - ul
                  val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                  val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
                  cur + pred
                case _ => ok = false; 0
              }
              raw(rowOff + x) = (rec & 0xff).toByte
              x += 1
            }
            // luma straight into the de-interlaced grid
            var px = 0
            while (px < pw && ok) {
              val o = rowOff + 1 + px * channels
              val l = colorType match {
                case 0 | 4 => raw(o) & 0xff // gray(+alpha): luma is the gray sample
                case 3 =>
                  val idx = raw(o) & 0xff
                  if (idx >= nPal) { ok = false; 0 } // out-of-range palette ref
                  else luma(plte(3 * idx) & 0xff, plte(3 * idx + 1) & 0xff,
                    plte(3 * idx + 2) & 0xff)
                case _ => luma(raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff)
              }
              out((ys + y * dy) * w + (xs + px * dx)) = l
              px += 1
            }
            y += 1
          }
          passOff += ph * stride
        }
      }
      if (!ok) None else Some((w, h, out))
    }

    /** Encode 8-bit grayscale pixels as a real PNG: zlib-deflated IDAT at
      * the given compression `level` with the given scanline `filter`
      * (0-4, applied uniformly). Different (level, filter) choices give
      * byte-DIFFERENT files for the same pixels — the different-encoder
      * fixture [[decodePngLuma]] must see through. */
    def encodePngGray(w: Int, h: Int, gray: Array[Int], level: Int, filter: Int): Array[Byte] = {
      require(gray.length == w * h, s"need $w*$h pixels, got ${gray.length}")
      require(filter >= 0 && filter <= 4, "filter must be 0-4")
      val stride = 1 + w
      val raw = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        raw(y * stride) = filter.toByte
        var x = 0
        while (x < w) {
          val cur = gray(y * w + x) & 0xff
          val left = if (x > 0) gray(y * w + x - 1) & 0xff else 0
          val up = if (y > 0) gray((y - 1) * w + x) & 0xff else 0
          val ul = if (y > 0 && x > 0) gray((y - 1) * w + x - 1) & 0xff else 0
          val f = filter match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
              cur - pred
          }
          raw(y * stride + 1 + x) = (f & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater(level)
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val zOut = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(PngSig)
      def chunk(tpe: String, data: Array[Byte]): Unit = {
        def w32(v: Int): Unit =
          out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
        w32(data.length)
        val tb = tpe.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32
        crc.update(tb); crc.update(data)
        w32(crc.getValue.toInt)
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // 8-bit grayscale
        .put(0.toByte).put(0.toByte).put(0.toByte).array())
      chunk("IDAT", zOut.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Encode 8-bit PALETTE pixels as a real PNG (color type 3): `idx`
      * are palette indices, `palette` is the flat RGB triple array PLTE
      * carries. Same scanline filtering as the gray encoder (1
      * byte/pixel); a permuted palette gives a byte-DIFFERENT file whose
      * decode must route through the PLTE lookup to recover the same
      * luma field. */
    def encodePngPalette(w: Int, h: Int, palette: Array[Int], idx: Array[Int],
        level: Int, filter: Int): Array[Byte] = {
      require(idx.length == w * h, s"need $w*$h indices, got ${idx.length}")
      require(palette.length % 3 == 0 && palette.nonEmpty && palette.length <= 768,
        "palette must be 1-256 flat RGB triples")
      require(idx.forall(i => i >= 0 && i * 3 < palette.length),
        "every index must reference a palette entry")
      val plte = palette.map(v => (v & 0xff).toByte)
      pngEncode(w, h, idx, level, filter, colorType = 3, plte = plte,
        interlaced = false)
    }

    /** Encode 8-bit grayscale pixels as an ADAM7-INTERLACED PNG: the
      * seven-pass scanline layout with per-pass filtering — byte-
      * different from every sequential encode of the same pixels, so a
      * pairing hash certifies the de-interlace path. */
    def encodePngGrayAdam7(w: Int, h: Int, gray: Array[Int], level: Int,
        filter: Int): Array[Byte] = {
      require(gray.length == w * h, s"need $w*$h pixels, got ${gray.length}")
      pngEncode(w, h, gray, level, filter, colorType = 0, plte = null,
        interlaced = true)
    }

    /** Shared 1-byte-per-pixel PNG writer behind the gray/palette/Adam7
      * encoders: builds the (possibly per-pass) filtered scanlines,
      * deflates once, writes IHDR [PLTE] IDAT IEND. */
    private def pngEncode(w: Int, h: Int, px: Array[Int], level: Int,
        filter: Int, colorType: Int, plte: Array[Byte],
        interlaced: Boolean): Array[Byte] = {
      require(filter >= 0 && filter <= 4, "filter must be 0-4")
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlaced) Adam7 else Array((0, 0, 1, 1))
      val rawOut = new java.io.ByteArrayOutputStream()
      passes.foreach { case (xs, ys, dx, dy) =>
        val pw = if (w > xs) (w - xs + dx - 1) / dx else 0
        val ph = if (h > ys) (h - ys + dy - 1) / dy else 0
        if (pw > 0 && ph > 0) {
          // materialize the pass sub-image, then filter it like any image
          val sub = Array.tabulate(pw * ph)(p =>
            px((ys + (p / pw) * dy) * w + (xs + (p % pw) * dx)) & 0xff)
          var y = 0
          while (y < ph) {
            rawOut.write(filter)
            var x = 0
            while (x < pw) {
              val cur = sub(y * pw + x)
              val left = if (x > 0) sub(y * pw + x - 1) else 0
              val up = if (y > 0) sub((y - 1) * pw + x) else 0
              val ul = if (y > 0 && x > 0) sub((y - 1) * pw + x - 1) else 0
              val f = filter match {
                case 0 => cur
                case 1 => cur - left
                case 2 => cur - up
                case 3 => cur - (left + up) / 2
                case 4 =>
                  val p = left + up - ul
                  val pa = math.abs(p - left); val pb = math.abs(p - up)
                  val pc = math.abs(p - ul)
                  val pred = if (pa <= pb && pa <= pc) left
                    else if (pb <= pc) up else ul
                  cur - pred
              }
              rawOut.write(f & 0xff)
              x += 1
            }
            y += 1
          }
        }
      }
      val raw = rawOut.toByteArray
      val deflater = new java.util.zip.Deflater(level)
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val zOut = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(PngSig)
      def chunk(tpe: String, data: Array[Byte]): Unit = {
        def w32(v: Int): Unit =
          out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
        w32(data.length)
        val tb = tpe.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32
        crc.update(tb); crc.update(data)
        w32(crc.getValue.toInt)
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put((if (interlaced) 1 else 0).toByte).array())
      if (plte != null) chunk("PLTE", plte)
      chunk("IDAT", zOut.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Deterministic pixel field from text — the generative rule the
      * DuckDB oracle replays (the pixel analog of the payload-as-text
      * oracles): pixel p of the row-major w×h grid is
      * `codepoint[p mod n] mod 256` (0 for empty text). */
    def pixelsFromText(text: String, w: Int, h: Int): Array[Int] = {
      val cps = text.codePoints().toArray
      val n = cps.length
      Array.tabulate(w * h)(p => if (n == 0) 0 else cps(p % n) % 256)
    }

    /** REAL pixel downsample: one integer decimation factor
      * `k = max(ceil(w/maxW), ceil(h/maxH))` on both axes (aspect
      * preserved, never upscales), each output pixel the floor MEAN of
      * its k×k box (edge boxes partial — divided by their true size).
      * Pure integer arithmetic, so the result is externally replayable
      * cell-for-cell — the resize analog of the dHash's exact-mean
      * discipline. Returns (outW, outH, pixels). */
    def boxDownsample(
        w: Int, h: Int, lum: Array[Int], maxW: Int, maxH: Int): (Int, Int, Array[Int]) = {
      require(w > 0 && h > 0 && lum.length == w * h, "need a w*h pixel grid")
      require(maxW > 0 && maxH > 0, "resize box must be positive")
      val k = math.max(1, math.max((w + maxW - 1) / maxW, (h + maxH - 1) / maxH))
      val ow = (w + k - 1) / k; val oh = (h + k - 1) / k
      val out = new Array[Int](ow * oh)
      var by = 0
      while (by < oh) {
        val y0 = by * k; val y1 = math.min(h, y0 + k)
        var bx = 0
        while (bx < ow) {
          val x0 = bx * k; val x1 = math.min(w, x0 + k)
          var acc = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { acc += lum(y * w + x); x += 1 }
            y += 1
          }
          out(by * ow + bx) = (acc / ((y1 - y0).toLong * (x1 - x0))).toInt
          bx += 1
        }
        by += 1
      }
      (ow, oh, out)
    }

    /** Pixel-level PNG resize-to-fit: decode → [[boxDownsample]] →
      * re-encode grayscale (the luma field is the content contract —
      * vision-preprocessing resize, not a color-preserving edit). None
      * when the bytes aren't a pixel-bearing PNG — callers fall back to
      * the header-patch path for that declared boundary. */
    def resizePngToFit(bytes: Array[Byte], maxW: Int, maxH: Int): Option[(Int, Int, Array[Byte])] =
      decodePngLuma(bytes).map { case (w, h, lum) =>
        val (ow, oh, px) = boxDownsample(w, h, lum, maxW, maxH)
        (ow, oh, encodePngGray(ow, oh, px, level = 6, filter = 0))
      }
  }

  /** Minimal real encoder/decoder for the canonical PCM audio container —
    * RIFF/WAVE (public format): 12-byte RIFF header, `fmt ` chunk
    * (channels at offset 2, sample rate at 4, byte rate at 8, bits at 14,
    * all little-endian), then chunks walked to `data`. Duration is derived
    * from the data chunk length and the byte rate — parsed from the BYTES,
    * not echoed from metadata, same standard as [[ImageHeader]]. */
  object AudioHeader {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** (sampleRate, channels, durationMs) from WAV bytes; None if the
      * container doesn't parse. Walks chunks so extra chunks (LIST, fact)
      * before `data` are handled. */
    def decode(b: Array[Byte]): Option[(Int, Int, Long)] = {
      if (b.length < 44 ||
        new String(b.slice(0, 4), "US-ASCII") != "RIFF" ||
        new String(b.slice(8, 12), "US-ASCII") != "WAVE") return None
      var sampleRate = 0; var channels = 0; var byteRate = 0
      var dataLen = -1L
      var i = 12
      while (i + 8 <= b.length && dataLen < 0) {
        val id = new String(b.slice(i, i + 4), "US-ASCII")
        val len = le32(b, i + 4)
        // a negative (or cursor-overflowing) chunk length is malformed —
        // stepping by it would loop forever or walk backwards
        if (len < 0 || i + 8 + len < i) return None
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          channels = le16(b, i + 10)
          sampleRate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
        } else if (id == "data") dataLen = len.toLong & 0xffffffffL
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (sampleRate <= 0 || channels <= 0 || byteRate <= 0 || dataLen < 0) None
      else Some((sampleRate, channels, dataLen * 1000L / byteRate))
    }

    /** Structurally valid 16-bit PCM WAV whose data chunk is `payload`:
      * 44 + payload.length bytes (+1 pad byte if the payload length is
      * odd — RIFF chunks are word-aligned). */
    def synthWav(sampleRate: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val pad = payload.length & 1
      tag("RIFF"); w32(36 + payload.length + pad); tag("WAVE")
      tag("fmt "); w32(16)
      w16(1) // PCM
      w16(channels)
      w32(sampleRate)
      w32(sampleRate * channels * 2) // byte rate, 16-bit samples
      w16(channels * 2) // block align
      w16(16) // bits per sample
      tag("data"); w32(payload.length)
      out.write(payload)
      if (pad == 1) out.write(0)
      out.toByteArray
    }

    /** Extract the `data` chunk contents (the PCM payload) by the same
      * RIFF chunk walk as [[decode]] — the declared chunk length, so the
      * word-alignment pad byte never leaks into the payload. */
    def extractData(b: Array[Byte]): Option[Array[Byte]] = {
      if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
          !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var i = 12
      while (i + 8 <= b.length) {
        val tpe = new String(b, i, 4, "US-ASCII")
        val len = le32(b, i + 4)
        if (len < 0) return None // corrupt length: no progress, no negative copy
        if (tpe == "data" && i + 8 + len <= b.length)
          return Some(java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len))
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      None
    }
  }

  /** REAL sample-level WAV codec — the audio analog of [[ImagePixels]],
    * retiring the payload-as-luma boundary for PCM audio: two WAVs
    * carrying the SAME samples in different container layouts (mono vs
    * channel-replicated stereo, extra LIST/INFO chunks before `data`)
    * have different BYTES but decode to the same mono sample sequence,
    * so perceptual audio dedup must hash samples, not container bytes —
    * pinned by MultimodalSpec-style fixtures and the `p_dedup_audio_px`
    * contract query.
    *
    * Decoder scope (documented contract): WAVE_FORMAT_PCM (format tag 1)
    * at 16, 8, or 24 bits, WAVE_FORMAT_IEEE_FLOAT (format tag 3) at 32
    * bits, ≥1 channel, and a `data` chunk that is a whole number of
    * frames — a data length that is NOT a multiple of the block align is
    * not valid PCM and returns None (the container-payload walk remains
    * the declared boundary for such files). Channels fold to mono by
    * exact per-frame mean (floor division — replayable;
    * channel-replicated fixtures make it exact by construction). */
  object AudioSamples {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** Decode a PCM WAV to mono ~16-bit-range samples (per-frame
      * channel mean, floor division). Sample formats: integer PCM at
      * 16 bits (sign-extended little-endian), 8 bits (unsigned, mapped
      * to full scale as `(u − 128)·257` — a positive affine map, so the
      * affine-invariant dHash pairs an 8-bit re-encode with its 16-bit
      * original exactly; note this map's range is [−32896, 32639],
      * one 257-step WIDER than int16 on the negative side — callers
      * re-encoding decoded samples as 16-bit must clamp), 24 bits
      * (s24le, arithmetic-shift floor by 256 — a sample stored as
      * `s·256` recovers exactly), and IEEE float32
      * (WAVE_FORMAT_IEEE_FLOAT, scaled by `round(f·32768)` and
      * clamped — a PCM16 sample stored as `s/32768f` round-trips
      * bit-exactly: the numerator is ≤ 2¹⁵ so it is exact in a 24-bit
      * mantissa and the power-of-two division and re-multiplication
      * are lossless). None when the bytes are outside the supported
      * scope — never a wrong answer. */
    def decodePcm(b: Array[Byte]): Option[Array[Int]] = {
      if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
          !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var fmt = 0; var bits = 0; var channels = 0
      var dataOff = -1; var dataLen = -1
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = le32(b, i + 4)
        if (len < 0 || i + 8 + len < i) return None
        if (id == "fmt " && len >= 16 && i + 8 + 16 <= b.length) {
          fmt = le16(b, i + 8)
          channels = le16(b, i + 10)
          bits = le16(b, i + 22)
        } else if (id == "data" && dataOff < 0 && i + 8 + len <= b.length) {
          dataOff = i + 8; dataLen = len
        }
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      val fmtOk = channels >= 1 &&
        ((fmt == 1 && (bits == 16 || bits == 8 || bits == 24)) ||
          (fmt == 3 && bits == 32))
      if (!fmtOk || dataOff < 0) return None
      val bytesPer = bits / 8
      val blockAlign = channels * bytesPer
      if (dataLen % blockAlign != 0) return None
      val nFrames = dataLen / blockAlign
      val mode = if (fmt == 3) 3 else if (bits == 8) 1 else if (bits == 24) 2 else 0
      val out = new Array[Int](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0L
        var c = 0
        while (c < channels) {
          val off = dataOff + f * blockAlign + c * bytesPer
          acc += (mode match {
            case 0 => le16(b, off).toShort.toInt // sign-extend LE 16-bit
            case 1 => ((b(off) & 0xff) - 128) * 257 // unsigned byte → full scale
            case 2 => // s24le: sign-extend, then floor to the 16-bit range
              val v24 = ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
                ((b(off + 2) & 0xff) << 16)) << 8 >> 8
              v24 >> 8 // arithmetic shift = floor division by 256
            case _ => // IEEE float32: scale + clamp; NaN rounds to 0
              val fv = java.lang.Float.intBitsToFloat(le32(b, off))
              math.max(-32768, math.min(32767, math.round(fv * 32768f)))
          }).toLong
          c += 1
        }
        out(f) = Math.floorDiv(acc, channels).toInt
        f += 1
      }
      Some(out)
    }

    /** Pre-generalization name — 16-bit PCM callers read better at the
      * call site through the scoped alias. */
    @inline def decodePcm16(b: Array[Byte]): Option[Array[Int]] = decodePcm(b)

    /** REAL sample-rate downsample: decimation by integer factor `k`,
      * each output sample the floor MEAN (Math.floorDiv — matches
      * external floor-division semantics on negative sums) of its
      * k-sample window, the tail window partial. The audio analog of
      * [[ImagePixels.boxDownsample]] — pure integer arithmetic,
      * externally replayable sample-for-sample. */
    def decimate(samples: Array[Int], k: Int): Array[Int] = {
      require(k >= 1, "decimation factor must be >= 1")
      if (k == 1) return samples
      val n = samples.length
      val out = new Array[Int]((n + k - 1) / k)
      var i = 0
      while (i < out.length) {
        val lo = i * k; val hi = math.min(n, lo + k)
        var acc = 0L
        var j = lo
        while (j < hi) { acc += samples(j); j += 1 }
        out(i) = Math.floorDiv(acc, (hi - lo).toLong).toInt
        i += 1
      }
      out
    }

    /** Structurally valid PCM16 WAV carrying `samples` replicated across
      * `channels` (so the decoder's mono mixdown is exact); `junk = true`
      * inserts a LIST/INFO chunk between `fmt ` and `data` — byte-level
      * layout changes that a correct chunk walk must be invariant to. */
    def synthPcmWav(
        rate: Int, channels: Int, samples: Array[Int], junk: Boolean = false): Array[Byte] = {
      require(rate > 0 && channels >= 1, "rate and channels must be positive")
      // `s & 0xffff` below would silently WRAP out-of-range ints (e.g. the
      // -32896 floor of decodePcm's 8-bit map would re-encode as +32640) —
      // fail fast instead so a decode→re-encode chain can never wrap peaks
      require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue),
        "PCM16 samples must be in [-32768, 32767] — clamp before re-encoding")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      // LIST body = 'INFO' (4) + ICMT header (8) + 'gen0' body (4) = 16
      val junkBytes = if (junk) 8 + 16 else 0
      val dataLen = samples.length * 2 * channels
      tag("RIFF"); w32(36 + junkBytes + dataLen); tag("WAVE")
      tag("fmt "); w32(16)
      w16(1) // PCM
      w16(channels)
      w32(rate)
      w32(rate * channels * 2) // byte rate
      w16(channels * 2) // block align
      w16(16) // bits per sample
      if (junk) { tag("LIST"); w32(16); tag("INFO"); tag("ICMT"); w32(4); tag("gen0") }
      tag("data"); w32(dataLen)
      samples.foreach { s =>
        var c = 0
        while (c < channels) { w16(s & 0xffff); c += 1 }
      }
      out.toByteArray
    }

    /** Structurally valid 8-bit PCM WAV (`samples8` unsigned 0–255,
      * replicated across channels) — decodes through the `(u − 128)·257`
      * full-scale map of [[decodePcm]]. */
    def synthPcm8Wav(
        rate: Int, channels: Int, samples8: Array[Int], junk: Boolean = false): Array[Byte] = {
      require(rate > 0 && channels >= 1, "rate and channels must be positive")
      require(samples8.forall(s => s >= 0 && s <= 255), "8-bit samples are 0-255")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val junkBytes = if (junk) 8 + 16 else 0
      val dataLen = samples8.length * channels
      tag("RIFF"); w32(36 + junkBytes + dataLen); tag("WAVE")
      tag("fmt "); w32(16)
      w16(1); w16(channels); w32(rate)
      w32(rate * channels) // byte rate
      w16(channels) // block align
      w16(8) // bits per sample
      if (junk) { tag("LIST"); w32(16); tag("INFO"); tag("ICMT"); w32(4); tag("gen0") }
      tag("data"); w32(dataLen)
      samples8.foreach { s =>
        var c = 0
        while (c < channels) { out.write(s & 0xff); c += 1 }
      }
      out.toByteArray
    }

    /** Structurally valid 24-bit PCM WAV (s24le; `samples` are 16-bit-
      * range ints stored as `s·256`, replicated across channels) — the
      * arithmetic-shift decode of [[decodePcm]] recovers them exactly. */
    def synthPcm24Wav(
        rate: Int, channels: Int, samples: Array[Int], junk: Boolean = false): Array[Byte] = {
      require(rate > 0 && channels >= 1, "rate and channels must be positive")
      // `s << 8` truncated to 3 bytes wraps outside int16 range — same
      // fail-fast contract as synthPcmWav
      require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue),
        "PCM24 samples must be in [-32768, 32767] — clamp before re-encoding")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val junkBytes = if (junk) 8 + 16 else 0
      val dataLen = samples.length * 3 * channels
      tag("RIFF"); w32(36 + junkBytes + dataLen); tag("WAVE")
      tag("fmt "); w32(16)
      w16(1); w16(channels); w32(rate)
      w32(rate * channels * 3) // byte rate
      w16(channels * 3) // block align
      w16(24) // bits per sample
      if (junk) { tag("LIST"); w32(16); tag("INFO"); tag("ICMT"); w32(4); tag("gen0") }
      tag("data"); w32(dataLen)
      samples.foreach { s =>
        val v = s << 8
        var c = 0
        while (c < channels) {
          out.write(v & 0xff); out.write((v >>> 8) & 0xff); out.write((v >>> 16) & 0xff)
          c += 1
        }
      }
      // chunk word alignment when the data length is odd
      if (dataLen % 2 == 1) out.write(0)
      out.toByteArray
    }

    /** Structurally valid IEEE-float32 WAV (WAVE_FORMAT_IEEE_FLOAT,
      * audio format 3; `samples` are 16-bit-range ints stored as
      * `s/32768f`, replicated across channels) — the float round-trip
      * of [[decodePcm]] recovers them bit-exactly. */
    def synthFloatWav(
        rate: Int, channels: Int, samples: Array[Int], junk: Boolean = false): Array[Byte] = {
      require(rate > 0 && channels >= 1, "rate and channels must be positive")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val junkBytes = if (junk) 8 + 16 else 0
      val dataLen = samples.length * 4 * channels
      tag("RIFF"); w32(36 + junkBytes + dataLen); tag("WAVE")
      tag("fmt "); w32(16)
      w16(3) // IEEE float
      w16(channels); w32(rate)
      w32(rate * channels * 4) // byte rate
      w16(channels * 4) // block align
      w16(32) // bits per sample
      if (junk) { tag("LIST"); w32(16); tag("INFO"); tag("ICMT"); w32(4); tag("gen0") }
      tag("data"); w32(dataLen)
      samples.foreach { s =>
        val fb = java.lang.Float.floatToIntBits(s / 32768f)
        var c = 0
        while (c < channels) { w32(fb); c += 1 }
      }
      out.toByteArray
    }
  }

  /** Minimal real decoder/encoder for the canonical video container —
    * AVI/RIFF (public format, documented in the Microsoft multimedia file
    * format specs): 12-byte RIFF/`AVI ` header, then a `LIST hdrl` whose
    * `avih` chunk carries µs-per-frame at data offset 0, total frames at
    * 16, width at 32 and height at 36 (all little-endian 32-bit). Frame
    * count, dimensions and duration are derived from those BYTES — same
    * standard as [[ImageHeader]]/[[AudioHeader]], no metadata echo. */
  object VideoHeader {
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** (width, height, totalFrames, durationMs) from AVI bytes; None if
      * the container doesn't parse. Walks top-level chunks and the hdrl
      * sub-chunks with the same malformed-length guards as WAV. */
    def decode(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (b.length < 12 ||
        new String(b.slice(0, 4), "US-ASCII") != "RIFF" ||
        new String(b.slice(8, 12), "US-ASCII") != "AVI ") return None
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b.slice(i, i + 4), "US-ASCII")
        val len = le32(b, i + 4)
        if (len < 0 || i + 8 + len < i) return None
        if (id == "LIST" && i + 12 <= b.length &&
          new String(b.slice(i + 8, i + 12), "US-ASCII") == "hdrl") {
          // walk hdrl sub-chunks to avih
          var j = i + 12
          val end = math.min(b.length, i + 8 + len)
          while (j + 8 <= end) {
            val sid = new String(b.slice(j, j + 4), "US-ASCII")
            val slen = le32(b, j + 4)
            if (slen < 0 || j + 8 + slen < j) return None
            if (sid == "avih" && slen >= 40 && j + 8 + 40 <= b.length) {
              val usPerFrame = le32(b, j + 8).toLong & 0xffffffffL
              val frames = le32(b, j + 24)
              val w = le32(b, j + 40)
              val h = le32(b, j + 44)
              if (usPerFrame <= 0 || frames < 0 || w <= 0 || h <= 0) return None
              return Some((w, h, frames, frames.toLong * usPerFrame / 1000L))
            }
            j += 8 + slen + (slen & 1)
          }
          return None // hdrl without avih is malformed
        }
        i += 8 + len + (len & 1)
      }
      None
    }

    /** Structurally valid AVI: RIFF header + `LIST hdrl` with a 56-byte
      * `avih` + `LIST movi` whose single `00db` chunk is `payload`.
      * 108 + payload.length bytes (+1 pad if the payload length is odd). */
    def synthAvi(w: Int, h: Int, frames: Int, usPerFrame: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
      }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val pad = payload.length & 1
      val moviLen = 4 + 8 + payload.length + pad
      tag("RIFF"); w32(4 + (8 + 68) + (8 + moviLen)); tag("AVI ")
      tag("LIST"); w32(68); tag("hdrl")
      tag("avih"); w32(56)
      w32(usPerFrame)           // dwMicroSecPerFrame
      w32(0); w32(0); w32(0)    // dwMaxBytesPerSec, dwPaddingGranularity, dwFlags
      w32(frames)               // dwTotalFrames
      w32(0); w32(1)            // dwInitialFrames, dwStreams
      w32(0)                    // dwSuggestedBufferSize
      w32(w); w32(h)            // dwWidth, dwHeight
      w32(0); w32(0); w32(0); w32(0) // dwReserved[4]
      tag("LIST"); w32(moviLen); tag("movi")
      tag("00db"); w32(payload.length)
      out.write(payload)
      if (pad == 1) out.write(0)
      out.toByteArray
    }

    /** Extract the first `00db` frame payload by walking RIFF LISTs to
      * `movi` — the same chunk structure [[decode]] parses; declared
      * lengths, so the word-align pad never leaks in. */
    def extractFrame(b: Array[Byte]): Option[Array[Byte]] = {
      if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
          !(b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
      var i = 12
      while (i + 8 <= b.length) {
        val tpe = new String(b, i, 4, "US-ASCII")
        val len = le32(b, i + 4)
        if (len < 0) return None // corrupt length: the walk must progress
        if (tpe == "LIST" && i + 12 <= b.length &&
            new String(b, i + 8, 4, "US-ASCII") == "movi") {
          var j = i + 12
          val end = math.min(b.length, i + 8 + len)
          while (j + 8 <= end) {
            val ct = new String(b, j, 4, "US-ASCII")
            val cl = le32(b, j + 4)
            if (cl < 0) return None // corrupt length: no progress, no negative copy
            if (ct == "00db" && j + 8 + cl <= end)
              return Some(java.util.Arrays.copyOfRange(b, j + 8, j + 8 + cl))
            j += 8 + cl + (cl & 1)
          }
          return None
        }
        i += 8 + len + (len & 1)
      }
      None
    }
  }

  /** REAL frame-level AVI codec — the video analog of [[ImagePixels]] /
    * [[AudioSamples]], retiring the payload-as-luma boundary for
    * uncompressed video: two AVIs carrying the SAME BGR24 DIB frames in
    * different container layouts (a JUNK chunk between `hdrl` and
    * `movi`, an `idx1` index appended, a different
    * dwSuggestedBufferSize hint) have different BYTES but decode to the
    * same pixel sequence, so perceptual video dedup must hash decoded
    * frames, not container bytes — pinned by the PipelineSpec fixture
    * and the `p_dedup_video_px` contract query.
    *
    * Decoder scope (documented contract): a `LIST strl` whose `strf` is
    * a 40-byte BITMAPINFOHEADER with biCompression = BI_RGB (0) and
    * biBitCount = 24, positive bottom-up biHeight, and every `00db`
    * movi chunk exactly one frame (rowBytes·h with rows padded to 4
    * bytes). Anything else returns None and the container-payload walk
    * remains the declared boundary (the legacy header-only AVIs carry
    * no `strl` at all, so they keep their old hash). */
  object VideoFrames {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    /** Same integer BT.601 floor-div luma as [[ImagePixels]] — exact,
      * and the identity on gray (r = g = b) pixels. */
    private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

    /** Decode an uncompressed-DIB AVI to (width, height, per-pixel SUMS
      * of frame luma in top-down row-major order, frame count). The
      * temporal sum is what the perceptual hash needs: cell-mean
      * comparisons divide every cell by the same frame count, so the
      * sums compare exactly like the means. None when the bytes are
      * outside the supported scope — never a wrong answer. */
    def decodeDibLumaSums(b: Array[Byte]): Option[(Int, Int, Array[Int], Int)] = {
      if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
          !(b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
      var w = 0; var h = 0; var fmtOk = false
      var moviOff = -1; var moviEnd = -1
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = le32(b, i + 4)
        if (len < 0 || i + 8 + len < i) return None
        if (id == "LIST" && i + 12 <= b.length) {
          val listType = new String(b, i + 8, 4, "US-ASCII")
          val end = math.min(b.length, i + 8 + len)
          if (listType == "hdrl") {
            // walk hdrl for the LIST strl carrying strh/strf
            var j = i + 12
            while (j + 8 <= end) {
              val sid = new String(b, j, 4, "US-ASCII")
              val slen = le32(b, j + 4)
              if (slen < 0 || j + 8 + slen < j) return None
              if (sid == "LIST" && j + 12 <= end &&
                  new String(b, j + 8, 4, "US-ASCII") == "strl") {
                var k = j + 12
                val send = math.min(end, j + 8 + slen)
                while (k + 8 <= send) {
                  val tid = new String(b, k, 4, "US-ASCII")
                  val tlen = le32(b, k + 4)
                  if (tlen < 0 || k + 8 + tlen < k) return None
                  if (tid == "strf" && tlen >= 40 && k + 8 + 40 <= b.length) {
                    // BITMAPINFOHEADER: width, height, planes, bitcount,
                    // compression — the uncompressed-RGB contract
                    w = le32(b, k + 12)
                    h = le32(b, k + 16)
                    val bitCount = le16(b, k + 22)
                    val compression = le32(b, k + 24)
                    fmtOk = w > 0 && h > 0 && bitCount == 24 && compression == 0
                  }
                  k += 8 + tlen + (tlen & 1)
                }
              }
              j += 8 + slen + (slen & 1)
            }
          } else if (listType == "movi" && moviOff < 0) {
            moviOff = i + 12; moviEnd = end
          }
        }
        i += 8 + len + (len & 1)
      }
      if (!fmtOk || moviOff < 0) return None
      // untrusted-dims guard (see MaxDecodePixels); the frame cap keeps
      // the Int per-pixel SUMS exact (255 · 127 frames < 2^15)
      if (w.toLong * h > MaxDecodePixels) return None
      val rowBytes = (w * 3 + 3) & ~3
      val frameBytes = rowBytes * h
      val sums = new Array[Int](w * h)
      var frames = 0
      var j = moviOff
      while (j + 8 <= moviEnd) {
        val ct = new String(b, j, 4, "US-ASCII")
        val cl = le32(b, j + 4)
        if (cl < 0 || j + 8 + cl < j) return None
        if (ct == "00db") {
          if (cl != frameBytes || j + 8 + cl > moviEnd || frames >= 127) return None
          // DIB rows are bottom-up: buffer row r is image row h-1-r
          var r = 0
          while (r < h) {
            val y = h - 1 - r
            val rowOff = j + 8 + r * rowBytes
            var x = 0
            while (x < w) {
              val o = rowOff + x * 3 // B, G, R
              sums(y * w + x) +=
                luma(b(o + 2) & 0xff, b(o + 1) & 0xff, b(o) & 0xff)
              x += 1
            }
            r += 1
          }
          frames += 1
        }
        j += 8 + cl + (cl & 1)
      }
      if (frames == 0) None else Some((w, h, sums, frames))
    }

    /** Structurally valid uncompressed-DIB AVI carrying `frames` (each a
      * top-down row-major gray field, values 0–255, written as
      * B = G = R so the decoder's BT.601 luma is the identity);
      * `junk = true` switches the container layout — a JUNK chunk
      * between `hdrl` and `movi`, an `idx1` index appended after
      * `movi`, and a different dwSuggestedBufferSize hint — byte-level
      * changes that a correct chunk walk must be invariant to. */
    def synthDibAvi(
        w: Int, h: Int, frames: Seq[Array[Int]], usPerFrame: Int,
        junk: Boolean = false): Array[Byte] = {
      require(w > 0 && h > 0 && frames.nonEmpty, "need positive dims and ≥1 frame")
      require(frames.forall(_.length == w * h), "each frame must be w*h pixels")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val rowBytes = (w * 3 + 3) & ~3
      val frameBytes = rowBytes * h
      val n = frames.length
      val strlLen = 4 + (8 + 56) + (8 + 40)         // 'strl' + strh + strf
      val hdrlLen = 4 + (8 + 56) + (8 + strlLen)    // 'hdrl' + avih + LIST strl
      val junkLen = if (junk) 8 + 12 else 0
      val moviLen = 4 + n * (8 + frameBytes)        // 'movi' + 00db chunks (frameBytes is 4-aligned)
      val idx1Len = if (junk) 8 + n * 16 else 0
      tag("RIFF"); w32(4 + (8 + hdrlLen) + junkLen + (8 + moviLen) + idx1Len); tag("AVI ")
      tag("LIST"); w32(hdrlLen); tag("hdrl")
      tag("avih"); w32(56)
      w32(usPerFrame); w32(0); w32(0); w32(0)
      w32(n)                                        // dwTotalFrames
      w32(0); w32(1)                                // dwInitialFrames, dwStreams
      w32(if (junk) frameBytes * 2 else frameBytes) // dwSuggestedBufferSize (layout-varied)
      w32(w); w32(h)
      w32(0); w32(0); w32(0); w32(0)
      tag("LIST"); w32(strlLen); tag("strl")
      tag("strh"); w32(56)
      tag("vids"); tag("DIB ")                      // fccType, fccHandler
      w32(0); w16(0); w16(0); w32(0)                // flags, priority, language, initialFrames
      w32(usPerFrame); w32(1000000)                 // scale, rate → fps = rate/scale
      w32(0); w32(n)                                // start, length
      w32(frameBytes); w32(0); w32(0)               // suggestedBufferSize, quality, sampleSize
      w16(0); w16(0); w16(w); w16(h)                // rcFrame
      tag("strf"); w32(40)
      w32(40); w32(w); w32(h)                       // biSize, biWidth, biHeight (bottom-up)
      w16(1); w16(24)                               // biPlanes, biBitCount
      w32(0); w32(frameBytes)                       // biCompression = BI_RGB, biSizeImage
      w32(0); w32(0); w32(0); w32(0)                // pels/meter, clrUsed, clrImportant
      if (junk) { tag("JUNK"); w32(12); tag("graftpad0000") }
      tag("LIST"); w32(moviLen); tag("movi")
      frames.foreach { f =>
        tag("00db"); w32(frameBytes)
        var r = 0
        while (r < h) {
          val y = h - 1 - r // bottom-up
          var x = 0
          while (x < w) {
            val v = f(y * w + x) & 0xff
            out.write(v); out.write(v); out.write(v) // B = G = R
            x += 1
          }
          var p = w * 3
          while (p < rowBytes) { out.write(0); p += 1 }
          r += 1
        }
      }
      if (junk) {
        tag("idx1"); w32(n * 16)
        var f = 0
        var off = 4 // offsets are relative to the start of the movi list type
        while (f < n) {
          tag("00db"); w32(0x10)                    // AVIIF_KEYFRAME
          w32(off); w32(frameBytes)
          off += 8 + frameBytes
          f += 1
        }
      }
      out.toByteArray
    }
  }

  /** REAL baseline JPEG decoder (ITU-T T.81 / ISO 10918-1, the public
    * JPEG standard) for grayscale images — the last container family to
    * get a decoded-content path. This is a genuine entropy decoder, not
    * a header walk: DQT/DHT/SOF0/DRI/SOS segment parse, canonical
    * Huffman table construction from the DHT counts, bit-level entropy
    * decode with 0xFF00 byte unstuffing, DC prediction with
    * restart-marker resets, AC run/size + ZRL + EOB decoding, zigzag →
    * natural reorder, dequantization, a full double-precision 2-D IDCT
    * (the textbook definition), +128 level shift, clamp, and edge-block
    * cropping for non-multiple-of-8 dims.
    *
    * Decoder scope (documented contract): baseline sequential SOF0,
    * 8-bit precision, exactly one component (grayscale), 1×1 sampling.
    * Progressive (SOF2), multi-component, and arithmetic-coded streams
    * return None — never a wrong answer — and fall back to the
    * COM-payload walk, so every legacy header-only JPEG keeps its old
    * hash. The perceptual-dedup fixture keeps its oracle exact by
    * encoding DC-only blocks against a flat q=8 table: the IDCT of a
    * DC-only block is mathematically flat at `dc·q/8`, which is an
    * exact integer (so double rounding is unambiguous) — pixel =
    * dc + 128 replays in SQL while the engine runs the full general
    * decode path. AC correctness is pinned separately in unit tests
    * against a naive IDCT reference. */
  object JpegGray {
    /** Zigzag scan order: ZigzagOrder(i) = natural index of the i-th
      * zigzag coefficient (T.81 figure 5). */
    private val ZigzagOrder: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** A Huffman table spec as DHT carries it: counts(i) = number of
      * codes of length i+1 (16 entries), symbols in code order. */
    final case class HuffSpec(counts: Array[Int], symbols: Array[Int]) {
      require(counts.length == 16 && counts.sum == symbols.length, "malformed huffman spec")
      /** Canonical code assignment (T.81 annex C): symbol → (code, len). */
      lazy val encodeTable: Map[Int, (Int, Int)] = {
        val out = scala.collection.mutable.Map[Int, (Int, Int)]()
        var code = 0; var k = 0
        var len = 1
        while (len <= 16) {
          var c = 0
          while (c < counts(len - 1)) {
            out(symbols(k)) = (code, len); code += 1; k += 1; c += 1
          }
          code <<= 1; len += 1
        }
        out.toMap
      }
      /** (len, code) → symbol, for the bit-serial decoder. */
      lazy val decodeTable: Map[(Int, Int), Int] =
        encodeTable.map { case (sym, (code, len)) => (len, code) -> sym }
    }

    /** The T.81 Annex K.3.1 luminance DC table — the table every
      * standard encoder ships, so decoding it is decoding real JPEGs. */
    val DcAnnexK: HuffSpec = HuffSpec(
      Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0), (0 to 11).toArray)
    /** A flat custom-but-valid DC table (twelve 4-bit codes; the
      * all-ones code stays unused per T.81 C.2) — same decoded values,
      * different bytes: the layout axis of the dedup fixture. */
    val DcFlat: HuffSpec = HuffSpec(
      Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), (0 to 11).toArray)
    /** Compact AC tables covering EOB, ZRL, and the run/size symbols the
      * tests exercise — valid DHT tables (Kraft < 1, no all-ones code). */
    val AcSmallA: HuffSpec = HuffSpec(
      Array(0, 1, 3, 3, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0x00, 0x01, 0x11, 0x02, 0x21, 0x31, 0x12, 0xF0, 0x22, 0x03))
    val AcSmallB: HuffSpec = HuffSpec(
      Array(0, 0, 3, 2, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0x00, 0x01, 0x11, 0x02, 0x21, 0x31, 0x12, 0xF0, 0x22, 0x03))
    /** AC tables for PROGRESSIVE scans: the EOBn run-length symbols
      * (r<<4, r = 0..14), ZRL, and every (run<<4)|size symbol for
      * sizes 1–3 — 64 symbols as 52 six-bit + 12 seven-bit canonical
      * codes (Kraft 52/64 + 12/128 < 1; the all-ones code at each
      * length stays unused per T.81 C.2). `AcProgB` carries the same
      * symbols in a different canonical order: same decoded values,
      * different codes — the progressive layout axis. */
    private val progAcSymbols: Array[Int] =
      (0 to 14).map(_ << 4).toArray ++ Array(0xF0) ++
        (0 to 15).map(r => (r << 4) | 1).toArray ++
        (0 to 15).map(r => (r << 4) | 2).toArray ++
        (0 to 15).map(r => (r << 4) | 3).toArray
    val AcProgA: HuffSpec = HuffSpec(
      Array(0, 0, 0, 0, 0, 52, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0), progAcSymbols)
    val AcProgB: HuffSpec = HuffSpec(
      Array(0, 0, 0, 0, 0, 52, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0), progAcSymbols.reverse)

    /** Bit category of a coefficient value (T.81 F.1.2.1.1): the number
      * of bits needed for |v|, 0 for 0. */
    private def category(v: Int): Int = {
      var t = 0; var a = math.abs(v)
      while (a != 0) { t += 1; a >>= 1 }
      t
    }

    /** Encode a baseline grayscale JPEG from ZIGZAG-ordered QUANTIZED
      * coefficient blocks (raster block order, 64 ints each; index 0 is
      * the DC). `qZigzag` is the quant table in zigzag order as DQT
      * carries it. `restartInterval > 0` emits DRI + RSTn markers every
      * that many MCUs (predictor resets, byte alignment). `comment`
      * varies the byte layout without touching pixels. */
    def synthBaselineJpeg(
        w: Int, h: Int, blocks: Seq[Array[Int]], qZigzag: Array[Int],
        dcTable: HuffSpec, acTable: HuffSpec, restartInterval: Int,
        comment: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "jpeg dims are 16-bit")
      require(qZigzag.length == 64 && qZigzag.forall(q => q >= 1 && q <= 255), "8-bit quant table")
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      require(blocks.length == bw * bh, s"need $bw*$bh blocks")
      require(blocks.forall(_.length == 64), "blocks are 64 zigzag coefficients")
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def seg(marker: Int, body: Int*): Unit = {
        b(0xff, marker, (body.length + 2) >>> 8, body.length + 2); body.foreach(v => out.write(v & 0xff))
      }
      b(0xff, 0xd8) // SOI
      seg(0xe0, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0) // APP0 JFIF
      seg(0xfe, comment.map(_.toInt): _*)                          // COM (layout axis)
      seg(0xdb, 0x00 +: qZigzag.toSeq: _*)                         // DQT, Pq=0 Tq=0
      seg(0xc0, 8, h >>> 8, h, w >>> 8, w, 1, 1, 0x11, 0)          // SOF0: 1 comp, 1x1, Tq 0
      seg(0xc4, 0x00 +: (dcTable.counts ++ dcTable.symbols).toSeq: _*) // DHT DC 0
      seg(0xc4, 0x10 +: (acTable.counts ++ acTable.symbols).toSeq: _*) // DHT AC 0
      if (restartInterval > 0) seg(0xdd, restartInterval >>> 8, restartInterval)
      seg(0xda, 1, 1, 0x00, 0, 63, 0)                              // SOS: comp 1, Td=0 Ta=0
      // entropy-coded data: MSB-first bit writer with 0xFF00 stuffing
      var acc = 0; var nbits = 0
      def flushByte(): Unit = {
        out.write(acc); if (acc == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
      def putBits(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >>> i) & 1); nbits += 1
          if (nbits == 8) flushByte()
          i -= 1
        }
      }
      def align(): Unit = if (nbits > 0) { putBits((1 << (8 - nbits)) - 1, 8 - nbits) }
      def putCoef(table: HuffSpec, sym: Int, v: Int, t: Int): Unit = {
        val (code, len) = table.encodeTable(sym)
        putBits(code, len)
        if (t > 0) putBits(if (v < 0) v + (1 << t) - 1 else v, t)
      }
      var pred = 0
      var rst = 0
      blocks.zipWithIndex.foreach { case (zz, mcu) =>
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          align(); b(0xff, 0xd0 + rst); rst = (rst + 1) % 8; pred = 0
        }
        val diff = zz(0) - pred; pred = zz(0)
        val t = category(diff)
        putCoef(dcTable, t, diff, t)
        // AC: run/size with ZRL for 16-zero runs, EOB when the tail is zero
        var k = 1
        var lastNz = 63
        while (lastNz >= 1 && zz(lastNz) == 0) lastNz -= 1
        while (k <= lastNz) {
          var run = 0
          while (zz(k) == 0) { run += 1; k += 1 }
          while (run >= 16) { putCoef(acTable, 0xF0, 0, 0); run -= 16 }
          val s = category(zz(k))
          putCoef(acTable, (run << 4) | s, zz(k), s)
          k += 1
        }
        if (lastNz < 63) putCoef(acTable, 0x00, 0, 0) // EOB
      }
      align()
      b(0xff, 0xd9) // EOI
      out.toByteArray
    }

    /** Encode a baseline YCbCr JPEG from ZIGZAG-ordered QUANTIZED
      * coefficient blocks. Luma samples at `hSamp`×`vSamp` (1–2 each:
      * 1×1 = 4:4:4, 2×1 = 4:2:2, 2×2 = 4:2:0), chroma at 1×1, so one
      * MCU carries hSamp·vSamp Y blocks + 1 Cb + 1 Cr. `yBlocks` is the
      * MCU-PADDED luma plane in raster block order
      * ((mcusX·hSamp)×(mcusY·vSamp) blocks); `cbBlocks`/`crBlocks` are
      * the mcusX×mcusY chroma planes. Luma reads quant table 0 and
      * Huffman ids 0; chroma reads quant table 1 and Huffman ids 1 —
      * the layout every standard encoder emits, so decoding it is
      * decoding real color JPEGs. */
    def synthBaselineJpegColor(
        w: Int, h: Int, hSamp: Int, vSamp: Int,
        yBlocks: Seq[Array[Int]], cbBlocks: Seq[Array[Int]], crBlocks: Seq[Array[Int]],
        qLumaZigzag: Array[Int], qChromaZigzag: Array[Int],
        dcLuma: HuffSpec, acLuma: HuffSpec, dcChroma: HuffSpec, acChroma: HuffSpec,
        restartInterval: Int, comment: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "jpeg dims are 16-bit")
      require(hSamp >= 1 && hSamp <= 2 && vSamp >= 1 && vSamp <= 2, "luma sampling 1-2")
      require(qLumaZigzag.length == 64 && qChromaZigzag.length == 64 &&
        (qLumaZigzag ++ qChromaZigzag).forall(q => q >= 1 && q <= 255), "8-bit quant tables")
      val mcusX = (w + 8 * hSamp - 1) / (8 * hSamp)
      val mcusY = (h + 8 * vSamp - 1) / (8 * vSamp)
      require(yBlocks.length == mcusX * hSamp * mcusY * vSamp,
        s"need ${mcusX * hSamp}*${mcusY * vSamp} luma blocks")
      require(cbBlocks.length == mcusX * mcusY && crBlocks.length == mcusX * mcusY,
        s"need $mcusX*$mcusY chroma blocks per plane")
      require((yBlocks ++ cbBlocks ++ crBlocks).forall(_.length == 64),
        "blocks are 64 zigzag coefficients")
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def seg(marker: Int, body: Int*): Unit = {
        b(0xff, marker, (body.length + 2) >>> 8, body.length + 2); body.foreach(v => out.write(v & 0xff))
      }
      b(0xff, 0xd8) // SOI
      seg(0xe0, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0) // APP0 JFIF
      seg(0xfe, comment.map(_.toInt): _*)                          // COM (layout axis)
      seg(0xdb, 0x00 +: qLumaZigzag.toSeq: _*)                     // DQT Tq=0 (luma)
      seg(0xdb, 0x01 +: qChromaZigzag.toSeq: _*)                   // DQT Tq=1 (chroma)
      seg(0xc0, 8, h >>> 8, h, w >>> 8, w, 3,                      // SOF0: 3 comps
        1, (hSamp << 4) | vSamp, 0,                                //  Y: sampling, Tq 0
        2, 0x11, 1,                                                //  Cb: 1x1, Tq 1
        3, 0x11, 1)                                                //  Cr: 1x1, Tq 1
      seg(0xc4, 0x00 +: (dcLuma.counts ++ dcLuma.symbols).toSeq: _*)     // DHT DC 0
      seg(0xc4, 0x10 +: (acLuma.counts ++ acLuma.symbols).toSeq: _*)     // DHT AC 0
      seg(0xc4, 0x01 +: (dcChroma.counts ++ dcChroma.symbols).toSeq: _*) // DHT DC 1
      seg(0xc4, 0x11 +: (acChroma.counts ++ acChroma.symbols).toSeq: _*) // DHT AC 1
      if (restartInterval > 0) seg(0xdd, restartInterval >>> 8, restartInterval)
      seg(0xda, 3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0) // SOS: Y→tables 0, chroma→1
      // entropy-coded data: MSB-first bit writer with 0xFF00 stuffing
      var acc = 0; var nbits = 0
      def flushByte(): Unit = {
        out.write(acc); if (acc == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
      def putBits(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >>> i) & 1); nbits += 1
          if (nbits == 8) flushByte()
          i -= 1
        }
      }
      def align(): Unit = if (nbits > 0) { putBits((1 << (8 - nbits)) - 1, 8 - nbits) }
      def putCoef(table: HuffSpec, sym: Int, v: Int, t: Int): Unit = {
        val (code, len) = table.encodeTable(sym)
        putBits(code, len)
        if (t > 0) putBits(if (v < 0) v + (1 << t) - 1 else v, t)
      }
      val preds = new Array[Int](3)
      def putBlock(zz: Array[Int], c: Int, dc: HuffSpec, ac: HuffSpec): Unit = {
        val diff = zz(0) - preds(c); preds(c) = zz(0)
        val t = category(diff)
        putCoef(dc, t, diff, t)
        var k = 1
        var lastNz = 63
        while (lastNz >= 1 && zz(lastNz) == 0) lastNz -= 1
        while (k <= lastNz) {
          var run = 0
          while (zz(k) == 0) { run += 1; k += 1 }
          while (run >= 16) { putCoef(ac, 0xF0, 0, 0); run -= 16 }
          val s = category(zz(k))
          putCoef(ac, (run << 4) | s, zz(k), s)
          k += 1
        }
        if (lastNz < 63) putCoef(ac, 0x00, 0, 0) // EOB
      }
      val bwY = mcusX * hSamp
      var rst = 0
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          align(); b(0xff, 0xd0 + rst); rst = (rst + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        var v = 0
        while (v < vSamp) {
          var hx = 0
          while (hx < hSamp) {
            putBlock(yBlocks((my * vSamp + v) * bwY + mx * hSamp + hx), 0, dcLuma, acLuma)
            hx += 1
          }
          v += 1
        }
        putBlock(cbBlocks(my * mcusX + mx), 1, dcChroma, acChroma)
        putBlock(crBlocks(my * mcusX + mx), 2, dcChroma, acChroma)
        mcu += 1
      }
      align()
      b(0xff, 0xd9) // EOI
      out.toByteArray
    }

    private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    /** JFIF YCbCr → RGB → BT.601 luma, as ONE exact integer function:
      * `R = clamp(Y + ⌊1402·(Cr−128)/1000⌋)`,
      * `G = clamp(Y − ⌊(344136·(Cb−128) + 714136·(Cr−128))/10⁶⌋)`,
      * `B = clamp(Y + ⌊1772·(Cb−128)/1000⌋)`, then
      * `(299R + 587G + 114B)/1000`. Floor divisions (`Math.floorDiv`,
      * not truncation) so every step replays exactly in an external
      * engine — the p_dedup_jpeg_color oracle recomputes this
      * arithmetic in SQL. Neutral chroma (128, 128) is the identity:
      * the correction terms are exactly 0, so a color JPEG with flat
      * neutral chroma decodes to its Y plane. */
    def ycbcrLuma(yy: Int, cb: Int, cr: Int): Int = {
      val cbd = cb - 128; val crd = cr - 128
      val r = clamp8(yy + Math.floorDiv(1402 * crd, 1000))
      val g = clamp8(yy - Math.floorDiv(344136 * cbd + 714136 * crd, 1000000))
      val bb = clamp8(yy + Math.floorDiv(1772 * cbd, 1000))
      (299 * r + 587 * g + 114 * bb) / 1000
    }

    /** Decode a JPEG to (width, height, row-major luma).
      * Scope: sequential baseline (SOF0) AND progressive (SOF2)
      * Huffman 8-bit frames, ONE or THREE components. Grayscale
      * decodes the single plane; YCbCr decodes all component planes
      * (luma sampling factors 1–2 on each axis, chroma 1×1 — covering
      * 4:4:4, 4:2:2, 4:4:0 and 4:2:0), upsamples chroma by sample
      * replication, and composes luma via [[ycbcrLuma]]. Progressive
      * frames decode the full scan sequence — spectral selection AND
      * successive approximation, DC and AC first/refinement passes,
      * EOB-run coding, per-scan restart intervals. None when the bytes
      * are outside this scope (arithmetic coding, 12-bit, hierarchical,
      * exotic sampling). */
    def decodeJpegLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      // dispatch on the frame type: one cheap segment walk to the SOF
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var i = 2
      var sof = -1
      while (sof < 0) {
        if (i + 2 > b.length || (b(i) & 0xff) != 0xff) return None
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // 0xFF fill byte before a marker (T.81 B.1.1.2)
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // TEM/RSTn: standalone
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) sof = m
        else if (m == 0xda || m == 0xd9) return None // scan/EOI before any SOF
        else {
          if (i + 4 > b.length) return None
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) return None
          i += 2 + len
        }
      }
      sof match {
        case 0xc0 => decodeBaselineLuma(b)
        case 0xc2 => decodeProgressiveLuma(b)
        case _ => None // extended/arithmetic/lossless/hierarchical
      }
    }

    private def decodeBaselineLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var w = 0; var h = 0
      val qTabs = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffSpec](4)
      val acTabs = new Array[HuffSpec](4)
      var compIds: Array[Int] = null   // component id as SOF carries it
      var compH: Array[Int] = null; var compV: Array[Int] = null
      var compTq: Array[Int] = null
      var compTd: Array[Int] = null; var compTa: Array[Int] = null
      var dri = 0
      var sos = -1
      var i = 2
      // ---- segment walk to SOS ----
      while (sos < 0) {
        if (i + 4 > b.length || (b(i) & 0xff) != 0xff) return None
        val m = b(i + 1) & 0xff
        // fill bytes and standalone markers (TEM/RSTn) carry no length:
        // consume and re-read rather than misparsing payload as a length
        if (m == 0xff) { i += 1 }
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
        else {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) return None
          val body = i + 4
          m match {
            case 0xc0 => // SOF0 baseline — the supported frame type
              if (len < 11 || (b(body) & 0xff) != 8) return None
              h = ((b(body + 1) & 0xff) << 8) | (b(body + 2) & 0xff)
              w = ((b(body + 3) & 0xff) << 8) | (b(body + 4) & 0xff)
              val ncomp = b(body + 5) & 0xff
              if (ncomp != 1 && ncomp != 3) return None
              if (len < 8 + 3 * ncomp) return None
              compIds = new Array[Int](ncomp)
              compH = new Array[Int](ncomp); compV = new Array[Int](ncomp)
              compTq = new Array[Int](ncomp)
              var c = 0
              while (c < ncomp) {
                compIds(c) = b(body + 6 + 3 * c) & 0xff
                val hv = b(body + 7 + 3 * c) & 0xff
                compH(c) = hv >>> 4; compV(c) = hv & 0x0f
                compTq(c) = b(body + 8 + 3 * c) & 0xff
                if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                    compTq(c) > 3) return None
                c += 1
              }
              // grayscale must be 1×1; color chroma must be 1×1 (the
              // standard subsamplings — luma carries the 2× factors)
              if (ncomp == 1 && (compH(0) != 1 || compV(0) != 1)) return None
              if (ncomp == 3 && (compH(1) != 1 || compV(1) != 1 ||
                  compH(2) != 1 || compV(2) != 1)) return None
            case mm if (mm >= 0xc1 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8) =>
              return None // progressive/extended/arithmetic — out of scope
            case 0xdb => // DQT (possibly several tables per segment)
              var p = body
              while (p < i + 2 + len) {
                if ((b(p) & 0xff) >>> 4 != 0) return None // 16-bit tables out of scope
                val tq = b(p) & 0x0f
                if (tq > 3 || p + 65 > i + 2 + len) return None
                qTabs(tq) = Array.tabulate(64)(j => b(p + 1 + j) & 0xff)
                p += 65
              }
            case 0xc4 => // DHT (possibly several tables per segment)
              var p = body
              while (p < i + 2 + len) {
                val tc = (b(p) & 0xff) >>> 4; val th = b(p) & 0x0f
                if (th > 3 || p + 17 > i + 2 + len) return None
                val counts = Array.tabulate(16)(j => b(p + 1 + j) & 0xff)
                val n = counts.sum
                if (p + 17 + n > i + 2 + len) return None
                val syms = Array.tabulate(n)(j => b(p + 17 + j) & 0xff)
                val spec = HuffSpec(counts, syms)
                if (tc == 0) dcTabs(th) = spec
                else if (tc == 1) acTabs(th) = spec
                else return None
                p += 17 + n
              }
            case 0xdd => // DRI
              if (len != 4) return None
              dri = ((b(body) & 0xff) << 8) | (b(body + 1) & 0xff)
            case 0xda => // SOS: component count must match the frame
              if (compIds == null) return None
              val ns = b(body) & 0xff
              if (ns != compIds.length || len < 6 + 2 * ns) return None
              compTd = new Array[Int](compIds.length)
              compTa = new Array[Int](compIds.length)
              var s = 0
              while (s < ns) {
                val cid = b(body + 1 + 2 * s) & 0xff
                val ci = compIds.indexOf(cid)
                if (ci < 0) return None
                val tt = b(body + 2 + 2 * s) & 0xff
                compTd(ci) = tt >>> 4; compTa(ci) = tt & 0x0f
                if (compTd(ci) > 3 || compTa(ci) > 3) return None
                s += 1
              }
              // a baseline scan carries the full spectral band with no
              // successive approximation: Ss=0, Se=63, Ah=0, Al=0 (T.81
              // B.2.3) — anything else is spec-invalid for SOF0, and
              // decoding it anyway would yield wrong luma, not None
              if ((b(body + 1 + 2 * ns) & 0xff) != 0 ||
                  (b(body + 2 + 2 * ns) & 0xff) != 63 ||
                  (b(body + 3 + 2 * ns) & 0xff) != 0) return None
              sos = i + 2 + len
            case _ => // APPn / COM / others: skip
          }
          i += 2 + len
        }
      }
      if (w <= 0 || h <= 0 || compIds == null || compTd == null) return None
      val ncomp = compIds.length
      // every referenced table must have arrived
      var c0 = 0
      while (c0 < ncomp) {
        if (qTabs(compTq(c0)) == null || dcTabs(compTd(c0)) == null ||
            acTabs(compTa(c0)) == null) return None
        c0 += 1
      }
      // untrusted-dims guard (see MaxDecodePixels): SOF0 dims are 16-bit
      // each, so w·h can reach 4.3e9 — cap before the pixel allocation
      if (w.toLong * h > MaxDecodePixels) return None
      val maxH = compH.max; val maxV = compV.max
      val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
      // MCU-padded per-component planes (pad ≤ 15 px per axis — bounded
      // by the w·h cap above with a small constant slack)
      val planeW = Array.tabulate(ncomp)(c => mcusX * compH(c) * 8)
      val planeH = Array.tabulate(ncomp)(c => mcusY * compV(c) * 8)
      var cc = 0
      while (cc < ncomp) {
        if (planeW(cc).toLong * planeH(cc) > MaxDecodePixels.toLong + (1L << 16))
          return None
        cc += 1
      }
      val planes = Array.tabulate(ncomp)(c => new Array[Int](planeW(c) * planeH(c)))
      val dcDec = Array.tabulate(ncomp)(c => dcTabs(compTd(c)).decodeTable)
      val acDec = Array.tabulate(ncomp)(c => acTabs(compTa(c)).decodeTable)

      // ---- entropy decode ----
      var pos = sos
      var acc = 0; var nbits = 0
      var hitMarker = false
      def nextBit(): Int = {
        if (nbits == 0) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val v = b(pos) & 0xff
          if (v == 0xff) {
            if (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0x00) { acc = 0xff; pos += 2 }
            else { hitMarker = true; return -1 } // a real marker: stop here
          } else { acc = v; pos += 1 }
          nbits = 8
        }
        nbits -= 1
        (acc >>> nbits) & 1
      }
      def decodeSym(tbl: Map[(Int, Int), Int]): Int = {
        var code = 0; var len = 0
        while (len < 16) {
          val bit = nextBit()
          if (bit < 0) return -1
          code = (code << 1) | bit; len += 1
          tbl.get((len, code)) match {
            case Some(sym) => return sym
            case None =>
          }
        }
        -1
      }
      def receive(t: Int): Int = {
        var v = 0; var k = 0
        while (k < t) {
          val bit = nextBit()
          if (bit < 0) return Int.MinValue
          v = (v << 1) | bit; k += 1
        }
        v
      }
      // T.81 F.2.2.1 EXTEND: low-category values are negative
      def extend(v: Int, t: Int): Int =
        if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

      val coef = new Array[Int](64)
      val pred = new Array[Int](ncomp)
      var rstExpect = 0
      var mcu = 0
      // decode one 8×8 block of component `c` into its plane at block
      // coordinates (bx, by); returns false on malformed entropy data
      def decodeBlock(c: Int, bx: Int, by: Int): Boolean = {
        val q = qTabs(compTq(c))
        java.util.Arrays.fill(coef, 0)
        val t = decodeSym(dcDec(c))
        if (t < 0 || t > 11) return false
        val dv = receive(t)
        if (dv == Int.MinValue) return false
        pred(c) += extend(dv, t)
        coef(0) = pred(c) * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val sym = decodeSym(acDec(c))
          if (sym < 0) return false
          if (sym == 0x00) eob = true
          else if (sym == 0xF0) k += 16 // ZRL: sixteen zeros
          else {
            k += sym >>> 4
            val s = sym & 0x0f
            if (s == 0 || k > 63) return false
            val av = receive(s)
            if (av == Int.MinValue) return false
            coef(k) = extend(av, s) * q(k)
            k += 1
          }
        }
        if (k > 64) return false
        // dezigzag + IDCT + level shift + clamp into the padded plane
        val f = new Array[Int](64)
        var z = 0
        while (z < 64) { f(ZigzagOrder(z)) = coef(z); z += 1 }
        val px = idct8x8(f)
        val pw = planeW(c)
        val plane = planes(c)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            plane((by * 8 + y) * pw + bx * 8 + x) = px(y * 8 + x)
            x += 1
          }
          y += 1
        }
        true
      }
      while (mcu < mcusX * mcusY) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          // byte-align and consume the RSTn marker; predictors reset
          nbits = 0
          if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
              (b(pos + 1) & 0xff) != 0xd0 + rstExpect) return None
          pos += 2; rstExpect = (rstExpect + 1) % 8
          java.util.Arrays.fill(pred, 0); hitMarker = false
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        // T.81 interleave: per component in SOF order, Vc×Hc blocks in
        // raster order within the MCU
        var c = 0
        while (c < ncomp) {
          var v = 0
          while (v < compV(c)) {
            var hx = 0
            while (hx < compH(c)) {
              if (!decodeBlock(c, mx * compH(c) + hx, my * compV(c) + v)) return None
              hx += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
      }
      Some((w, h, composeLuma(w, h, ncomp, compH, compV, maxH, maxV, planes, planeW)))
    }

    /** Crop + chroma replication upsample + (for color) [[ycbcrLuma]]:
      * the shared finish stage of the baseline and progressive decoders,
      * turning MCU-padded per-component pixel planes into the final
      * row-major luma. */
    private def composeLuma(
        w: Int, h: Int, ncomp: Int,
        compH: Array[Int], compV: Array[Int], maxH: Int, maxV: Int,
        planes: Array[Array[Int]], planeW: Array[Int]): Array[Int] = {
      val lum = new Array[Int](w * h)
      if (ncomp == 1) {
        val pw = planeW(0); val plane = planes(0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { lum(y * w + x) = plane(y * pw + x); x += 1 }
          y += 1
        }
      } else {
        val py = planes(0); val pwy = planeW(0)
        val pcb = planes(1); val pwcb = planeW(1)
        val pcr = planes(2); val pwcr = planeW(2)
        var y = 0
        while (y < h) {
          val yy0 = y * compV(0) / maxV
          val ycb = y * compV(1) / maxV
          val ycr = y * compV(2) / maxV
          var x = 0
          while (x < w) {
            val yv = py(yy0 * pwy + x * compH(0) / maxH)
            val cbv = pcb(ycb * pwcb + x * compH(1) / maxH)
            val crv = pcr(ycr * pwcr + x * compH(2) / maxH)
            lum(y * w + x) = ycbcrLuma(yv, cbv, crv)
            x += 1
          }
          y += 1
        }
      }
      lum
    }

    /** Encode a PROGRESSIVE (SOF2) JPEG from the same zigzag-quantized
      * blocks as the baseline encoders, under an explicit scan script —
      * each entry (comps, Ss, Se, Ah, Al): comps by frame index (DC
      * scans may interleave several; AC scans must name one), spectral
      * band [Ss, Se], successive-approximation high/low. A script like
      * `DC Al=1 → AC 1..5 Al=1 → AC 6..63 Al=1 → DC refine → AC refine`
      * reproduces the shape real encoders emit. Grayscale when
      * `cbBlocks` is empty (then yBlocks must be the 1×1-sampling
      * grid); color follows [[synthBaselineJpegColor]]'s table/slot
      * conventions. Restart intervals are not emitted (the DECODER
      * supports them; the synthetic fixtures do not need them).
      *
      * The AC-refinement emitter is spec-literal (T.81 G.1.2.3): each
      * ZRL carries exactly the correction bits of the
      * nonzero-history coefficients its 16-zero span passes, each
      * newly-significant symbol carries the bits up to its placement
      * position, and EOB runs buffer the tail bits of every blocked
      * block in order — mirroring the reference decoder walk
      * bit-for-bit. */
    def synthProgressiveJpeg(
        w: Int, h: Int, hSamp: Int, vSamp: Int,
        yBlocks: Seq[Array[Int]], cbBlocks: Seq[Array[Int]], crBlocks: Seq[Array[Int]],
        qLumaZigzag: Array[Int], qChromaZigzag: Array[Int],
        dcLuma: HuffSpec, acLuma: HuffSpec, dcChroma: HuffSpec, acChroma: HuffSpec,
        scans: Seq[(Seq[Int], Int, Int, Int, Int)],
        comment: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "jpeg dims are 16-bit")
      val color = cbBlocks.nonEmpty
      val ncomp = if (color) 3 else 1
      val (hs, vs) = if (color) (hSamp, vSamp) else (1, 1)
      require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2, "luma sampling 1-2")
      val mcusX = (w + 8 * hs - 1) / (8 * hs)
      val mcusY = (h + 8 * vs - 1) / (8 * vs)
      val compBw = Array(mcusX * hs, mcusX, mcusX)
      val compBh = Array(mcusY * vs, mcusY, mcusY)
      val compBlocks: Array[Seq[Array[Int]]] =
        if (color) Array(yBlocks, cbBlocks, crBlocks) else Array(yBlocks)
      var c = 0
      while (c < ncomp) {
        require(compBlocks(c).length == compBw(c) * compBh(c),
          s"component $c needs ${compBw(c)}*${compBh(c)} blocks")
        require(compBlocks(c).forall(_.length == 64), "blocks are 64 zigzag coefficients")
        c += 1
      }
      scans.foreach { case (cs, ss, se, ah, al) =>
        require(cs.nonEmpty && cs.forall(ci => ci >= 0 && ci < ncomp), "scan comps in frame")
        require(
          (ss == 0 && se == 0) || (cs.length == 1 && ss >= 1 && se >= ss && se <= 63),
          "DC scans are Ss=Se=0; AC scans are single-component bands")
        require(al >= 0 && (ah == 0 || ah == al + 1), "successive approximation steps by 1")
      }
      val out = new java.io.ByteArrayOutputStream()
      def b(vs0: Int*): Unit = vs0.foreach(v => out.write(v & 0xff))
      def seg(marker: Int, body: Int*): Unit = {
        b(0xff, marker, (body.length + 2) >>> 8, body.length + 2)
        body.foreach(v => out.write(v & 0xff))
      }
      b(0xff, 0xd8)
      seg(0xe0, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      seg(0xfe, comment.map(_.toInt): _*)
      seg(0xdb, 0x00 +: qLumaZigzag.toSeq: _*)
      if (color) seg(0xdb, 0x01 +: qChromaZigzag.toSeq: _*)
      if (color)
        seg(0xc2, 8, h >>> 8, h, w >>> 8, w, 3,
          1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1)
      else
        seg(0xc2, 8, h >>> 8, h, w >>> 8, w, 1, 1, 0x11, 0)
      seg(0xc4, 0x00 +: (dcLuma.counts ++ dcLuma.symbols).toSeq: _*)
      seg(0xc4, 0x10 +: (acLuma.counts ++ acLuma.symbols).toSeq: _*)
      if (color) {
        seg(0xc4, 0x01 +: (dcChroma.counts ++ dcChroma.symbols).toSeq: _*)
        seg(0xc4, 0x11 +: (acChroma.counts ++ acChroma.symbols).toSeq: _*)
      }

      // ---- per-scan entropy emission ----
      var acc0 = 0; var nbits0 = 0
      def putBits(code: Int, len: Int): Unit = {
        var i2 = len - 1
        while (i2 >= 0) {
          acc0 = (acc0 << 1) | ((code >>> i2) & 1); nbits0 += 1
          if (nbits0 == 8) {
            out.write(acc0); if (acc0 == 0xff) out.write(0x00)
            acc0 = 0; nbits0 = 0
          }
          i2 -= 1
        }
      }
      def align(): Unit = if (nbits0 > 0) putBits((1 << (8 - nbits0)) - 1, 8 - nbits0)
      def putSym(tbl: HuffSpec, sym: Int): Unit = {
        val (code, len) = tbl.encodeTable(sym); putBits(code, len)
      }

      scans.foreach { case (cs, ss, se, ah, al) =>
        // SOS header
        val sosBody = Seq(cs.length) ++ cs.flatMap { ci =>
          val id = ci + 1
          val td = if (ci == 0) 0 else 1
          Seq(id, (td << 4) | td)
        } ++ Seq(ss, se, (ah << 4) | al)
        seg(0xda, sosBody: _*)
        acc0 = 0; nbits0 = 0

        def dcTab(ci: Int) = if (ci == 0) dcLuma else dcChroma
        def acTab(ci: Int) = if (ci == 0) acLuma else acChroma

        if (ss == 0 && ah == 0) {
          // DC first: interleaved (or trivially single-comp) MCU walk
          val pred = new Array[Int](ncomp)
          def emitDc(ci: Int, blk: Array[Int]): Unit = {
            val v = blk(0) >> al // arithmetic shift (T.81 DC point transform)
            val diff = v - pred(ci); pred(ci) = v
            val t = category(diff)
            putSym(dcTab(ci), t)
            if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          }
          if (cs.length > 1) {
            var mcu = 0
            while (mcu < mcusX * mcusY) {
              val mx = mcu % mcusX; val my = mcu / mcusX
              cs.foreach { ci =>
                val (cH, cV) = if (ci == 0) (hs, vs) else (1, 1)
                for (v <- 0 until cV; hx <- 0 until cH)
                  emitDc(ci, compBlocks(ci)((my * cV + v) * compBw(ci) + mx * cH + hx))
              }
              mcu += 1
            }
          } else {
            val ci = cs.head
            val (cH, cV) = if (ci == 0) (hs, vs) else (1, 1)
            val cw = (w * cH + hs - 1) / hs; val chh = (h * cV + vs - 1) / vs
            val bw = (cw + 7) / 8; val bh = (chh + 7) / 8
            for (by <- 0 until bh; bx <- 0 until bw)
              emitDc(ci, compBlocks(ci)(by * compBw(ci) + bx))
          }
        } else if (ss == 0) {
          // DC refinement: one bit per block, MCU order
          def emitBit(blk: Array[Int]): Unit = putBits((blk(0) >> al) & 1, 1)
          if (cs.length > 1) {
            var mcu = 0
            while (mcu < mcusX * mcusY) {
              val mx = mcu % mcusX; val my = mcu / mcusX
              cs.foreach { ci =>
                val (cH, cV) = if (ci == 0) (hs, vs) else (1, 1)
                for (v <- 0 until cV; hx <- 0 until cH)
                  emitBit(compBlocks(ci)((my * cV + v) * compBw(ci) + mx * cH + hx))
              }
              mcu += 1
            }
          } else {
            val ci = cs.head
            val (cH, cV) = if (ci == 0) (hs, vs) else (1, 1)
            val cw = (w * cH + hs - 1) / hs; val chh = (h * cV + vs - 1) / vs
            val bw = (cw + 7) / 8; val bh = (chh + 7) / 8
            for (by <- 0 until bh; bx <- 0 until bw)
              emitBit(compBlocks(ci)(by * compBw(ci) + bx))
          }
        } else {
          // AC scans: single component over its true data-unit grid
          val ci = cs.head
          val ac = acTab(ci)
          val (cH, cV) = if (ci == 0) (hs, vs) else (1, 1)
          val cw = (w * cH + hs - 1) / hs; val chh = (h * cV + vs - 1) / vs
          val bw = (cw + 7) / 8; val bh = (chh + 7) / 8
          var eobrun = 0
          val tailBits = new scala.collection.mutable.ArrayBuffer[Int]()
          def flushEob(): Unit = {
            if (eobrun > 0) {
              var r = 0
              while ((eobrun >> (r + 1)) != 0) r += 1
              putSym(ac, r << 4)
              if (r > 0) putBits(eobrun - (1 << r), r)
              eobrun = 0
            }
            tailBits.foreach(bit => putBits(bit, 1))
            tailBits.clear()
          }
          for (by <- 0 until bh; bx <- 0 until bw) {
            val blk = compBlocks(ci)(by * compBw(ci) + bx)
            if (ah == 0) {
              // AC first pass over the band: magnitudes at this Al
              var r = 0
              var k = ss
              var any = false
              while (k <= se) {
                val v = blk(k)
                val t = if (v >= 0) v >> al else -((-v) >> al)
                if (t == 0) r += 1
                else {
                  if (!any || eobrun > 0) flushEob()
                  any = true
                  while (r >= 16) { putSym(ac, 0xF0); r -= 16 }
                  val s2 = category(t)
                  putSym(ac, (r << 4) | s2)
                  putBits(if (t < 0) t + (1 << s2) - 1 else t, s2)
                  r = 0
                }
                k += 1
              }
              if (r > 0 || !any) {
                eobrun += 1
                if (eobrun == 0x7fff) flushEob()
              }
            } else {
              // AC refinement: spec-literal span-accurate emission
              val p1bit = new Array[Int](64) // correction bit per position
              val hist = new Array[Boolean](64) // nonzero history at this scan
              val newSig = new Array[Boolean](64)
              var k = ss
              while (k <= se) {
                val v = blk(k)
                val mag = math.abs(v)
                val t = mag >> al
                hist(k) = (mag >> (al + 1)) != 0
                newSig(k) = !hist(k) && t == 1
                p1bit(k) = (mag >> al) & 1
                k += 1
              }
              var cursor = ss
              var any = false
              var pos = ss
              while (pos <= se) {
                if (newSig(pos)) {
                  if (!any || eobrun > 0) flushEob()
                  any = true
                  // zero-history run before this coefficient
                  var r = 0
                  var j = cursor
                  while (j < pos) { if (!hist(j)) r += 1; j += 1 }
                  while (r > 15) {
                    putSym(ac, 0xF0)
                    // bits for positions passed by this ZRL's 16-zero span
                    var zeros = 0
                    while (zeros < 16) {
                      if (hist(cursor)) putBits(p1bit(cursor), 1)
                      else zeros += 1
                      cursor += 1
                    }
                    r -= 16
                  }
                  putSym(ac, (r << 4) | 1)
                  putBits(if (blk(pos) >= 0) 1 else 0, 1)
                  // bits for nonzero-history positions up to the placement
                  while (cursor < pos) {
                    if (hist(cursor)) putBits(p1bit(cursor), 1)
                    cursor += 1
                  }
                  cursor = pos + 1
                }
                pos += 1
              }
              if (cursor <= se || !any) {
                // trailing span joins the EOB run; its correction bits
                // are buffered and flow after the EOBn symbol
                eobrun += 1
                var j = cursor
                while (j <= se) {
                  if (hist(j)) tailBits += p1bit(j)
                  j += 1
                }
                if (eobrun == 0x7fff) flushEob()
              }
            }
          }
          flushEob()
        }
        align()
      }
      b(0xff, 0xd9)
      out.toByteArray
    }

    /** Progressive (SOF2) decode — the format nearly every web image
      * actually ships. Coefficients accumulate across SCANS into
      * per-component zigzag-ordered stores: DC first scans deliver
      * `pred << Al`, DC refinement appends one bit per block, AC first
      * scans cover a spectral band `[Ss, Se]` with EOB-run coding, and
      * AC refinement appends correction bits to already-significant
      * coefficients while inserting newly-significant ±2^Al ones
      * (T.81 G.2; the control flow mirrors the reference decoder
      * structure every real file is written against). Interleaved
      * scans (DC, all components) walk MCUs; AC scans are
      * single-component over that component's true data-unit grid.
      * After EOI: dequant, dezigzag, IDCT, and the same
      * [[composeLuma]] finish as baseline. */
    private def decodeProgressiveLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var w = 0; var h = 0
      val qTabs = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffSpec](4)
      val acTabs = new Array[HuffSpec](4)
      var compIds: Array[Int] = null
      var compH: Array[Int] = null; var compV: Array[Int] = null
      var compTq: Array[Int] = null
      var dri = 0
      var maxH = 1; var maxV = 1
      var mcusX = 0; var mcusY = 0
      var stores: Array[Array[Int]] = null // per comp: nBlocks*64, zigzag order
      var storeBw: Array[Int] = null; var storeBh: Array[Int] = null
      var sawEoi = false
      var i = 2
      // scan-component table ids, refilled by each SOS parse before its
      // decodeScan call (indexed by frame component index)
      val scanTd = new Array[Int](4)
      val scanTa = new Array[Int](4)

      // decode ONE scan's entropy data; returns the byte position of the
      // next marker, or -1 on malformed data
      def decodeScan(
          scanComps: Array[Int], Ss: Int, Se: Int, Ah: Int, Al: Int,
          start: Int): Int = {
        var pos = start
        var acc = 0; var nbits = 0
        def nextBit(): Int = {
          if (nbits == 0) {
            if (pos >= b.length) return -1
            val v = b(pos) & 0xff
            if (v == 0xff) {
              if (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0x00) { acc = 0xff; pos += 2 }
              else return -1 // real marker inside entropy data
            } else { acc = v; pos += 1 }
            nbits = 8
          }
          nbits -= 1
          (acc >>> nbits) & 1
        }
        def decodeSym(tbl: Map[(Int, Int), Int]): Int = {
          var code = 0; var len = 0
          while (len < 16) {
            val bit = nextBit()
            if (bit < 0) return -1
            code = (code << 1) | bit; len += 1
            tbl.get((len, code)) match {
              case Some(sym) => return sym
              case None =>
            }
          }
          -1
        }
        def receive(t: Int): Int = {
          var v = 0; var k = 0
          while (k < t) {
            val bit = nextBit()
            if (bit < 0) return Int.MinValue
            v = (v << 1) | bit; k += 1
          }
          v
        }
        def extend(v: Int, t: Int): Int =
          if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

        val pred = new Array[Int](scanComps.length)
        var eobrun = 0

        // ---- per-block decoders over the zigzag store ----
        def dcFirst(store: Array[Int], base: Int, ci: Int, dc: Map[(Int, Int), Int]): Boolean = {
          val t = decodeSym(dc)
          if (t < 0 || t > 11) return false
          val dv = receive(t)
          if (dv == Int.MinValue) return false
          pred(ci) += extend(dv, t)
          store(base) = pred(ci) << Al
          true
        }
        def dcRefine(store: Array[Int], base: Int): Boolean = {
          val bit = nextBit()
          if (bit < 0) return false
          if (bit == 1) store(base) |= (1 << Al)
          true
        }
        def acFirst(store: Array[Int], base: Int, ac: Map[(Int, Int), Int]): Boolean = {
          if (eobrun > 0) { eobrun -= 1; return true }
          var k = Ss
          while (k <= Se) {
            val sym = decodeSym(ac)
            if (sym < 0) return false
            val r = sym >>> 4; val s = sym & 0x0f
            if (s == 0) {
              if (r < 15) {
                val ex = receive(r)
                if (ex == Int.MinValue) return false
                eobrun = (1 << r) - 1 + ex
                return true
              }
              k += 16 // ZRL
            } else {
              k += r
              if (k > Se) return false
              val av = receive(s)
              if (av == Int.MinValue) return false
              store(base + k) = extend(av, s) << Al
              k += 1
            }
          }
          true
        }
        def acRefine(store: Array[Int], base: Int, ac: Map[(Int, Int), Int]): Boolean = {
          val p1 = 1 << Al
          var k = Ss
          if (eobrun == 0) {
            var ended = false
            while (k <= Se && !ended) {
              val sym = decodeSym(ac)
              if (sym < 0) return false
              var r = sym >>> 4; val s = sym & 0x0f
              var newVal = 0
              if (s == 0) {
                if (r < 15) {
                  val ex = receive(r)
                  if (ex == Int.MinValue) return false
                  eobrun = (1 << r) + ex // includes THIS block; decremented below
                  ended = true
                }
                // r == 15: a run of 16 zero-history coefficients
              } else {
                if (s != 1) return false
                val bit = nextBit()
                if (bit < 0) return false
                newVal = if (bit == 1) p1 else -p1
              }
              if (!ended) {
                var placed = false
                while (k <= Se && !placed) {
                  val v = store(base + k)
                  if (v != 0) {
                    val bit = nextBit()
                    if (bit < 0) return false
                    if (bit == 1 && (v & p1) == 0)
                      store(base + k) = if (v >= 0) v + p1 else v - p1
                  } else {
                    if (r == 0) {
                      if (s != 0) store(base + k) = newVal
                      placed = true
                    } else r -= 1
                  }
                  k += 1
                }
                if (!placed && s != 0) return false // ran past Se without placing
              }
            }
          }
          if (eobrun > 0) {
            // history-correction bits for the remainder of this block
            while (k <= Se) {
              val v = store(base + k)
              if (v != 0) {
                val bit = nextBit()
                if (bit < 0) return false
                if (bit == 1 && (v & p1) == 0)
                  store(base + k) = if (v >= 0) v + p1 else v - p1
              }
              k += 1
            }
            eobrun -= 1
          }
          true
        }

        // table maps resolved once per scan
        val dcMaps = new Array[Map[(Int, Int), Int]](scanComps.length)
        val acMaps = new Array[Map[(Int, Int), Int]](scanComps.length)
        var sc = 0
        while (sc < scanComps.length) {
          val ci = scanComps(sc)
          if (Ss == 0) {
            if (Ah == 0) {
              if (dcTabs(scanTd(ci)) == null) return -1
              dcMaps(sc) = dcTabs(scanTd(ci)).decodeTable
            }
          } else {
            if (acTabs(scanTa(ci)) == null) return -1
            acMaps(sc) = acTabs(scanTa(ci)).decodeTable
          }
          sc += 1
        }

        def decodeUnit(sc: Int, bx: Int, by: Int): Boolean = {
          val ci = scanComps(sc)
          val store = stores(ci)
          val base = (by * storeBw(ci) + bx) * 64
          if (Ss == 0) {
            if (Ah == 0) dcFirst(store, base, sc, dcMaps(sc)) else dcRefine(store, base)
          } else {
            if (Ah == 0) acFirst(store, base, acMaps(sc)) else acRefine(store, base, acMaps(sc))
          }
        }

        var rstExpect = 0
        def restartAt(unit: Int): Boolean = {
          if (dri > 0 && unit > 0 && unit % dri == 0) {
            nbits = 0
            if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
                (b(pos + 1) & 0xff) != 0xd0 + rstExpect) return false
            pos += 2; rstExpect = (rstExpect + 1) % 8
            java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          true
        }

        if (scanComps.length > 1) {
          // interleaved (DC scans): frame MCU walk
          var mcu = 0
          while (mcu < mcusX * mcusY) {
            if (!restartAt(mcu)) return -1
            val mx = mcu % mcusX; val my = mcu / mcusX
            var sc = 0
            while (sc < scanComps.length) {
              val ci = scanComps(sc)
              var v = 0
              while (v < compV(ci)) {
                var hx = 0
                while (hx < compH(ci)) {
                  if (!decodeUnit(sc, mx * compH(ci) + hx, my * compV(ci) + v)) return -1
                  hx += 1
                }
                v += 1
              }
              sc += 1
            }
            mcu += 1
          }
        } else {
          // non-interleaved: the component's TRUE data-unit grid
          val ci = scanComps(0)
          val cw = (w * compH(ci) + maxH - 1) / maxH
          val ch = (h * compV(ci) + maxV - 1) / maxV
          val bw = (cw + 7) / 8; val bh = (ch + 7) / 8
          var unit = 0
          while (unit < bw * bh) {
            if (!restartAt(unit)) return -1
            if (!decodeUnit(0, unit % bw, unit / bw)) return -1
            unit += 1
          }
        }
        // advance to the next marker, skipping stuffing and stray RSTn
        var p = pos
        var done = false
        while (!done) {
          if (p + 1 >= b.length) return -1
          if ((b(p) & 0xff) == 0xff) {
            val m = b(p + 1) & 0xff
            if (m == 0x00) p += 2
            else if (m >= 0xd0 && m <= 0xd7) p += 2
            else done = true
          } else p += 1
        }
        p
      }

      // ---- marker loop over the whole stream ----
      while (!sawEoi) {
        if (i + 2 > b.length || (b(i) & 0xff) != 0xff) return None
        val m = b(i + 1) & 0xff
        if (m == 0xd9) { sawEoi = true }
        else if (m == 0xff) { i += 1 } // 0xFF fill byte before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
        else {
          if (i + 4 > b.length) return None
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) return None
          val body = i + 4
          m match {
            case 0xc2 =>
              if (stores != null) return None // one frame only
              if (len < 11 || (b(body) & 0xff) != 8) return None
              h = ((b(body + 1) & 0xff) << 8) | (b(body + 2) & 0xff)
              w = ((b(body + 3) & 0xff) << 8) | (b(body + 4) & 0xff)
              val ncomp = b(body + 5) & 0xff
              if (ncomp != 1 && ncomp != 3) return None
              if (len < 8 + 3 * ncomp) return None
              compIds = new Array[Int](ncomp)
              compH = new Array[Int](ncomp); compV = new Array[Int](ncomp)
              compTq = new Array[Int](ncomp)
              var c = 0
              while (c < ncomp) {
                compIds(c) = b(body + 6 + 3 * c) & 0xff
                val hv = b(body + 7 + 3 * c) & 0xff
                compH(c) = hv >>> 4; compV(c) = hv & 0x0f
                compTq(c) = b(body + 8 + 3 * c) & 0xff
                if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                    compTq(c) > 3) return None
                c += 1
              }
              if (ncomp == 1 && (compH(0) != 1 || compV(0) != 1)) return None
              if (ncomp == 3 && (compH(1) != 1 || compV(1) != 1 ||
                  compH(2) != 1 || compV(2) != 1)) return None
              if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
              maxH = compH.max; maxV = compV.max
              mcusX = (w + 8 * maxH - 1) / (8 * maxH)
              mcusY = (h + 8 * maxV - 1) / (8 * maxV)
              storeBw = Array.tabulate(ncomp)(c => mcusX * compH(c))
              storeBh = Array.tabulate(ncomp)(c => mcusY * compV(c))
              var cc = 0
              while (cc < ncomp) {
                if (storeBw(cc).toLong * storeBh(cc) * 64 >
                    MaxDecodePixels.toLong + (1L << 16)) return None
                cc += 1
              }
              stores = Array.tabulate(ncomp)(c => new Array[Int](storeBw(c) * storeBh(c) * 64))
            case mm if (mm >= 0xc0 && mm <= 0xcf && mm != 0xc2 && mm != 0xc4) =>
              return None // mixed/other frame types
            case 0xdb =>
              var p = body
              while (p < i + 2 + len) {
                if ((b(p) & 0xff) >>> 4 != 0) return None
                val tq = b(p) & 0x0f
                if (tq > 3 || p + 65 > i + 2 + len) return None
                qTabs(tq) = Array.tabulate(64)(j => b(p + 1 + j) & 0xff)
                p += 65
              }
            case 0xc4 =>
              var p = body
              while (p < i + 2 + len) {
                val tc = (b(p) & 0xff) >>> 4; val th = b(p) & 0x0f
                if (th > 3 || p + 17 > i + 2 + len) return None
                val counts = Array.tabulate(16)(j => b(p + 1 + j) & 0xff)
                val n = counts.sum
                if (p + 17 + n > i + 2 + len) return None
                val spec = HuffSpec(counts, Array.tabulate(n)(j => b(p + 17 + j) & 0xff))
                if (tc == 0) dcTabs(th) = spec
                else if (tc == 1) acTabs(th) = spec
                else return None
                p += 17 + n
              }
            case 0xdd =>
              if (len != 4) return None
              dri = ((b(body) & 0xff) << 8) | (b(body + 1) & 0xff)
            case 0xda =>
              if (stores == null) return None
              val ns = b(body) & 0xff
              if (ns < 1 || ns > compIds.length || len < 6 + 2 * ns) return None
              val scanComps = new Array[Int](ns)
              var s = 0
              while (s < ns) {
                val cid = b(body + 1 + 2 * s) & 0xff
                val ci = compIds.indexOf(cid)
                if (ci < 0) return None
                scanComps(s) = ci
                val tt = b(body + 2 + 2 * s) & 0xff
                scanTd(ci) = tt >>> 4; scanTa(ci) = tt & 0x0f
                if (scanTd(ci) > 3 || scanTa(ci) > 3) return None
                s += 1
              }
              val Ss = b(body + 1 + 2 * ns) & 0xff
              val Se = b(body + 2 + 2 * ns) & 0xff
              val ahAl = b(body + 3 + 2 * ns) & 0xff
              val Ah = ahAl >>> 4; val Al = ahAl & 0x0f
              // progressive scan constraints (T.81 G.1): DC scans are
              // Ss=Se=0 (interleave allowed); AC scans are
              // single-component spectral bands
              if (Ss == 0) { if (Se != 0) return None }
              else { if (ns != 1 || Se < Ss || Se > 63) return None }
              if (Ah != 0 && Ah != Al + 1) return None // successive refinement steps by 1
              if (Al > 13) return None
              val next = decodeScan(scanComps, Ss, Se, Ah, Al, i + 2 + len)
              if (next < 0) return None
              i = next // decodeScan leaves i AT the next marker's 0xff
            case _ => // APPn / COM: skip
          }
          if (m != 0xda) i += 2 + len
        }
      }
      if (stores == null) return None
      // every component must have its quant table
      var c2 = 0
      while (c2 < compIds.length) {
        if (qTabs(compTq(c2)) == null) return None
        c2 += 1
      }
      // ---- dequant + dezigzag + IDCT into per-component planes ----
      val ncomp = compIds.length
      val planeW = Array.tabulate(ncomp)(c => storeBw(c) * 8)
      val planes = Array.tabulate(ncomp)(c => new Array[Int](planeW(c) * storeBh(c) * 8))
      val f = new Array[Int](64)
      var c3 = 0
      while (c3 < ncomp) {
        val q = qTabs(compTq(c3))
        val store = stores(c3)
        val bw = storeBw(c3); val bh = storeBh(c3)
        val pw = planeW(c3)
        var blk = 0
        while (blk < bw * bh) {
          val base = blk * 64
          java.util.Arrays.fill(f, 0)
          var z = 0
          while (z < 64) { f(ZigzagOrder(z)) = store(base + z) * q(z); z += 1 }
          val px = idct8x8(f)
          val bx = blk % bw; val by = blk / bw
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(c3)((by * 8 + y) * pw + bx * 8 + x) = px(y * 8 + x)
              x += 1
            }
            y += 1
          }
          blk += 1
        }
        c3 += 1
      }
      Some((w, h, composeLuma(w, h, ncomp, compH, compV, maxH, maxV, planes, planeW)))
    }

    private val CosTable: Array[Double] = {
      val t = new Array[Double](64) // t(x*8+u) = cos((2x+1)·u·π/16)
      var x = 0
      while (x < 8) {
        var u = 0
        while (u < 8) { t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0); u += 1 }
        x += 1
      }
      t
    }
    private val InvSqrt2 = 1.0 / math.sqrt(2.0)

    /** The textbook 2-D inverse DCT (T.81 A.3.3) in double precision,
      * followed by the +128 level shift and [0,255] clamp. A DC-only
      * block is mathematically flat at dc/8 — exact in doubles — which
      * is what keeps the dedup fixture's oracle integer-exact. (A
      * production decoder would use a factored AAN transform; at the
      * fixture scale the direct form is the clearer statement.) */
    def idct8x8(f: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) {
            val cv = if (v == 0) InvSqrt2 else 1.0
            var u = 0
            while (u < 8) {
              val cu = if (u == 0) InvSqrt2 else 1.0
              val fv = f(v * 8 + u)
              if (fv != 0) s += cu * cv * fv * CosTable(x * 8 + u) * CosTable(y * 8 + v)
              u += 1
            }
            v += 1
          }
          val p = Math.round(s / 4.0).toInt + 128
          out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Batched media decoder: container headers are parsed from the payload
    * bytes for all three modalities (PNG/JPEG, WAV, AVI); unparseable
    * payloads surface as -1 rather than echoing source metadata. The
    * feature vector is a deterministic content-hash projection — the one
    * remaining stand-in (no embedding model ships in this container); a
    * real featurizer plugs into this same boundary. */
  object Decoder {
    val FeatureDim = 8

    def hashBytes(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      h
    }

    def decode(rec: MediaRecord): MediaFeatures = {
      val h = hashBytes(rec.content)
      val feat = Array.tabulate(FeatureDim) { i =>
        // scramble hash per dimension into [-1, 1]
        var z = h + (i + 1) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z.toDouble / Long.MaxValue.toDouble).toFloat
      }
      val video = if (rec.modality == "video") VideoHeader.decode(rec.content) else None
      val frames = rec.modality match {
        // 1-fps sampling of the PARSED duration
        case "video" => video.map { case (_, _, _, d) => math.max(1, (d / 1000L).toInt) }.getOrElse(-1)
        case "image" => 1
        case _       => 0
      }
      val (dw, dh) = rec.modality match {
        case "image" => ImageHeader.decode(rec.content).getOrElse((-1, -1))
        case "audio" => (0, 0) // audio has no spatial dimensions
        case _       => video.map { case (w, ht, _, _) => (w, ht) }.getOrElse((-1, -1))
      }
      val (rate, ch, durMs) = rec.modality match {
        case "audio" => AudioHeader.decode(rec.content).getOrElse((-1, -1, -1L))
        case "video" => (0, 0, video.map(_._4).getOrElse(-1L))
        case _       => (0, 0, 0L)
      }
      MediaFeatures(rec.media_id, rec.modality, rec.content.length.toLong, h,
        dw, dh, frames, rate, ch, durMs, feat)
    }
  }

  /** Feature extraction over a media table: batched per partition (the
    * shape a vectorized/Arrow decode path needs), no shuffle — a pure
    * narrow transformation that scales with input splits. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // Batch iterator: a real decoder amortizes codec init per batch.
      it.grouped(batchSize).flatMap { batch => batch.map(Decoder.decode) }
    }
  }

  /** Aspect-preserving image resize to fit within (maxW, maxH): target
    * dims come from the PARSED container header (never the metadata
    * columns), scale = min(maxW/w, maxH/h, 1) — images already inside the
    * box pass through unscaled. The container's declared dimensions are
    * rewritten byte-level ([[ImageHeader.rewriteDims]]: PNG IHDR + CRC32,
    * JPEG SOF), which is the real plumbing; the PIXEL kernel is the same
    * declared stub boundary as [[Decoder]]'s feature vector (no codec
    * ships in this container — a real scaler plugs in where the payload
    * passes through). Non-image rows and unparseable payloads pass
    * through untouched. Narrow per-partition map, no shuffle. */
  def resizeImagesToFit(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    require(maxW > 0 && maxH > 0, "resize box must be positive")
    implicit val enc = Encoders.product[MediaRecord]
    media.mapPartitions(_.map { rec =>
      if (rec.modality != "image") rec
      else ImagePixels.resizePngToFit(rec.content, maxW, maxH) match {
        // pixel-bearing PNG: REAL resize — decode, integer box
        // downsample, re-encode (p_media_resize_px certifies the chain)
        case Some((ow, oh, bytes)) =>
          rec.copy(content = bytes, width = ow, height = oh)
        // header-only containers keep the declared dim-patch boundary
        case None => ImageHeader.decode(rec.content) match {
          case Some((w, h)) if w > 0 && h > 0 =>
            val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
            val tw = math.max(1, math.floor(w * scale).toInt)
            val th = math.max(1, math.floor(h * scale).toInt)
            ImageHeader.rewriteDims(rec.content, tw, th)
              .map(c => rec.copy(content = c, width = tw, height = th))
              .getOrElse(rec)
          case _ => rec
        }
      }
    })
  }

  /** One sampled video frame: index, its timestamp from the PARSED
    * header timing, and a frame reference (the pixel payload is the
    * declared stub boundary — a real pipeline hangs decoded bytes here). */
  case class FrameSample(
      media_id: Long,
      frame_index: Int,
      timestamp_ms: Long,
      n_frames_total: Int,
      frame_ref: String)

  /** Sample every `everyK`-th frame of each video — the standard
    * video-to-training-examples step (a 2-hour clip at 25 fps becomes
    * ~180 frames at everyK=100). Frame count and timing are parsed from
    * the AVI container BYTES ([[VideoHeader.decode]]), never the metadata
    * columns; timestamps are exact integer arithmetic
    * (index · duration / frames). Non-video and unparseable rows emit
    * nothing. Narrow per-partition flatMap — the fan-out is
    * frames/everyK per row, no shuffle. */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int): Dataset[FrameSample] = {
    require(everyK > 0, "everyK must be positive")
    implicit val enc = Encoders.product[FrameSample]
    media.mapPartitions(_.flatMap { rec =>
      if (rec.modality != "video") Iterator.empty
      else VideoHeader.decode(rec.content) match {
        case Some((_, _, frames, durMs)) if frames > 0 =>
          Iterator.range(0, frames, everyK).map { i =>
            FrameSample(rec.media_id, i, i.toLong * durMs / frames, frames,
              s"${rec.uri}#frame=$i")
          }
        case _ => Iterator.empty
      }
    })
  }

  /** Demo media table derived deterministically from the documents table:
    * image rows carry REAL synthesized PNG (even ids) / JPEG (odd ids)
    * payloads with the text embedded as an ancillary chunk, audio rows
    * carry REAL 16-bit PCM WAV (rate 8/12/16/20 kHz and 1-2 channels
    * derived from the id) whose SAMPLES come from the deterministic
    * affine rule `min(codepoint, 255)·257 − 32768` — genuine full-range
    * PCM the sample decoder ([[AudioSamples.decodePcm16]]) really
    * decodes, and because the perceptual hash compares cross-multiplied
    * bin MEANS, a positive affine map of the codepoint sequence yields
    * bit-identical dHashes (the ±b·L₁·L₂ terms cancel), keeping the
    * text-replay oracle exact — and video rows carry REAL synthesized
    * AVI (25 fps, ~n_chars/4 frames, text bytes as the movi payload) —
    * all three decode paths parse genuine container bytes. The AVI's
    * parsed duration (frames × 40 ms) deliberately differs from the
    * `duration_ms` metadata column, so a decoder that echoes metadata
    * diverges from the oracle. */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    documents
      .select(col("doc_id"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val w = (id % 640 + 1).toInt
        val h = (id % 480 + 1).toInt
        val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val content = modality match {
          case "image" if id % 2 == 0 => ImageHeader.synthPng(w, h, textBytes)
          case "image"                => ImageHeader.synthJpeg(w, h, textBytes)
          case "audio" =>
            AudioSamples.synthPcmWav((8000 + (id % 4) * 4000).toInt, (1 + id % 2).toInt,
              text.codePoints().toArray.map(cp => math.min(cp, 255) * 257 - 32768))
          case _ =>
            VideoHeader.synthAvi(w, h, math.max(1L, nChars / 4L).toInt, 40000, textBytes)
        }
        MediaRecord(id, modality, s"mem://doc/$id", content, w, h, nChars * 10L)
      }
  }

  /** Perceptual dHash of a media row's content ([[PayloadDHashExpr]]):
    * decoded buffer extracted by the real container walk (PNG tEXt /
    * JPEG COM / WAV data), hashed with the standard difference-hash
    * construction. Null for rows without a parseable payload. */
  def imagePayloadDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PayloadDHashExpr(ColumnBridge.expression(content)))
  }

  /** Image near-duplicate keep-set by perceptual hash: dHash each image's
    * decoded buffer, band the 64-bit hashes 4×16 (exact for hamming ≤ 3 —
    * the [[graft.functions.Dedup.hammingPairsFromHashes]] machinery), and
    * keep the lowest media_id of each near-dup group. Because the hash is
    * computed from the DECODED PAYLOAD, re-encoding the same image into a
    * different container (PNG ↔ JPEG here) does not defeat the dedup —
    * that is the point of perceptual hashing over byte hashing. The scan
    * is one narrow codegen'd projection; only (chunk, id, hash) rows
    * shuffle.
    *
    * Caching contract: the (id, hash) relation and its per-hash
    * representatives are `persist()`ed (each is consumed twice, and a
    * recompute would re-run the full container decode — the expensive
    * part). They stay cached until the CALLER releases them —
    * `spark.catalog.clearCache()` after consuming the result (what the
    * bench/verify harnesses do between queries), or an application-level
    * cache policy. They are deliberately NOT unpersisted here: that
    * would force eager materialization inside this builder, breaking
    * the lazy-plan contract every other operator keeps (and hiding the
    * plan from inspection). Library users calling this repeatedly
    * without releasing will accumulate 16-byte/row cached relations
    * until executor storage evicts them LRU — harmless for storage
    * memory, but clearCache keeps it deterministic. */
  def imageNearDupKeep(
      media: DataFrame,
      idCol: String,
      contentCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persisted: the downstream machinery consumes the hash relation
    // twice (distinct-hash collapse + the member join), and each
    // consumption would otherwise re-run the full container DECODE over
    // every media row — the expensive part of the whole query (the
    // round-13 jpeg_color curve read exactly 3× the single-decode cost).
    // (id, hash) is 16 bytes/row, the cheapest possible thing to hold;
    // at crawl scale it is the hash index a dedup run materializes
    // anyway. The harness's clearCache between queries releases it.
    val hashed = media
      .select(col(idCol).as("__id"), imagePayloadDHash(col(contentCol)).as("__sh"))
      .where(col("__sh").isNotNull)
      .persist()
    // EXACT-duplicate collapse before the banded near-dup search — the
    // crawl-scale essential: re-encodings of the same pixels share the
    // exact dHash, and banding candidate volume grows with the SQUARE
    // of per-bucket occupancy, so representatives (min id per distinct
    // hash) must carry the Hamming search while same-hash members pair
    // with their representative directly. Result-equivalent to banding
    // the full relation: x is dropped iff some smaller id is within
    // maxHamming — if that smaller id is a non-representative, its
    // representative is smaller still and has the same hash, so the
    // representative pair already drops x. Pinned against the all-pairs
    // DuckDB oracles on every media contract row.
    val reps = hashed.groupBy("__sh").agg(min("__id").as("__id")).persist()
    val intra = hashed
      .join(reps.select(col("__sh"), col("__id").as("__rep")), Seq("__sh"))
      .where(col("__id") > col("__rep"))
      .select(col("__rep").as("id_a"), col("__id").as("id_b"))
    val inter = Dedup.hammingPairsFromHashes(reps, maxHamming)
      .select("id_a", "id_b")
    Dedup.keepFirstFromPairs(media.select(col(idCol)), idCol,
      intra.unionByName(inter))
  }
}

/** dHash (difference hash) of an image over the declared decode boundary:
  * the grayscale buffer is the container's extracted payload read as
  * UTF-8 CODEPOINTS (a real decoder hands pixel lumas to this same grid;
  * codepoints keep the arithmetic integer-exact and replayable by an
  * external engine). Construction is the standard perceptual dHash: the
  * buffer splits into 8×9 equal cells (floor boundaries `k·L/72`), and
  * bit (r,c) compares the MEAN of cell (r,c) against its right neighbor —
  * cross-multiplied sums, so every comparison is exact integer
  * arithmetic. Near-identical buffers differ in few bits; Hamming
  * distance then measures perceptual closeness.
  *
  * Contract caveat: the unit is the Unicode CODEPOINT, not the grapheme
  * cluster — a combining sequence (`e` + U+0301, ZWJ emoji) counts one
  * cell entry per codepoint. An external replay that indexes by grapheme
  * (e.g. DuckDB's `text[i]`) diverges on such payloads; the oracle
  * corpora are precomposed-only by construction, and the codepoint
  * behavior is pinned by TextExprPropertySpec's combining-mark cases. */
case class PayloadDHashExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"payload_dhash expects binary content, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PayloadDHashExpr.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = ctx.freshName("dhash")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $result = graft.functions.PayloadDHashExpr.hash($c);
         |if ($result == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $result.longValue(); }
       """.stripMargin)
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
  override def prettyName: String = "payload_dhash"
}

object PayloadDHashExpr {
  /** Standard 2D dHash over a decoded pixel grid: the luma field splits
    * into an 8×9 grid of cells (floor boundaries `r·h/8`, `c·w/9`), and
    * bit (r,c) compares the MEAN of cell (r,c) against its right
    * neighbor — cross-multiplied integer sums, so every comparison is
    * exact and externally replayable. This is the honest perceptual
    * hash: it sees pixels, so re-encodes of the same image (different
    * zlib level, different scanline filters) hash IDENTICALLY. */
  def hashPixels(w: Int, h: Int, lum: Array[Int]): Long = {
    val sums = new Array[Long](72)
    val lens = new Array[Long](72)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9; val x1 = (c + 1) * w / 9
        var acc = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { acc += lum(y * w + x); x += 1 }
          y += 1
        }
        sums(r * 9 + c) = acc
        lens(r * 9 + c) = (y1 - y0).toLong * (x1 - x0)
        c += 1
      }
      r += 1
    }
    var hv = 0L
    var j = 0
    while (j < 64) {
      val i1 = (j / 8) * 9 + (j % 8)
      val i2 = i1 + 1
      if (sums(i1) * lens(i2) > sums(i2) * lens(i1)) hv |= (1L << j)
      j += 1
    }
    hv
  }

  /** 1-D 72-bin dHash over an integer sequence: floor bin boundaries
    * `k·n/72`, bit j compares the MEAN of bin (j/8, j%8) against its
    * right neighbor — cross-multiplied integer sums, so comparisons are
    * exact AND invariant under any positive affine map of the values
    * (`a·v + b` with a > 0: the a factor scales both sides, the b·L₁·L₂
    * terms cancel) — which is what lets a PCM fixture built from an
    * affine codepoint rule replay against a plain codepoint oracle. */
  def hashSeq(vals: Array[Int]): Long = {
    val n = vals.length
    val sums = new Array[Long](72)
    val lens = new Array[Long](72)
    var k = 0
    while (k < 72) {
      val lo = (k.toLong * n / 72).toInt
      val hi = ((k + 1).toLong * n / 72).toInt
      var acc = 0L
      var i = lo
      while (i < hi) { acc += vals(i); i += 1 }
      sums(k) = acc
      lens(k) = (hi - lo).toLong
      k += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      val i1 = (j / 8) * 9 + (j % 8)
      val i2 = i1 + 1
      if (sums(i1) * lens(i2) > sums(i2) * lens(i1)) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Boxed so an unparseable container can signal null; called from
    * codegen. Decoded-content paths run first — PNG with real pixel data
    * (IDAT): decode, de-filter, luma, 2D dHash; valid PCM WAV (16-, 8-,
    * or 24-bit integer, or IEEE-float32): chunk walk, sample decode,
    * mono mixdown, 1-D dHash over SAMPLES; uncompressed-DIB AVI: frame
    * decode, temporal-sum luma, 2D dHash; baseline (SOF0) or
    * progressive (SOF2) JPEG, grayscale or YCbCr: entropy decode across
    * all scans, dequant, IDCT, chroma upsample + color luma, 2D dHash.
    * Payload-as-luma remains the declared boundary for everything else
    * (pixel-less synthesized PNGs carrying their buffer in tEXt,
    * header-only JPEG COM, exotic-width WAV data, non-DIB AVI movi
    * payloads). */
  def hash(content: Array[Byte]): java.lang.Long = {
    Multimodal.ImagePixels.decodePngLuma(content) match {
      case Some((w, h, lum)) => return java.lang.Long.valueOf(hashPixels(w, h, lum))
      case None =>
    }
    Multimodal.AudioSamples.decodePcm16(content) match {
      case Some(samples) => return java.lang.Long.valueOf(hashSeq(samples))
      case None =>
    }
    // uncompressed-DIB AVI: chunk walk, per-frame BGR decode, temporal-sum
    // luma, 2D dHash — cell means divide by the same frame count, so
    // hashing the SUMS compares exactly like hashing the mean frame
    Multimodal.VideoFrames.decodeDibLumaSums(content) match {
      case Some((w, h, sums, _)) => return java.lang.Long.valueOf(hashPixels(w, h, sums))
      case None =>
    }
    // baseline or progressive JPEG (gray or YCbCr): segment walk,
    // entropy decode, dequant, IDCT, upsample/color — legacy
    // header-only JPEGs (no SOS) return None here and keep their
    // COM-payload hash
    Multimodal.JpegGray.decodeJpegLuma(content) match {
      case Some((w, h, lum)) => return java.lang.Long.valueOf(hashPixels(w, h, lum))
      case None =>
    }
    Multimodal.ImageHeader.extractPayload(content)
      .orElse(Multimodal.AudioHeader.extractData(content))
      .orElse(Multimodal.VideoHeader.extractFrame(content)) match {
      case None => null
      case Some(payload) =>
        val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        // codepoint array (surrogate-safe — matches per-character
        // semantics of external engines)
        hashSeq(s.codePoints().toArray)
    }
  }
}
