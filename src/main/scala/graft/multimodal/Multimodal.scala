package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns beside typed metadata —
  * the Spark-side contract (schema, partition-sized batching,
  * per-partition decoder amortization) is real and tested. IMAGES go
  * through a REAL codec ([[ImageCodec]]: JDK `javax.imageio`
  * PNG/JPEG decode, nearest-neighbor rescale, PNG encode), AUDIO
  * through a REAL PCM RIFF/WAVE codec ([[WavCodec]]), and VIDEO
  * through a REAL MJPEG-in-AVI codec ([[VideoCodec]]: RIFF container
  * parse + per-frame JDK JPEG decode). Only COMPRESSED audio
  * (mp3/ogg) keeps a clearly-marked deterministic STUB because no
  * media libraries ship in this container; swapping `StubCodec` for
  * a real decoder (e.g. javacpp/ffmpeg) changes no plan shape.
  *
  * Scale notes: decode runs inside `mapPartitions` so a real decoder
  * is initialized once per partition (not per row), and rows flow
  * through as an iterator — no materialization of a partition in
  * memory. Binary columns are parquet-encoded and column-pruned like
  * any other: metadata-only queries never read the payload bytes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = true)))

  /** REAL image codec over JDK-only `javax.imageio` — PNG/JPEG/BMP/
    * GIF decode, nearest-neighbor resize, PNG encode. No external
    * deps; runs headless. Audio/video stay on [[StubCodec]] (no
    * media libs in this container). */
  object ImageCodec {
    import java.awt.image.BufferedImage

    def decode(payload: Array[Byte]): Option[BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    /** Deterministic nearest-neighbor scale (no AA, no filtering —
      * bit-reproducible across JVMs, unlike Graphics2D hints). */
    def resizeImage(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * img.getHeight / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * img.getWidth / w).toInt
          out.setRGB(x, y, img.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      out
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 64-bit perceptual difference hash (dHash): nearest-neighbor
      * resize to 9x8, integer-weight luminance, bit j set when
      * lum(x,y) > lum(x+1,y). Robust to rescaling / recompression /
      * small edits — the image analog of SimHash, and exactly what
      * pairs with [[graft.dedup.NearDup.hammingPairs64]] for
      * perceptual image dedup. Pure integer arithmetic end-to-end,
      * so the hash is bit-reproducible across JVMs. */
    def dHash(img: BufferedImage): Long = {
      val g = resizeImage(img, 9, 8)
      def lum(px: Int): Int = {
        val r = (px >> 16) & 0xff; val gn = (px >> 8) & 0xff; val b = px & 0xff
        (299 * r + 587 * gn + 114 * b) / 1000
      }
      var h = 0L
      var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (lum(g.getRGB(x, y)) > lum(g.getRGB(x + 1, y))) h |= (1L << bit)
          bit += 1
          x += 1
        }
        y += 1
      }
      h
    }
  }

  /** REAL audio codec for RIFF/WAVE payloads — JDK-only manual
    * header parse + sample decode. Uncompressed: 8/16-bit PCM
    * (format tag 1), any channel count. COMPRESSED encodings with
    * public table-driven decodes are decoded natively too:
    * G.711 A-law (tag 6) and µ-law (tag 7) logarithmic companding
    * (2:1, the telephony standard), and IMA/DVI ADPCM (tag 0x11,
    * 4:1 adaptive delta PCM with per-block predictor state and the
    * standard 89-entry step table). Perceptual-media formats that
    * need external libs (mp3/ogg/aac) still fall back to
    * [[StubCodec]]. */
  object WavCodec {

    /** G.711 µ-law byte → 16-bit linear (CCITT reference expand). */
    private[multimodal] def mulawExpand(uIn: Int): Int = {
      val u = ~uIn & 0xff
      var t = ((u & 0x0f) << 3) + 0x84
      t <<= (u & 0x70) >> 4
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }

    /** G.711 A-law byte → 16-bit linear (CCITT reference expand). */
    private[multimodal] def alawExpand(aIn: Int): Int = {
      val a = (aIn ^ 0x55) & 0xff
      var t = (a & 0x0f) << 4
      val seg = (a & 0x70) >> 4
      if (seg == 0) t += 8
      else { t += 0x108; if (seg > 1) t <<= seg - 1 }
      if ((a & 0x80) != 0) t else -t
    }

    private val ImaStepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
      37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
      544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
      1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
      4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
      12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
      29794, 32767)

    private val ImaIndexTable: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

    /** Decode one IMA ADPCM block (WAV layout: per-channel 4-byte
      * header, then channel data interleaved in 4-byte groups) into
      * `out` starting at frame `outFrame`. Returns frames decoded. */
    private def decodeImaBlock(b: Array[Byte], blockOff: Int, blockLen: Int,
                               ch: Int, samplesPerBlock: Int,
                               out: Array[Float], outFrame: Int): Int = {
      val pred = new Array[Int](ch)
      val idx = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        val o = blockOff + 4 * c
        pred(c) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort.toInt
        idx(c) = math.min(88, math.max(0, b(o + 2) & 0xff))
        // header carries sample 0 of the block
        out((outFrame * ch) + c) = pred(c) / 32768f
        c += 1
      }
      var frame = 1 // frames decoded within this block (0 = header)
      var dataOff = blockOff + 4 * ch
      val blockEnd = blockOff + blockLen
      while (frame < samplesPerBlock && dataOff + 4 * ch <= blockEnd) {
        // one interleave group: 4 bytes (8 nibbles = 8 frames) per channel
        var g = 0
        while (g < 8 && frame + g < samplesPerBlock) {
          c = 0
          while (c < ch) {
            val byte = b(dataOff + 4 * c + g / 2) & 0xff
            val n = if (g % 2 == 0) byte & 0x0f else (byte >> 4) & 0x0f
            val step = ImaStepTable(idx(c))
            var diff = step >> 3
            if ((n & 1) != 0) diff += step >> 2
            if ((n & 2) != 0) diff += step >> 1
            if ((n & 4) != 0) diff += step
            pred(c) = if ((n & 8) != 0) pred(c) - diff else pred(c) + diff
            if (pred(c) > 32767) pred(c) = 32767
            if (pred(c) < -32768) pred(c) = -32768
            idx(c) = math.min(88, math.max(0, idx(c) + ImaIndexTable(n)))
            out((outFrame + frame + g) * ch + c) = pred(c) / 32768f
            c += 1
          }
          g += 1
        }
        frame += 8
        dataOff += 4 * ch
      }
      math.min(frame, samplesPerBlock)
    }
    final case class Wav(sampleRate: Int, channels: Int, bits: Int,
                         samples: Array[Float]) {
      def nFrames: Int = if (channels == 0) 0 else samples.length / channels
      def durationMs: Long =
        if (sampleRate == 0) 0L else nFrames * 1000L / sampleRate
    }

    def decode(b: Array[Byte]): Option[Wav] = {
      if (b == null || b.length < 44) return None
      def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12L
      var rate = 0; var ch = 0; var bits = 0; var fmtTag = 0
      var blockAlign = 0; var samplesPerBlock = 0; var fmtOk = false
      var samples: Array[Float] = null
      var corrupt = false
      while (!corrupt && off + 8 <= b.length) {
        val o = off.toInt
        val id = tag(o); val sz = le32(o + 4)
        if (sz < 0) corrupt = true // malformed size: bail, don't spin
        else {
          if (id == "fmt " && o + 24 <= b.length) {
            fmtTag = le16(o + 8)
            ch = le16(o + 10); rate = le32(o + 12)
            blockAlign = le16(o + 20); bits = le16(o + 22)
            // samplesPerBlock rides in the fmt extension for ADPCM;
            // derivable from blockAlign when the extension is absent
            samplesPerBlock =
              if (sz >= 20 && o + 28 <= b.length) le16(o + 26)
              else if (ch > 0) (blockAlign - 4 * ch) * 2 / ch + 1
              else 0
            fmtOk = ch > 0 && rate > 0 && (fmtTag match {
              case 1 => bits == 8 || bits == 16 // linear PCM
              case 6 | 7 => bits == 8 // G.711 A-law / µ-law
              case 0x11 => bits == 4 && blockAlign > 4 * ch &&
                samplesPerBlock > 0 // IMA/DVI ADPCM
              case _ => false
            })
          } else if (id == "data" && fmtOk && samples == null) {
            val n = math.max(0, math.min(sz, b.length - o - 8))
            samples = fmtTag match {
              case 1 =>
                if (bits == 16) Array.tabulate(n / 2)(i =>
                  le16(o + 8 + 2 * i).toShort.toFloat / 32768f)
                else Array.tabulate(n)(i =>
                  ((b(o + 8 + i) & 0xff) - 128).toFloat / 128f)
              case 6 => Array.tabulate(n)(i =>
                alawExpand(b(o + 8 + i) & 0xff) / 32768f)
              case 7 => Array.tabulate(n)(i =>
                mulawExpand(b(o + 8 + i) & 0xff) / 32768f)
              case 0x11 =>
                val nBlocks = n / blockAlign
                val out = new Array[Float](nBlocks * samplesPerBlock * ch)
                var blk = 0; var outFrame = 0
                while (blk < nBlocks) {
                  outFrame += decodeImaBlock(b, o + 8 + blk * blockAlign,
                    blockAlign, ch, samplesPerBlock, out, outFrame)
                  blk += 1
                }
                if (outFrame * ch == out.length) out
                else java.util.Arrays.copyOf(out, outFrame * ch)
              case _ => null // unreachable: fmtOk gates the tags above
            }
          }
          off += 8L + sz + (sz & 1) // word-aligned; long math, no overflow
        }
      }
      if (!corrupt && samples != null) Some(Wav(rate, ch, bits, samples)) else None
    }

    /** 8 deterministic features: frames, rate, channels, duration,
      * RMS, peak, zero-crossing count, mean. */
    def features(w: Wav): Array[Float] = {
      val s = w.samples
      if (s.isEmpty) return Array(0f, w.sampleRate.toFloat, w.channels.toFloat,
        0f, 0f, 0f, 0f, 0f)
      var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
      var i = 0
      while (i < s.length) {
        val v = s(i)
        sum += v; sq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (s(i - 1) >= 0) != (v >= 0)) zc += 1
        i += 1
      }
      Array(w.nFrames.toFloat, w.sampleRate.toFloat, w.channels.toFloat,
        w.durationMs.toFloat, math.sqrt(sq / s.length).toFloat,
        peak.toFloat, zc.toFloat, (sum / s.length).toFloat)
    }

    /** 64-bit audio perceptual hash — the dHash idea applied to a
      * tiny spectrogram: the mono mix splits into 9 equal time
      * windows, each window gets 8 Goertzel band energies (bands at
      * rate·(k+1)/32, all below Nyquist), and bit (t·8 + b) is set
      * when band b's energy RISES from window t to t+1. Uniform
      * amplitude scaling (volume) multiplies every energy by the
      * same factor, so the adjacent-window comparisons — and the
      * hash — are volume-invariant; a different tone flips the band
      * pattern. JDK-only, deterministic sequential arithmetic.
      * Clips with fewer mono samples than time windows have no
      * spectral structure to hash — they are UNHASHABLE (None), not
      * hash 0: collapsing every ultra-short clip onto the 0L bucket
      * would report all of them as mutual distance-0 near-dups. */
    def aHash(w: Wav): Option[Long] = {
      val nWin = 9; val nBands = 8
      val mono: Array[Double] = {
        val ch = math.max(w.channels, 1)
        val n = w.samples.length / ch
        Array.tabulate(n) { i =>
          var s = 0.0; var c = 0
          while (c < ch) { s += w.samples(i * ch + c); c += 1 }
          s / ch
        }
      }
      if (mono.length < nWin) return None
      def bandEnergy(lo: Int, hi: Int, band: Int): Double = {
        // Goertzel at f = rate*(band+1)/32 over mono[lo, hi)
        val wNorm = 2.0 * math.Pi * (band + 1) / 32.0
        val coeff = 2.0 * math.cos(wNorm)
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var i = lo
        while (i < hi) {
          s0 = mono(i) + coeff * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        s1 * s1 + s2 * s2 - coeff * s1 * s2
      }
      val e = Array.tabulate(nWin, nBands) { (t, b) =>
        val lo = (t.toLong * mono.length / nWin).toInt
        val hi = ((t + 1).toLong * mono.length / nWin).toInt
        bandEnergy(lo, hi, b)
      }
      var h = 0L
      var t = 0
      while (t < nWin - 1) {
        var b = 0
        while (b < nBands) {
          if (e(t + 1)(b) > e(t)(b)) h |= (1L << (t * nBands + b))
          b += 1
        }
        t += 1
      }
      Some(h)
    }
  }

  /** REAL video codec for MJPEG-in-AVI payloads — JDK-only RIFF
    * container parse (the same chunk grammar as WAV) + per-frame
    * `javax.imageio` JPEG decode. MJPEG is the classic
    * capture/surveillance interchange format: each frame is an
    * independent JPEG, so decode is embarrassingly parallel and
    * needs no inter-frame state — exactly the codec you CAN do pure-
    * JVM. Inter-coded formats (H.264/VP9) still need external libs
    * and fall back to [[StubCodec]].
    *
    * Container grammar: `RIFF('AVI ' LIST('hdrl' 'avih' ...)
    * LIST('movi' '00dc'/'00db' <jpeg bytes> ...))`; chunks are
    * even-aligned. `avih` carries µs/frame + width/height. The
    * parser scans top-level LISTs, so index chunks (`idx1`) and
    * extra stream headers are skipped gracefully. */
  object VideoCodec {
    /** Decoded container: per-frame JPEG payloads (lazily decodable
      * via [[decodeFrame]]) + timing metadata. */
    final case class Video(width: Int, height: Int, usPerFrame: Long,
                           frames: IndexedSeq[Array[Byte]]) {
      def nFrames: Int = frames.length
      def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
    }

    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Strict-but-tolerant parse; None for anything that is not a
      * well-formed MJPEG AVI (corrupt rows must not kill a batch —
      * same contract as [[ImageCodec.decode]]/[[WavCodec.decode]]). */
    def decode(payload: Array[Byte]): Option[Video] = {
      if (payload == null || payload.length < 24) return None
      if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
      var usPerFrame = 0L; var w = 0; var h = 0
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      var ok = true

      def scanChunks(lo: Int, hi: Int, inMovi: Boolean, inHdrl: Boolean): Unit = {
        var p = lo
        while (ok && p + 8 <= hi) {
          val id = fourcc(payload, p)
          val sz = u32(payload, p + 4)
          if (sz < 0 || p + 8 + sz > hi) { ok = false; return }
          val body = p + 8
          val bodyEnd = body + sz.toInt
          if (id == "LIST" && sz >= 4) {
            val listType = fourcc(payload, body)
            scanChunks(body + 4, bodyEnd,
              inMovi || listType == "movi", inHdrl || listType == "hdrl")
          } else if (inHdrl && id == "avih" && sz >= 40) {
            usPerFrame = u32(payload, body)
            w = u32(payload, body + 32).toInt
            h = u32(payload, body + 36).toInt
          } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db")) && sz > 0) {
            frames += java.util.Arrays.copyOfRange(payload, body, bodyEnd)
          }
          p = bodyEnd + (sz.toInt & 1) // even alignment
        }
      }
      scanChunks(12, math.min(payload.length, 8 + u32(payload, 4).toInt + 8), false, false)
      val fr = frames.result()
      if (!ok || fr.isEmpty || usPerFrame <= 0) None
      else Some(Video(w, h, usPerFrame, fr))
    }

    /** One frame's pixels via the real JDK JPEG decoder. */
    def decodeFrame(jpegBytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      ImageCodec.decode(jpegBytes)

    /** Minimal MJPEG-AVI writer (spec fixtures + interop export):
      * avih + one 'vids'/'MJPG' stream header + movi of '00dc' JPEG
      * chunks. Readable by this codec and by standard players. */
    def encode(frames: Seq[java.awt.image.BufferedImage], usPerFrame: Long): Array[Byte] = {
      require(frames.nonEmpty && usPerFrame > 0)
      val jpegs = frames.map { img0 =>
        // the JDK JPEG writer rejects alpha channels (returns false,
        // writes nothing) — drop alpha via a deterministic per-pixel
        // copy, never Graphics2D (rendering hints are JVM-variable)
        val img =
          if (img0.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) img0
          else {
            val rgb = new java.awt.image.BufferedImage(img0.getWidth,
              img0.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < img0.getHeight) {
              var x = 0
              while (x < img0.getWidth) {
                rgb.setRGB(x, y, img0.getRGB(x, y) & 0xffffff)
                x += 1
              }
              y += 1
            }
            rgb
          }
        val bos = new java.io.ByteArrayOutputStream()
        if (!javax.imageio.ImageIO.write(img, "jpg", bos))
          throw new IllegalStateException("JDK JPEG writer refused frame")
        bos.toByteArray
      }
      val w = frames.head.getWidth; val h = frames.head.getHeight
      val bb = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
        bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
      }
      def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
      // sizes, computed inner-out
      val strf = 40L // BITMAPINFOHEADER
      val strh = 56L
      val strl = 4 + 8 + strh + 8 + strf
      val avih = 56L
      val hdrl = 4 + 8 + avih + 8 + strl
      val moviBody = jpegs.map(j => 8L + j.length + (j.length & 1)).sum
      val movi = 4 + moviBody
      val riff = 4 + 8 + hdrl + 8 + movi
      cc("RIFF"); w32(riff); cc("AVI ")
      cc("LIST"); w32(hdrl); cc("hdrl")
      cc("avih"); w32(avih)
      w32(usPerFrame); w32(0); w32(0); w32(0) // usPerFrame, maxBps, pad, flags
      w32(jpegs.length); w32(0); w32(1); w32(0) // totalFrames, initial, streams, bufSz
      w32(w); w32(h); w32(0); w32(0); w32(0); w32(0) // width, height, reserved[4]
      cc("LIST"); w32(strl); cc("strl")
      cc("strh"); w32(strh)
      cc("vids"); cc("MJPG")
      w32(0); w32(0); w32(0) // flags, prio+lang, initialFrames
      w32(usPerFrame); w32(1000000L) // scale, rate (rate/scale = fps)
      w32(0); w32(jpegs.length); w32(0); w32(0); w32(0) // start, length, bufSz, quality, sampleSz
      w32(0); w32((h.toLong << 16) | w.toLong) // rcFrame
      cc("strf"); w32(strf)
      w32(40); w32(w); w32(h); w32((24 << 16) | 1) // biSize, w, h, planes|bpp
      cc("MJPG"); w32(w.toLong * h * 3); w32(0); w32(0); w32(0); w32(0)
      cc("LIST"); w32(movi); cc("movi")
      jpegs.foreach { j =>
        cc("00dc"); w32(j.length); bb.write(j)
        if ((j.length & 1) == 1) bb.write(0)
      }
      bb.toByteArray
    }

    /** 64-bit perceptual video hash: per-frame [[ImageCodec.dHash]],
      * then a PER-BIT MAJORITY VOTE across frames — stable under
      * re-encode/rescale (each frame hash is) AND under dropping or
      * duplicating a few frames (majorities don't move), which is
      * what distinguishes a temporal hash from hashing one frame.
      * Feeds [[graft.dedup.NearDup.hammingPairs64]] like the image
      * and audio hashes. None when no frame decodes. */
    def vHash(v: Video): Option[Long] = {
      val hashes = v.frames.flatMap(f => decodeFrame(f).map(ImageCodec.dHash))
      if (hashes.isEmpty) return None
      var h = 0L
      var bit = 0
      while (bit < 64) {
        var ones = 0
        hashes.foreach(x => if (((x >> bit) & 1L) == 1L) ones += 1)
        if (ones * 2 >= hashes.length) h |= (1L << bit)
        bit += 1
      }
      Some(h)
    }

    /** 8 real video features: n_frames, width, height, duration_ms,
      * mean luma of first / middle / last frames, mean inter-frame
      * luma delta (motion proxy). Integer pixel statistics over the
      * REAL decode, bit-reproducible. */
    def features(v: Video): Array[Float] = {
      def meanLuma(bytes: Array[Byte]): Float = decodeFrame(bytes).map { img =>
        var s = 0L; var n = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            s += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
            n += 1; x += 1
          }
          y += 1
        }
        if (n == 0) 0f else (s.toDouble / n).toFloat
      }.getOrElse(0f)
      val first = meanLuma(v.frames.head)
      val mid = meanLuma(v.frames(v.nFrames / 2))
      val last = meanLuma(v.frames.last)
      val motion =
        if (v.nFrames < 2) 0f
        else {
          val lumas = v.frames.map(meanLuma)
          (lumas.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum /
            (v.nFrames - 1)).toFloat
        }
      Array(v.nFrames.toFloat, v.width.toFloat, v.height.toFloat,
        v.durationMs.toFloat, first, mid, last, motion)
    }
  }

  /** 8 deterministic image features: width, height, mean A/R/G/B,
    * min/max luma — real pixel statistics over the decoded image. */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sa, sr, sg, sb) = (0L, 0L, 0L, 0L)
    var minL = 255.0; var maxL = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val (a, r, g, b) = ((p >>> 24) & 0xff, (p >>> 16) & 0xff,
          (p >>> 8) & 0xff, p & 0xff)
        sa += a; sr += r; sg += g; sb += b
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    Array(w.toFloat, h.toFloat, (sa / n).toFloat, (sr / n).toFloat,
      (sg / n).toFloat, (sb / n).toFloat, minL.toFloat, maxL.toFloat)
  }

  /** STUB codec: deterministic byte-statistics "decode" standing in
    * for codecs that need external libs (compressed audio — mp3/ogg
    * — and inter-coded video — H.264/VP9; MJPEG-AVI video decodes
    * for real via [[VideoCodec]]). Real plumbing, fake math. */
  object StubCodec {
    /** ??? real decoder goes here; deterministic fake: 8 moments of
      * the byte histogram as the "feature vector". */
    def extractFeature(payload: Array[Byte]): Array[Float] = {
      if (payload == null || payload.isEmpty) return Array.fill(8)(0.0f)
      val hist = new Array[Long](256)
      payload.foreach(b => hist(b & 0xff) += 1)
      val n = payload.length.toDouble
      val mean = payload.map(b => (b & 0xff).toDouble).sum / n
      Array(
        n.toFloat, mean.toFloat,
        hist.max.toFloat, hist.count(_ > 0).toFloat,
        (payload.head & 0xff).toFloat, (payload.last & 0xff).toFloat,
        hist.indexOf(hist.max).toFloat,
        (payload.map(b => (b & 0xff).toDouble - mean).map(d => d * d).sum / n).toFloat)
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (payload = utf-8 bytes of text — a stand-in binary source). */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(64).as("width"), lit(64).as("height"),
      (col("n_chars") * 10L).as("duration_ms"))

  case class MediaIn(media_id: Long, media_type: String, payload: Array[Byte])
  case class FeatureOut(media_id: Long, media_type: String, n_bytes: Long,
                        feature: Array[Float])

  /** Feature extraction over binary payloads: Dataset.mapPartitions
    * (typed, Encoder-backed — no RDD round-trip) so a real decoder
    * initializes once per partition and rows stream through as an
    * iterator. Images and PCM WAV audio go through the REAL codecs
    * (pixel / sample statistics); undecodable payloads and video
    * fall back to the deterministic stub. Every variant emits 8
    * floats, so the schema is codec-independent. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[MediaIn]
      .mapPartitions { it =>
        // per-partition decoder init would happen here
        it.map { m =>
          val feature = m.media_type match {
            case "image" => ImageCodec.decode(m.payload).map(imageFeatures)
              .getOrElse(StubCodec.extractFeature(m.payload))
            case "audio" => WavCodec.decode(m.payload).map(WavCodec.features)
              .getOrElse(StubCodec.extractFeature(m.payload))
            case "video" => VideoCodec.decode(m.payload).map(VideoCodec.features)
              .getOrElse(StubCodec.extractFeature(m.payload))
            case _ => StubCodec.extractFeature(m.payload)
          }
          FeatureOut(m.media_id, m.media_type,
            if (m.payload == null) 0L else m.payload.length.toLong, feature)
        }
      }.toDF()
  }

  /** Image resize: payload -> payload at (w, h), metadata updated.
    * Encoder-backed Dataset.mapPartitions with a row encoder (no RDD
    * round-trip) so the FULL input schema — including any caller
    * extras like uri/caption — passes through unchanged; images go
    * through the REAL `javax.imageio` decode -> nearest-neighbor
    * rescale -> PNG encode; non-image payloads (audio/video) keep
    * the deterministic stub byte-subsample. Narrow op — no shuffle;
    * a real codec initializes per partition, rows stream through as
    * an iterator. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = media.schema
    val pi = schema.fieldIndex("payload")
    val wi = schema.fieldIndex("width")
    val hi = schema.fieldIndex("height")
    val ti = schema.fieldIndex("media_type")
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { it =>
      // per-partition decoder init would happen here
      it.map { r =>
        val payload = if (r.isNullAt(pi)) null else r.getAs[Array[Byte]](pi)
        val mediaType = if (r.isNullAt(ti)) null else r.getString(ti)
        val resized =
          if (payload == null) null
          else if (mediaType == "image")
            ImageCodec.decode(payload) match {
              case Some(img) =>
                ImageCodec.encodePng(ImageCodec.resizeImage(img, w, h))
              case None => stubResize(payload, w, h) // not a decodable image
            }
          else if (mediaType == "video")
            VideoCodec.decode(payload) match {
              case Some(v) => // real per-frame rescale, re-encoded MJPEG
                VideoCodec.encode(v.frames.flatMap(VideoCodec.decodeFrame)
                  .map(ImageCodec.resizeImage(_, w, h)), v.usPerFrame)
              case None => stubResize(payload, w, h)
            }
          else stubResize(payload, w, h)
        org.apache.spark.sql.Row.fromSeq(Seq.tabulate(schema.length) { i =>
          if (i == pi) resized
          else if (i == wi) w
          else if (i == hi) h
          else r.get(i)
        })
      }
    }
  }

  case class DHashOut(media_id: Long, dhash: Option[Long])

  /** Perceptual hashes for every decodable image payload: typed
    * mapPartitions through the REAL codec (decode once per row,
    * stream as an iterator), 64-bit [[ImageCodec.dHash]] out,
    * undecodable rows get NULL. Narrow op — no shuffle. */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select("media_id", "media_type", "payload").as[MediaIn]
      .mapPartitions { it =>
        it.map(m => DHashOut(m.media_id,
          ImageCodec.decode(m.payload).map(ImageCodec.dHash)))
      }.toDF()
  }

  /** Perceptual image near-dup pairs: dHash + the pigeonhole-exact
    * banded Hamming join ([[graft.dedup.NearDup.hammingPairs64]]) —
    * the image-side twin of SimHash text dedup. Rescaled,
    * re-encoded or lightly edited copies land within `maxDist` bits;
    * the band join keeps the plan subquadratic (never all-pairs). */
  def imageNearDupPairs(media: DataFrame, maxDist: Int = 6): DataFrame =
    graft.dedup.NearDup.hammingPairs64(
      imageDHashes(media), "media_id", "dhash", maxDist)

  /** Perceptual hashes for every decodable PCM-WAV payload
    * ([[WavCodec.aHash]]); undecodable rows AND sub-window (too
    * short to hash) clips get NULL. Narrow op. */
  def audioAHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select("media_id", "media_type", "payload").as[MediaIn]
      .mapPartitions { it =>
        it.map(m => DHashOut(m.media_id,
          WavCodec.decode(m.payload).flatMap(WavCodec.aHash)))
      }.toDF()
  }

  /** Perceptual audio near-dup pairs — volume-shifted or re-encoded
    * copies land within `maxDist` bits of the spectrogram hash;
    * same banded subquadratic join as the image path. */
  def audioNearDupPairs(media: DataFrame, maxDist: Int = 6): DataFrame =
    graft.dedup.NearDup.hammingPairs64(
      audioAHashes(media), "media_id", "dhash", maxDist)

  /** Stub scaler for non-image media: sample w*h bytes evenly. */
  private def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.min(w * h, payload.length)
    Array.tabulate(n)(i => payload((i.toLong * payload.length / n).toInt))
  }

  // private[multimodal], not private: a Scala-private nested class
  // compiles to a bytecode-private accessor that Janino-generated
  // encoder code cannot call — the projection silently falls back to
  // interpreter mode (WARN UnsafeProjection). Package-private stays
  // out of the public API but keeps codegen on.
  private[multimodal] case class FrameOut(media_id: Long, frame_idx: Long,
                                          frame_ts_ms: Long, frame_bytes: Array[Byte])

  /** REAL video frame sampling: decode each MJPEG-AVI payload
    * ([[VideoCodec]]) and emit one row per sampled frame at
    * `everyMs` intervals across the clip — `frame_bytes` is the
    * frame's actual JPEG, ready for [[ImageCodec.decode]] /
    * [[ImageCodec.dHash]] downstream. The 1→N fanout happens inside
    * `mapPartitions` via a lazy iterator (no per-partition
    * materialization of all frames); undecodable payloads yield no
    * rows — same corrupt-row contract as the other codecs. Narrow
    * op: sampling shuffles nothing. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, "everyMs must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select("media_id", "media_type", "payload").as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          VideoCodec.decode(m.payload).iterator.flatMap { v =>
            val n = math.max(1L, v.durationMs / everyMs)
            (0L until n).iterator.map { i =>
              val ts = i * everyMs
              val idx = math.min(v.nFrames - 1L, ts * 1000L / v.usPerFrame)
              FrameOut(m.media_id, idx, ts, v.frames(idx.toInt))
            }
          }
        }
      }.toDF()
  }

  /** Perceptual hashes for every decodable MJPEG-AVI payload
    * ([[VideoCodec.vHash]]); undecodable rows get NULL. Narrow. */
  def videoVHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select("media_id", "media_type", "payload").as[MediaIn]
      .mapPartitions { it =>
        it.map(m => DHashOut(m.media_id,
          VideoCodec.decode(m.payload).flatMap(VideoCodec.vHash)))
      }.toDF()
  }

  /** Perceptual video near-dup pairs — re-encoded / rescaled /
    * few-frames-trimmed copies land within `maxDist` bits of the
    * majority-vote temporal hash; same banded subquadratic join as
    * the image and audio paths. */
  def videoNearDupPairs(media: DataFrame, maxDist: Int = 6): DataFrame =
    graft.dedup.NearDup.hammingPairs64(
      videoVHashes(media), "media_id", "dhash", maxDist)
}
