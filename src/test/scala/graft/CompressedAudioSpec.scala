package graft

import java.io.ByteArrayOutputStream

import graft.multimodal.Multimodal.WavCodec

/** Compressed-audio WAV decode (G.711 A-law/µ-law, IMA ADPCM)
  * against reference ENCODERS implemented independently in this spec
  * from the public CCITT/IMA algorithms — the codec under test never
  * sees the encoder. */
class CompressedAudioSpec extends SparkSpec {

  // ---- reference encoders (spec-side only) ----

  private def mulawCompress(pcmIn: Int): Int = {
    val Bias = 0x84; val Clip = 32635
    var pcm = pcmIn
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > Clip) pcm = Clip
    pcm += Bias
    var exp = 7; var mask = 0x4000
    while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (pcm >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  private def alawCompress(pcmIn: Int): Int = {
    var pcm = pcmIn >> 3 // 16 -> 13 bit
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    val segEnds = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)
    var seg = 0
    while (seg < 8 && pcm > segEnds(seg)) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val aval = (seg << 4) |
        ((if (seg < 2) pcm >> 1 else pcm >> seg) & 0x0f)
      aval ^ mask
    }
  }

  private val Steps = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
  private val IdxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM encode: `chans(c)` is channel c's samples; returns the
    * WAV data-chunk bytes (full blocks only) and frames encoded. */
  private def imaEncode(chans: Array[Array[Short]],
                        samplesPerBlock: Int): (Array[Byte], Int) = {
    val ch = chans.length
    val nBlocks = chans(0).length / samplesPerBlock
    val out = new ByteArrayOutputStream()
    val pred = new Array[Int](ch); val idx = new Array[Int](ch)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * samplesPerBlock
      var c = 0
      while (c < ch) {
        pred(c) = chans(c)(base)
        out.write(pred(c) & 0xff); out.write((pred(c) >> 8) & 0xff)
        out.write(idx(c)); out.write(0)
        c += 1
      }
      val nibbles = Array.fill(ch)(new Array[Int](samplesPerBlock - 1))
      c = 0
      while (c < ch) {
        var s = 1
        while (s < samplesPerBlock) {
          val step = Steps(idx(c))
          var diff = chans(c)(base + s) - pred(c)
          var code = 0
          if (diff < 0) { code = 8; diff = -diff }
          if (diff >= step) { code |= 4; diff -= step }
          if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
          if (diff >= (step >> 2)) code |= 1
          // decoder-arithmetic state update keeps encoder in sync
          var d = step >> 3
          if ((code & 1) != 0) d += step >> 2
          if ((code & 2) != 0) d += step >> 1
          if ((code & 4) != 0) d += step
          pred(c) = if ((code & 8) != 0) pred(c) - d else pred(c) + d
          pred(c) = math.max(-32768, math.min(32767, pred(c)))
          // the 16-entry index table mirrors its low half, so the
          // magnitude bits alone pick the adjustment
          idx(c) = math.max(0, math.min(88, idx(c) + IdxAdj(code & 7)))
          nibbles(c)(s - 1) = code
          s += 1
        }
        c += 1
      }
      // pack: 4-byte groups (8 nibbles, low nibble first) per channel
      var g = 0
      while (g < samplesPerBlock - 1) {
        c = 0
        while (c < ch) {
          var i = 0
          while (i < 4) {
            val lo = if (g + 2 * i < samplesPerBlock - 1) nibbles(c)(g + 2 * i) else 0
            val hi = if (g + 2 * i + 1 < samplesPerBlock - 1) nibbles(c)(g + 2 * i + 1) else 0
            out.write(lo | (hi << 4))
            i += 1
          }
          c += 1
        }
        g += 8
      }
      blk += 1
    }
    (out.toByteArray, nBlocks * samplesPerBlock)
  }

  /** RIFF/WAVE container around a data chunk. */
  private def wavContainer(fmtTag: Int, ch: Int, rate: Int, bits: Int,
                           blockAlign: Int, samplesPerBlock: Int,
                           data: Array[Byte]): Array[Byte] = {
    val ext = fmtTag == 0x11
    val fmtSz = if (ext) 20 else 16
    val bb = new ByteArrayOutputStream()
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    def w32(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
      bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff) }
    def w16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    cc("RIFF"); w32(4 + 8 + fmtSz + 8 + data.length + (data.length & 1)); cc("WAVE")
    cc("fmt "); w32(fmtSz); w16(fmtTag); w16(ch); w32(rate)
    w32(rate * blockAlign); w16(blockAlign); w16(bits)
    if (ext) { w16(2); w16(samplesPerBlock) }
    cc("data"); w32(data.length); bb.write(data)
    if ((data.length & 1) == 1) bb.write(0)
    bb.toByteArray
  }

  private def sine(n: Int, period: Int, amp: Double): Array[Short] =
    Array.tabulate(n)(i =>
      (amp * 32767 * math.sin(2 * math.Pi * i / period)).toShort)

  private def pcm16Wav(chans: Array[Array[Short]], rate: Int): Array[Byte] = {
    val ch = chans.length; val n = chans(0).length
    val data = new Array[Byte](2 * n * ch)
    for (i <- 0 until n; c <- 0 until ch) {
      val v = chans(c)(i)
      data(2 * (i * ch + c)) = (v & 0xff).toByte
      data(2 * (i * ch + c) + 1) = ((v >> 8) & 0xff).toByte
    }
    wavContainer(1, ch, rate, 16, 2 * ch, 0, data)
  }

  private def maxAbsErr(a: Array[Float], b: Array[Float], from: Int = 0): Double =
    (from until math.min(a.length, b.length)).map(i =>
      math.abs(a(i) - b(i)).toDouble).max

  test("G.711 mu-law and A-law WAVs decode to the PCM signal") {
    val s = sine(4000, 64, 0.5)
    val ref = WavCodec.decode(pcm16Wav(Array(s), 8000)).get
    for ((tag, compress) <- Seq((7, mulawCompress _), (6, alawCompress _))) {
      val data = s.map(v => compress(v.toInt).toByte)
      val wav = wavContainer(tag, 1, 8000, 8, 1, 0, data)
      val dec = WavCodec.decode(wav).get
      assert(dec.sampleRate === 8000 && dec.channels === 1)
      assert(dec.samples.length === 4000)
      assert(maxAbsErr(dec.samples, ref.samples) < 0.03,
        s"tag $tag error too large")
      // the perceptual hash survives companding
      val h0 = WavCodec.aHash(ref).get
      val h1 = WavCodec.aHash(dec).get
      assert(java.lang.Long.bitCount(h0 ^ h1) <= 6)
    }
  }

  test("IMA ADPCM mono decodes within codec tolerance") {
    val s = sine(4040, 64, 0.5)
    val spb = 505 // (256 - 4) * 2 + 1 for blockAlign 256
    val (data, nFrames) = imaEncode(Array(s), spb)
    val wav = wavContainer(0x11, 1, 8000, 4, 256, spb, data)
    val dec = WavCodec.decode(wav).get
    assert(dec.samples.length === nFrames)
    val ref = s.map(_ / 32768f)
    // skip the first block's adaptation attack, then tight tolerance
    assert(maxAbsErr(dec.samples, ref, from = 600) < 0.05)
    val rms = math.sqrt((0 until nFrames).map(i =>
      math.pow(dec.samples(i) - ref(i), 2)).sum / nFrames)
    assert(rms < 0.05)
  }

  test("IMA ADPCM stereo keeps channels separated through the interleave") {
    val l = sine(2020, 64, 0.5)
    val r = sine(2020, 20, 0.3)
    val spb = 505
    val (data, nFrames) = imaEncode(Array(l, r), spb)
    val wav = wavContainer(0x11, 2, 8000, 4, 512, spb, data)
    val dec = WavCodec.decode(wav).get
    assert(dec.channels === 2)
    assert(dec.nFrames === nFrames)
    val gotL = Array.tabulate(nFrames)(i => dec.samples(2 * i))
    val gotR = Array.tabulate(nFrames)(i => dec.samples(2 * i + 1))
    assert(maxAbsErr(gotL, l.map(_ / 32768f), from = 600) < 0.05)
    assert(maxAbsErr(gotR, r.map(_ / 32768f), from = 600) < 0.05)
    // channels are genuinely different signals
    assert(maxAbsErr(gotL, gotR) > 0.2)
  }

  test("malformed compressed wavs are rejected, not misread") {
    // ADPCM with blockAlign too small for the channel headers
    val wav = wavContainer(0x11, 2, 8000, 4, 8, 505, new Array[Byte](64))
    assert(WavCodec.decode(wav).isEmpty)
    // unknown compressed format tag (mp3-in-wav) falls out as None
    val mp3ish = wavContainer(0x55, 1, 8000, 0, 1, 0, new Array[Byte](64))
    assert(WavCodec.decode(mp3ish).isEmpty)
  }
}
