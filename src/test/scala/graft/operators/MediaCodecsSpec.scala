package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodecs._

/** Round-trip and malformed-input coverage for the real pure-Scala
  * media codecs: the decoders must read back exactly the logical
  * pixel/sample stream the encoders were given (despite BGR bottom-up
  * padded storage in BMP, header grammar in PPM, and chunk walking in
  * WAV), and fail loudly — or sniff to `unknown` — on garbage.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def pix(i: Int): Int = (i * 31 + 7) % 256

  test("BMP round-trips the logical RGB stream through padded BGR bottom-up rows") {
    // width 5 → row stride 15 → pad 1: exercises the padding arithmetic
    val b = Bmp.encode(5, 3, pix)
    assert(b.length == Bmp.encodedLength(5, 3))
    assert(b.length == 54 + 3 * (5 * 3 + 1))
    val d = Bmp.decode(b)
    assert((d.width, d.height, d.channels, d.format) == ((5, 3, 3, "bmp")))
    assert(d.payload.toSeq == (0 until 5 * 3 * 3).map(i => pix(i).toByte))
    // storage really is BGR bottom-up: first stored pixel is the
    // bottom-left logical pixel with R and B swapped
    val bottomLeft = (2 * 5 + 0) * 3
    assert((b(54) & 0xff) == pix(bottomLeft + 2)) // B first
    assert((b(56) & 0xff) == pix(bottomLeft))     // R last
  }

  test("BMP decodes top-down (negative height) files too") {
    val up = Bmp.encode(4, 2, pix) // pad 0 at width 4
    // flip to top-down: negate height, reorder rows
    val down = up.clone()
    val h = -2
    down(22) = h.toByte; down(23) = (h >> 8).toByte
    down(24) = (h >> 16).toByte; down(25) = (h >> 24).toByte
    val row = 4 * 3
    val tmp = down.slice(54, 54 + row)
    System.arraycopy(down, 54 + row, down, 54, row)
    System.arraycopy(tmp, 0, down, 54 + row, row)
    assert(Bmp.decode(down).payload.toSeq == Bmp.decode(up).payload.toSeq)
  }

  test("BMP rejects wrong bpp/compression/truncation") {
    val b = Bmp.encode(3, 3, pix)
    val bad = b.clone(); bad(28) = 8 // 8 bpp
    intercept[IllegalArgumentException](Bmp.decode(bad))
    intercept[IllegalArgumentException](Bmp.decode(b.take(40)))
  }

  test("PPM round-trips and honors comments in the header") {
    val p = Ppm.encode(7, 2, pix)
    assert(p.length == Ppm.encodedLength(7, 2))
    val d = Ppm.decode(p)
    assert((d.width, d.height, d.format) == ((7, 2, "ppm")))
    assert(d.payload.toSeq == (0 until 7 * 2 * 3).map(i => pix(i).toByte))
    // inject a comment between tokens — the netpbm grammar allows it
    val withComment = "P6\n# a comment\n7 2\n255\n".getBytes("US-ASCII") ++
      p.drop("P6\n7 2\n255\n".length)
    assert(Ppm.decode(withComment).payload.toSeq == d.payload.toSeq)
  }

  test("WAV round-trips samples and walks unknown chunks") {
    val w = Wav.encode(10, 2, 8000, i => (i * 257 - 5) & 0xffff)
    assert(w.length == Wav.encodedLength(10, 2))
    val d = Wav.decode(w)
    assert((d.width, d.height, d.channels, d.format) == ((10, 8000, 2, "wav")))
    // payload = little-endian i16 stream, byte-exact
    assert(d.payload.toSeq == w.drop(44).toSeq)
    // splice a LIST chunk between fmt and data — the walk must skip it
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = w.take(36) ++ list ++ w.drop(36)
    // fix the RIFF size field
    val sz = spliced.length - 8
    spliced(4) = sz.toByte; spliced(5) = (sz >> 8).toByte
    spliced(6) = (sz >> 16).toByte; spliced(7) = (sz >> 24).toByte
    assert(Wav.decode(spliced).payload.toSeq == d.payload.toSeq)
  }

  test("sniffDecode dispatches on magic and degrades to unknown") {
    assert(sniffDecode(Bmp.encode(3, 2, pix)).format == "bmp")
    assert(sniffDecode(Ppm.encode(3, 2, pix)).format == "ppm")
    assert(sniffDecode(Wav.encode(4, 1, 8000, _ => 0)).format == "wav")
    assert(sniffDecode("not media at all".getBytes).format == "unknown")
    // right magic, corrupt body → unknown, not an exception (a corrupt
    // blob must not kill a partition)
    assert(sniffDecode("RIFFxxxxWAVE".getBytes).format == "unknown")
    assert(sniffDecode(Array[Byte]('B', 'M', 1, 2)).format == "unknown")
  }

  test("PixelHistogramExtractor histograms decoded pixels, not raw bytes") {
    val fx = new PixelHistogramExtractor(8)
    // constant-white image: every pixel 255 → all mass in the top bin,
    // and the L2-normalized vector is exactly (0,...,0,1) — a raw-byte
    // histogram would see header bytes and padding and miss this
    val v = fx.extract(Bmp.encode(5, 3, _ => 255))
    assert(v.toSeq == Seq.fill(7)(0.0f) :+ 1.0f)
    // hand-computed two-bin check: pixels 0 and 255 half-and-half
    val v2 = fx.extract(Ppm.encode(2, 1, i => if (i < 3) 0 else 255))
    val e = (3.0 / math.sqrt(18.0)).toFloat
    assert(v2.toSeq == Seq(e, 0f, 0f, 0f, 0f, 0f, 0f, e))
    // unknown container → zero vector (no payload)
    assert(fx.extract("junk".getBytes).toSeq == Seq.fill(8)(0.0f))
  }

  test("PNG round-trips through every filter type and both odd and even widths") {
    // scanlines cycle all five predictors; width 5 exercises bpp-offset
    // edges (first pixel of a row has no left neighbor)
    for ((w, h) <- Seq((5, 7), (1, 5), (8, 1), (16, 16))) {
      val b = Png.encode(w, h, 3, pix, row => row % 5)
      val d = Png.decode(b)
      assert((d.width, d.height, d.channels, d.format) == ((w, h, 3, "png")))
      assert(d.payload.toSeq == (0 until w * h * 3).map(i => pix(i).toByte),
        s"pixel mismatch at ${w}x$h")
    }
  }

  test("PNG decodes grayscale and RGBA color types") {
    val g = Png.decode(Png.encode(6, 4, 1, pix, row => (row + 1) % 5))
    assert((g.channels, g.format) == ((1, "png")))
    assert(g.payload.toSeq == (0 until 6 * 4).map(i => pix(i).toByte))
    val a = Png.decode(Png.encode(3, 3, 4, pix, row => (row + 3) % 5))
    assert(a.channels == 4)
    assert(a.payload.toSeq == (0 until 3 * 3 * 4).map(i => pix(i).toByte))
  }

  test("PNG decodes the cli timeline encoder's output (pHYs chunk skipped)") {
    // graft.cli.Png writes filter-0 RGB with a pHYs ancillary chunk —
    // the production decoder must walk past it and agree on pixels
    val rgb = Array.tabulate(4 * 3)(i => (pix(i * 3) << 16) | (pix(i * 3 + 1) << 8) | pix(i * 3 + 2))
    val d = Png.decode(graft.cli.Png.encode(4, 3, rgb))
    assert((d.width, d.height, d.channels) == ((4, 3, 3)))
    val expect = rgb.flatMap(c =>
      Seq(((c >>> 16) & 0xff).toByte, ((c >>> 8) & 0xff).toByte, (c & 0xff).toByte))
    assert(d.payload.toSeq == expect.toSeq)
  }

  test("PNG rejects corruption loudly; sniffDecode degrades it to unknown") {
    val good = Png.encode(4, 4, 3, pix, row => row % 5)
    // flip a byte inside IDAT → CRC catches it
    val bitflip = good.clone()
    bitflip(good.length - 20) = (bitflip(good.length - 20) ^ 0x40).toByte
    intercept[IllegalArgumentException](Png.decode(bitflip))
    // truncation mid-chunk
    intercept[IllegalArgumentException](Png.decode(good.take(good.length - 10)))
    // interlaced flag set (with CRC fixed up) → explicit rejection
    assert(sniffDecode(bitflip).format == "unknown")
    assert(sniffDecode(good.take(20)).format == "unknown")
    assert(sniffDecode(good).format == "png")
  }

  test("AVI container round-trips frame payloads incl. odd lengths") {
    import MediaCodecs.Avi
    val frames = Seq(
      Array[Byte](1, 2, 3),           // odd — exercises word alignment
      Array[Byte](4, 5, 6, 7),
      Array.tabulate(33)(i => (i * 7).toByte))
    val avi = Avi.encode(16, 8, frames)
    val back = Avi.decodeFrames(avi)
    assert(back.size == 3)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // corrupt container rejects instead of returning garbage
    intercept[IllegalArgumentException](Avi.decodeFrames(avi.take(10)))
    intercept[IllegalArgumentException](
      Avi.decodeFrames("RIFFxxxxWAVE".getBytes("US-ASCII")))
    // truncated mid-chunk
    intercept[IllegalArgumentException](Avi.decodeFrames(avi.take(avi.length - 5)))
  }

  test("GIF round trip: literal stream incl. width growth and table resets") {
    import MediaCodecs.Gif
    // small image
    val small = Gif.encode(5, 4, pix)
    val d = Gif.decode(small)
    assert(d.width == 5 && d.height == 4 && d.channels == 3 && d.format == "gif")
    for (i <- 0 until 20; c <- 0 until 3)
      assert((d.payload(i * 3 + c) & 0xff) == pix(i))
    // large image: > 4000 px crosses code widths 9→12 AND a CLEAR reset
    val n = 9000
    val big = Gif.decode(Gif.encode(100, 90, i => (i * 7 + 3) % 256))
    assert(big.width * big.height == n)
    for (i <- 0 until n)
      assert((big.payload(i * 3) & 0xff) == (i * 7 + 3) % 256, s"pixel $i")
    // corrupt containers reject
    intercept[IllegalArgumentException](Gif.decode(small.take(10)))
    assert(MediaCodecs.sniffDecode(small).format == "gif")
    assert(MediaCodecs.sniffDecode(small.take(10)).format == "unknown")
  }

  test("GIF decoder agrees with an INDEPENDENT compressing LZW encoder (KwKwK)") {
    import MediaCodecs.Gif
    // a real longest-match LZW encoder, written against the spec text
    // (not the codec under test): repetitive pixels produce genuine
    // multi-character codes including the code==next-slot case
    def compressGif(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w8(v: Int) = out.write(v & 0xff)
      def w16(v: Int) = { w8(v); w8(v >> 8) }
      out.write("GIF87a".getBytes("US-ASCII"))
      w16(w); w16(h); w8(0xf7); w8(0); w8(0)
      for (i <- 0 until 256) { w8(i); w8(i); w8(i) }
      w8(0x2c); w16(0); w16(0); w16(w); w16(h); w8(0); w8(8)
      val data = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bitCnt = 0
      def put(c: Int, cw: Int): Unit = {
        bitBuf |= (c.toLong << bitCnt); bitCnt += cw
        while (bitCnt >= 8) { data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      }
      var cw = 9
      var next = 258
      val table = scala.collection.mutable.HashMap.empty[List[Int], Int]
      put(256, cw) // CLEAR
      var cur = List(px(0))
      for (i <- 1 until px.length) {
        val ext = cur :+ px(i)
        if (ext.length == 1 || table.contains(ext)) cur = ext
        else {
          val code = if (cur.length == 1) cur.head else table(cur)
          put(code, cw)
          table(ext) = next
          next += 1
          if (next == (1 << cw) && cw < 12) cw += 1
          cur = List(px(i))
        }
      }
      put(if (cur.length == 1) cur.head else table(cur), cw)
      put(257, cw) // EOI
      if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
      val bytes = data.toByteArray
      var off = 0
      while (off < bytes.length) {
        val len = math.min(255, bytes.length - off)
        w8(len); out.write(bytes, off, len); off += len
      }
      w8(0); w8(0x3b)
      out.toByteArray
    }
    // the classic KwKwK trigger: aaaa... plus varied tails
    val px = (Array.fill(40)(7) ++ (0 until 200).map(i => (i * 13) % 256) ++
      Array.fill(60)(9)).toArray
    val gif = compressGif(30, 10, px)
    val d = Gif.decode(gif)
    assert(d.width == 30 && d.height == 10)
    for (i <- px.indices)
      assert((d.payload(i * 3) & 0xff) == px(i), s"pixel $i")
  }

  test("mu-law WAV: expansion matches the G.711 reference points") {
    import MediaCodecs.Wav
    // spec anchor points: 0xFF encodes +0 (near-silence), 0x7F -> -0;
    // full-scale magnitudes at the extremes
    assert(Wav.ulawToLinear(0xff) == 0)
    assert(Wav.ulawToLinear(0x7f) == 0)
    assert(Wav.ulawToLinear(0x00) == -32124)
    assert(Wav.ulawToLinear(0x80) == 32124)
    // bytes are complemented: magnitude DECREASES as the positive-half
    // byte value rises (0x80 full scale → 0xFF silence), monotonically
    val pos = (0x80 to 0xff).map(Wav.ulawToLinear)
    assert(pos.zip(pos.tail).forall { case (a, b) => a >= b })
    // container round trip: every decoded sample equals the direct
    // expansion of its encoded byte, via the 16-bit PCM contract
    val bytes = (0 until 16).map(i => (i * 37) % 256)
    val wav = Wav.encodeMulaw(16, 1, 8000, bytes(_))
    val d = Wav.decode(wav)
    assert(d.format == "wav" && d.width == 16 && d.channels == 1)
    for (i <- 0 until 16) {
      val lo = d.payload(i * 2) & 0xff
      val hi = d.payload(i * 2 + 1) & 0xff
      val u = lo | (hi << 8)
      val s = if (u >= 0x8000) u - 0x10000 else u
      assert(s == Wav.ulawToLinear(bytes(i)))
    }
  }

  test("RealDecoder meta matches container headers") {
    val m = RealDecoder.decode(9L, Bmp.encode(6, 4, pix))
    assert(m == Multimodal.MediaMeta(9L, Bmp.encodedLength(6, 4).toLong, 6, 4, 3, "bmp"))
    val mw = RealDecoder.decode(3L, Wav.encode(16, 1, 8000, _ => 1))
    assert(mw == Multimodal.MediaMeta(3L, Wav.encodedLength(16, 1).toLong, 16, 8000, 1, "wav"))
  }
}
