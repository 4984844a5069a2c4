package graft.operators

/** Real, dependency-free media codecs for the multimodal column
  * operators: 24-bit BMP, binary PPM (P6), and PCM-16 WAV — the three
  * classic containers whose formats are fixed public layouts (BMP:
  * BITMAPFILEHEADER + BITMAPINFOHEADER; PPM: netpbm P6; WAV:
  * RIFF/fmt/data), implementable byte-exactly in pure Scala.
  *
  * These make [[Multimodal]] honest: [[RealDecoder]] sniffs the magic
  * bytes and parses genuine container headers (row padding, BGR order,
  * bottom-up rows, chunk walks — the details a fake cannot have), and
  * [[PixelHistogramExtractor]] computes features over genuinely decoded
  * pixel data. [[Multimodal.FakeDecoder]] remains only as the
  * plumbing-determinism stub for byte streams that are not real media.
  *
  * Decoded pixel streams are LOGICAL RGB, top-down row-major — the
  * encoder's input order — so encode→decode is the identity on the
  * pixel function regardless of the container's storage order. That
  * property is what lets a full value oracle replay feature extraction
  * from the pixel-generating arithmetic alone.
  */
object MediaCodecs {

  /** Decoded media: container metadata + the logical payload bytes
    * (RGB top-down for images; little-endian i16 frames for audio).
    */
  final case class Decoded(width: Int, height: Int, channels: Int,
                           format: String, payload: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  /** Windows BMP, 24-bit uncompressed (BI_RGB): 14-byte file header,
    * 40-byte info header, rows stored BOTTOM-UP in BGR order, each row
    * padded to a 4-byte boundary — the standard layout per the public
    * BITMAPINFOHEADER spec.
    */
  object Bmp {
    val HeaderLen = 54

    def rowPad(width: Int): Int = (4 - (width * 3) % 4) % 4

    def encodedLength(width: Int, height: Int): Int =
      HeaderLen + height * (width * 3 + rowPad(width))

    /** @param pixel logical RGB stream: index i = ((y*w)+x)*3 + c with
      *   y from the TOP, c in {0=R,1=G,2=B}; values 0-255
      */
    def encode(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
      require(width > 0 && height > 0)
      val pad = rowPad(width)
      val rowSize = width * 3 + pad
      val out = new Array[Byte](HeaderLen + height * rowSize)
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, out.length)
      putI32(out, 10, HeaderLen)
      putI32(out, 14, 40)
      putI32(out, 18, width)
      putI32(out, 22, height) // positive → bottom-up storage
      putU16(out, 26, 1)
      putU16(out, 28, 24)
      putI32(out, 30, 0) // BI_RGB
      putI32(out, 34, height * rowSize)
      putI32(out, 38, 2835); putI32(out, 42, 2835) // 72 dpi
      var y = 0
      while (y < height) {
        // logical row y lands at storage row (height-1-y); BGR order
        val base = HeaderLen + (height - 1 - y) * rowSize
        var x = 0
        while (x < width) {
          val li = (y * width + x) * 3
          out(base + x * 3) = (pixel(li + 2) & 0xff).toByte     // B
          out(base + x * 3 + 1) = (pixel(li + 1) & 0xff).toByte // G
          out(base + x * 3 + 2) = (pixel(li) & 0xff).toByte     // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** Accepts 24-bpp BI_RGB with either row orientation (negative
      * height = top-down, per the spec) and any BITMAPINFOHEADER-or-
      * larger info header; rejects anything else loudly.
      */
    def decode(b: Array[Byte]): Decoded = {
      require(b.length >= HeaderLen && b(0) == 'B' && b(1) == 'M',
        "not a BMP: missing BM magic")
      val dataOffset = i32(b, 10)
      val infoLen = i32(b, 14)
      require(infoLen >= 40, s"unsupported BMP info header length $infoLen")
      val width = i32(b, 18)
      val rawHeight = i32(b, 22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val bpp = u16(b, 28)
      val compression = i32(b, 30)
      require(bpp == 24 && compression == 0,
        s"unsupported BMP: bpp=$bpp compression=$compression (need 24/BI_RGB)")
      val pad = rowPad(width)
      val rowSize = width * 3 + pad
      require(b.length >= dataOffset + height * rowSize, "truncated BMP pixel data")
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val base = dataOffset + srcRow * rowSize
        var x = 0
        while (x < width) {
          val li = (y * width + x) * 3
          px(li) = b(base + x * 3 + 2)     // R
          px(li + 1) = b(base + x * 3 + 1) // G
          px(li + 2) = b(base + x * 3)     // B
          x += 1
        }
        y += 1
      }
      Decoded(width, height, 3, "bmp", px)
    }
  }

  /** Binary netpbm PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
    * `#` comments allowed between tokens, one whitespace byte after
    * maxval, then raw RGB rows top-down.
    */
  object Ppm {
    def encodedLength(width: Int, height: Int): Int =
      header(width, height).length + width * height * 3

    private def header(width: Int, height: Int): Array[Byte] =
      s"P6\n$width $height\n255\n".getBytes("US-ASCII")

    def encode(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
      require(width > 0 && height > 0)
      val h = header(width, height)
      val out = new Array[Byte](h.length + width * height * 3)
      System.arraycopy(h, 0, out, 0, h.length)
      var i = 0
      while (i < width * height * 3) {
        out(h.length + i) = (pixel(i) & 0xff).toByte
        i += 1
      }
      out
    }

    def decode(b: Array[Byte]): Decoded = {
      require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
      var pos = 2
      def nextInt(): Int = {
        // skip whitespace and # comments (the real netpbm grammar)
        var done = false
        while (!done) {
          while (pos < b.length && Character.isWhitespace(b(pos))) pos += 1
          if (pos < b.length && b(pos) == '#') {
            while (pos < b.length && b(pos) != '\n') pos += 1
          } else done = true
        }
        var v = 0
        require(pos < b.length && b(pos) >= '0' && b(pos) <= '9', "bad PPM header")
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
          v = v * 10 + (b(pos) - '0'); pos += 1
        }
        v
      }
      val width = nextInt()
      val height = nextInt()
      val maxval = nextInt()
      require(maxval == 255, s"unsupported PPM maxval $maxval (need 8-bit)")
      pos += 1 // exactly one whitespace byte after maxval, per spec
      require(b.length >= pos + width * height * 3, "truncated PPM pixel data")
      val px = new Array[Byte](width * height * 3)
      System.arraycopy(b, pos, px, 0, px.length)
      Decoded(width, height, 3, "ppm", px)
    }
  }

  /** WAV, PCM 16-bit: RIFF container with a chunk walk over `fmt ` and
    * `data` (other chunks — LIST, fact — are skipped, as a real reader
    * must). Metadata maps onto [[Multimodal.MediaMeta]]'s image-shaped
    * fields as width = frames per channel, height = sample rate.
    */
  object Wav {
    val HeaderLen = 44

    def encodedLength(nFrames: Int, channels: Int): Int =
      HeaderLen + nFrames * channels * 2

    /** @param sample little-endian i16 stream, interleaved: index
      *   i = frame * channels + channel
      */
    def encode(nFrames: Int, channels: Int, sampleRate: Int,
               sample: Int => Int): Array[Byte] = {
      require(nFrames > 0 && channels > 0 && sampleRate > 0)
      val dataSize = nFrames * channels * 2
      val out = new Array[Byte](HeaderLen + dataSize)
      def tag(o: Int, s: String): Unit = {
        val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, out, o, 4)
      }
      tag(0, "RIFF"); putI32(out, 4, 36 + dataSize); tag(8, "WAVE")
      tag(12, "fmt "); putI32(out, 16, 16)
      putU16(out, 20, 1) // PCM
      putU16(out, 22, channels)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * channels * 2) // byte rate
      putU16(out, 32, channels * 2)              // block align
      putU16(out, 34, 16)                        // bits per sample
      tag(36, "data"); putI32(out, 40, dataSize)
      var i = 0
      while (i < nFrames * channels) {
        putU16(out, HeaderLen + i * 2, sample(i) & 0xffff)
        i += 1
      }
      out
    }

    def decode(b: Array[Byte]): Decoded = {
      require(b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
        "not a RIFF/WAVE file")
      var pos = 12
      var channels = -1
      var sampleRate = -1
      var bits = -1
      var data: Array[Byte] = null
      while (pos + 8 <= b.length && (channels < 0 || data == null)) {
        val id = new String(b, pos, 4, "US-ASCII")
        val size = i32(b, pos + 4)
        require(size >= 0 && pos + 8 + size <= b.length, s"truncated WAV chunk $id")
        id match {
          case "fmt " =>
            require(size >= 16, "short fmt chunk")
            require(u16(b, pos + 8) == 1, "unsupported WAV: not PCM")
            channels = u16(b, pos + 10)
            sampleRate = i32(b, pos + 12)
            bits = u16(b, pos + 22)
            require(bits == 16, s"unsupported WAV: $bits bits (need 16)")
          case "data" =>
            data = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + size)
          case _ => // skip LIST/fact/etc.
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(channels > 0 && data != null, "WAV missing fmt or data chunk")
      val nFrames = data.length / (channels * 2)
      Decoded(nFrames, sampleRate, channels, "wav", data)
    }
  }

  /** Nearest-neighbor resample of a decoded RGB image. The source
    * index map is pure integer floor — `sx = x*w/tw, sy = y*h/th` — so
    * a resize of a deterministically generated image replays in SQL
    * arithmetic (the property every gate query here leans on). Upscales
    * repeat pixels, downscales drop rows/columns; no filtering (a box
    * or bilinear kernel would trade oracle-exactness for quality —
    * wrong trade for a feature-extraction pipeline normalizing to tiny
    * thumbnails).
    */
  def resizeNearest(d: Decoded, tw: Int, th: Int): Decoded = {
    require(d.channels == 3 && d.width > 0 && d.height > 0,
      s"resize needs a decoded RGB image, got ${d.format} ${d.width}x${d.height}")
    require(tw > 0 && th > 0)
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y.toLong * d.height / th
      var x = 0
      while (x < tw) {
        val sx = x.toLong * d.width / tw
        val si = ((sy * d.width + sx) * 3).toInt
        val di = (y * tw + x) * 3
        out(di) = d.payload(si)
        out(di + 1) = d.payload(si + 1)
        out(di + 2) = d.payload(si + 2)
        x += 1
      }
      y += 1
    }
    Decoded(tw, th, 3, d.format, out)
  }

  /** Every `every`-th frame of decoded PCM audio, all channels kept —
    * the audio face of the frame-sample contract (a video container
    * would sample the same way along its frame axis). Frame f survives
    * iff `f % every == 0`, so the kept stream replays as a modulus
    * filter over the generating arithmetic.
    */
  def sampleFrames(d: Decoded, every: Int): Decoded = {
    require(d.format == "wav", s"frame sampling needs decoded audio, got ${d.format}")
    require(every > 0)
    val nFrames = d.width // Decoded maps frames onto width
    val frameBytes = d.channels * 2
    val kept = (nFrames + every - 1) / every
    val out = new Array[Byte](kept * frameBytes)
    var f = 0
    var o = 0
    while (f < nFrames) {
      if (f % every == 0) {
        System.arraycopy(d.payload, f * frameBytes, out, o, frameBytes)
        o += frameBytes
      }
      f += 1
    }
    Decoded(kept, d.height, d.channels, d.format, out)
  }

  /** Magic-byte sniffing decode: BMP / PPM / WAV, else an explicit
    * `unknown` row (zero dims) rather than an exception — at corpus
    * scale one corrupt blob must not kill a partition.
    */
  def sniffDecode(bytes: Array[Byte]): Decoded = {
    def is(off: Int, s: String): Boolean = {
      val t = s.getBytes("US-ASCII")
      bytes.length >= off + t.length &&
        t.indices.forall(i => bytes(off + i) == t(i))
    }
    try {
      if (is(0, "BM")) Bmp.decode(bytes)
      else if (is(0, "P6")) Ppm.decode(bytes)
      else if (is(0, "RIFF") && is(8, "WAVE")) Wav.decode(bytes)
      else Decoded(0, 0, 0, "unknown", Array.emptyByteArray)
    } catch {
      // NonFatal, not just the requires: crafted headers can overflow
      // dimension arithmetic past the explicit checks (negative array
      // sizes, out-of-bounds reads) — for UNTRUSTED bytes every decode
      // failure is the same "not valid media" outcome
      case scala.util.control.NonFatal(_) =>
        Decoded(0, 0, 0, "unknown", Array.emptyByteArray)
    }
  }

  /** Real decoder for [[Multimodal.decodeMeta]]: genuine container
    * parsing, with metadata from the HEADERS (not the byte content).
    */
  object RealDecoder extends Multimodal.Decoder {
    def decode(id: Long, bytes: Array[Byte]): Multimodal.MediaMeta = {
      val d = sniffDecode(bytes)
      Multimodal.MediaMeta(id, bytes.length.toLong, d.width, d.height,
        d.channels, d.format)
    }
  }

  /** Feature extraction over genuinely DECODED payload bytes: a
    * `dim`-bin value histogram of the logical pixel/sample stream
    * (container headers and row padding excluded — the invariance a
    * raw-byte histogram cannot have), L2-normalized like
    * [[Multimodal.FakeFeatureExtractor]]. Counts are exact integers,
    * the normalization is one double sqrt + divide, the float cast is
    * IEEE round-to-nearest — every step engine-portable, so pipelines
    * over it carry a full value oracle.
    */
  final class PixelHistogramExtractor(val dim: Int = 8)
      extends Multimodal.FeatureExtractor {
    require(256 % dim == 0, "dim must divide 256 for exact integer binning")
    def extract(bytes: Array[Byte]): Array[Float] = {
      val payload = sniffDecode(bytes).payload
      val counts = new Array[Long](dim)
      val binWidth = 256 / dim
      var i = 0
      while (i < payload.length) {
        counts((payload(i) & 0xff) / binWidth) += 1
        i += 1
      }
      var n = 0.0
      var d = 0
      while (d < dim) { val c = counts(d).toDouble; n += c * c; d += 1 }
      val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
      val v = new Array[Float](dim)
      d = 0
      while (d < dim) { v(d) = (counts(d) * inv).toFloat; d += 1 }
      v
    }
  }
}
