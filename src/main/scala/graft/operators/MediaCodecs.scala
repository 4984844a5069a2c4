package graft.operators

/** Real, dependency-free media codecs for the multimodal column
  * operators: 24-bit BMP, binary PPM (P6), PCM-16 WAV, and 8-bit PNG
  * — containers whose formats are fixed public layouts (BMP:
  * BITMAPFILEHEADER + BITMAPINFOHEADER; PPM: netpbm P6; WAV:
  * RIFF/fmt/data; PNG: ISO/IEC 15948 chunks + zlib + adaptive
  * filtering), implementable byte-exactly in pure Scala.
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

    /** G.711 µ-law expansion (the public telephony spec): one
      * encoded byte → one linear 16-bit sample. Pure integer
      * arithmetic, so it replays verbatim in SQL — the one audio
      * codec that needs no round-trip cancellation trick.
      */
    def ulawToLinear(u: Int): Int = {
      val x = ~u & 0xff
      val t = (((x & 0x0f) << 3) + 0x84) << ((x & 0x70) >> 4)
      if ((x & 0x80) != 0) 0x84 - t else t - 0x84
    }

    /** µ-law WAV writer (WAVE_FORMAT_MULAW = 7, 8 bits/sample): the
      * telephone-audio container a speech corpus actually contains.
      */
    def encodeMulaw(nFrames: Int, channels: Int, sampleRate: Int,
                    sampleByte: Int => Int): Array[Byte] = {
      require(nFrames > 0 && channels > 0 && sampleRate > 0)
      val dataSize = nFrames * channels
      val out = new Array[Byte](HeaderLen + dataSize)
      def tag(o: Int, s: String): Unit = {
        val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, out, o, 4)
      }
      tag(0, "RIFF"); putI32(out, 4, 36 + dataSize); tag(8, "WAVE")
      tag(12, "fmt "); putI32(out, 16, 16)
      putU16(out, 20, 7) // µ-law
      putU16(out, 22, channels)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * channels) // byte rate
      putU16(out, 32, channels)              // block align
      putU16(out, 34, 8)                     // bits per sample
      tag(36, "data"); putI32(out, 40, dataSize)
      var i = 0
      while (i < dataSize) {
        out(HeaderLen + i) = (sampleByte(i) & 0xff).toByte
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
      var fmt = -1
      var data: Array[Byte] = null
      while (pos + 8 <= b.length && (channels < 0 || data == null)) {
        val id = new String(b, pos, 4, "US-ASCII")
        val size = i32(b, pos + 4)
        require(size >= 0 && pos + 8 + size <= b.length, s"truncated WAV chunk $id")
        id match {
          case "fmt " =>
            require(size >= 16, "short fmt chunk")
            fmt = u16(b, pos + 8)
            require(fmt == 1 || fmt == 7, s"unsupported WAV format $fmt")
            channels = u16(b, pos + 10)
            sampleRate = i32(b, pos + 12)
            bits = u16(b, pos + 22)
            require((fmt == 1 && bits == 16) || (fmt == 7 && bits == 8),
              s"unsupported WAV: format $fmt at $bits bits")
          case "data" =>
            data = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + size)
          case _ => // skip LIST/fact/etc.
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(channels > 0 && data != null, "WAV missing fmt or data chunk")
      if (fmt == 7) {
        // expand µ-law to the 16-bit little-endian PCM payload contract
        // — downstream frame sampling is format-blind
        val pcm = new Array[Byte](data.length * 2)
        var i = 0
        while (i < data.length) {
          val s = ulawToLinear(data(i) & 0xff)
          pcm(i * 2) = (s & 0xff).toByte
          pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        Decoded(data.length / channels, sampleRate, channels, "wav", pcm)
      } else {
        val nFrames = data.length / (channels * 2)
        Decoded(nFrames, sampleRate, channels, "wav", data)
      }
    }
  }

  /** GIF87a (the public CompuServe spec): single non-interlaced image
    * over a 256-entry grayscale global color table, LZW-compressed —
    * the remaining common crawl image format after BMP/PNG/JPEG.
    *
    * The decoder is the general article: sub-block reassembly,
    * LSB-first variable-width codes (m+1 → 12 bits), string table with
    * prefix links, CLEAR resets, the KwKwK case (code == next slot),
    * palette lookup to RGB. The encoder is the TEST-VECTOR generator:
    * it emits a spec-valid literal-only stream (every code a root —
    * the public "uncompressed GIF" technique) but must still track
    * table growth and width transitions, because the decoder builds an
    * entry per received code regardless; an early CLEAR resets before
    * the table fills. MediaCodecsSpec additionally drives the decoder
    * with a REAL compressing encoder (longest-match string table,
    * exercising KwKwK) — two independent encoders agreeing through one
    * decoder pins both sides of the spec.
    */
  object Gif {
    /** 8-bit grayscale in, GIF87a with a 256-gray palette out. */
    def encode(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
      require(width > 0 && height > 0)
      val out = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = out.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
      out.write("GIF87a".getBytes("US-ASCII"))
      w16(width); w16(height)
      w8(0xf7) // GCT present, 8-bit color resolution, 256 entries
      w8(0); w8(0)
      var i = 0
      while (i < 256) { w8(i); w8(i); w8(i); i += 1 }
      w8(0x2c); w16(0); w16(0); w16(width); w16(height); w8(0)
      w8(8) // LZW minimum code size
      val data = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L
      var bitCnt = 0
      def putCode(c: Int, codeWidth: Int): Unit = {
        bitBuf |= (c.toLong << bitCnt); bitCnt += codeWidth
        while (bitCnt >= 8) {
          data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
        }
      }
      val Clear = 256
      val Eoi = 257
      var codeWidth = 9
      var nextCode = 258
      var first = true
      putCode(Clear, codeWidth)
      val n = width * height
      var p = 0
      while (p < n) {
        putCode(pixel(p) & 0xff, codeWidth)
        if (first) first = false
        else {
          // the decoder adds one table entry per received non-first
          // code; mirror its growth so widths stay in lockstep
          nextCode += 1
          if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          if (nextCode >= 4000) { // early CLEAR, always spec-legal
            putCode(Clear, codeWidth)
            codeWidth = 9; nextCode = 258; first = true
          }
        }
        p += 1
      }
      putCode(Eoi, codeWidth)
      if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
      val bytes = data.toByteArray
      var off = 0
      while (off < bytes.length) {
        val len = math.min(255, bytes.length - off)
        w8(len); out.write(bytes, off, len); off += len
      }
      w8(0) // block terminator
      w8(0x3b) // trailer
      out.toByteArray
    }

    def decode(b: Array[Byte]): Decoded = {
      require(b.length >= 13, "truncated GIF")
      val sig = new String(b, 0, 6, "US-ASCII")
      require(sig == "GIF87a" || sig == "GIF89a", "not a GIF file")
      val sw = u16(b, 6); val sh = u16(b, 8)
      val flags = b(10) & 0xff
      var pos = 13
      var palette: Array[Byte] = Array.emptyByteArray
      if ((flags & 0x80) != 0) {
        val sz = 3 * (1 << ((flags & 7) + 1))
        require(pos + sz <= b.length, "truncated global color table")
        palette = java.util.Arrays.copyOfRange(b, pos, pos + sz)
        pos += sz
      }
      while (pos < b.length) {
        (b(pos) & 0xff) match {
          case 0x3b => throw new IllegalArgumentException("GIF has no image")
          case 0x21 => // extension: label + sub-blocks
            pos += 2
            while ({ require(pos < b.length, "truncated extension")
              val len = b(pos) & 0xff; pos += 1 + len; len != 0 }) ()
          case 0x2c =>
            require(pos + 10 <= b.length, "truncated image descriptor")
            val iw = u16(b, pos + 5); val ih = u16(b, pos + 7)
            val iflags = b(pos + 9) & 0xff
            require((iflags & 0x40) == 0, "interlaced GIF unsupported")
            pos += 10
            var pal = palette
            if ((iflags & 0x80) != 0) {
              val sz = 3 * (1 << ((iflags & 7) + 1))
              require(pos + sz <= b.length, "truncated local color table")
              pal = java.util.Arrays.copyOfRange(b, pos, pos + sz)
              pos += sz
            }
            require(pal.nonEmpty, "GIF image without a color table")
            require(pos < b.length, "missing LZW code size")
            val minCode = b(pos) & 0xff; pos += 1
            require(minCode >= 2 && minCode <= 8, s"bad LZW code size $minCode")
            // reassemble sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            var done = false
            while (!done) {
              require(pos < b.length, "truncated image data")
              val len = b(pos) & 0xff; pos += 1
              if (len == 0) done = true
              else {
                require(pos + len <= b.length, "truncated image sub-block")
                data.write(b, pos, len); pos += len
              }
            }
            val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
            val outPx = new Array[Byte](iw * ih * 3)
            var i = 0
            val nColors = pal.length / 3
            while (i < idx.length) {
              val c = idx(i) & 0xff
              require(c < nColors, s"palette index $c out of range")
              outPx(i * 3) = pal(c * 3)
              outPx(i * 3 + 1) = pal(c * 3 + 1)
              outPx(i * 3 + 2) = pal(c * 3 + 2)
              i += 1
            }
            return Decoded(iw, ih, 3, "gif", outPx)
          case other =>
            throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
        }
      }
      throw new IllegalArgumentException("GIF ended without an image")
    }

    /** General GIF-LZW decode: `n` pixel indices out of the
      * reassembled code stream.
      */
    private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Array[Byte] = {
      val clear = 1 << minCode
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val out = new Array[Byte](n)
      var outPos = 0
      var bitPos = 0
      def read(w: Int): Int = {
        require(bitPos + w <= data.length * 8, "LZW stream exhausted")
        var v = 0; var i = 0
        while (i < w) {
          val bit = (data((bitPos + i) >> 3) >> ((bitPos + i) & 7)) & 1
          v |= bit << i
          i += 1
        }
        bitPos += w
        v
      }
      // emit table[code]'s expansion; returns its first character
      def emit(code: Int): Byte = {
        // expansion length is bounded; walk prefix links into a stack
        var stack = List.empty[Byte]
        var c = code
        while (c >= clear + 2) { stack = suffix(c) :: stack; c = prefix(c) }
        val first = c.toByte // root
        stack = first :: stack
        stack.foreach { ch =>
          require(outPos < n, "LZW produced too many pixels")
          out(outPos) = ch; outPos += 1
        }
        first
      }
      var width = minCode + 1
      var nextCode = clear + 2
      var prev = -1
      var finished = false
      while (!finished && outPos < n) {
        val code = read(width)
        if (code == clear) {
          width = minCode + 1; nextCode = clear + 2; prev = -1
        } else if (code == eoi) {
          finished = true
        } else if (prev < 0) {
          require(code < clear, s"first code $code not a root")
          emit(code)
          prev = code
        } else {
          require(code <= nextCode && code < 4096, s"LZW code $code out of range")
          val firstChar: Byte =
            if (code < nextCode) {
              val f = emit(code)
              f
            } else {
              // KwKwK: the entry being defined — previous string + its
              // own first character
              var c = prev
              while (c >= clear + 2) c = prefix(c)
              val f = c.toByte
              // emit prev's expansion then f
              emit(prev)
              require(outPos < n, "LZW produced too many pixels")
              out(outPos) = f; outPos += 1
              f
            }
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstChar
            nextCode += 1
            if (nextCode == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
      require(outPos == n, s"LZW decoded $outPos of $n pixels")
      out
    }
  }

  /** AVI (the public Microsoft RIFF-AVI container layout) carrying an
    * MJPEG video stream — the container that turns the
    * [[graft.operators.Jpeg]] still decoder into a real VIDEO
    * frame-sampling path: each `00dc` chunk in the `movi` list is one
    * complete baseline-JFIF frame.
    *
    * Writer emits the canonical layout — RIFF('AVI ') → LIST(hdrl){
    * avih, LIST(strl){ strh('vids'/'MJPG'), strf(BITMAPINFOHEADER) }}
    * → LIST(movi){ '00dc'… } — with correct sizes and word alignment;
    * reader is a defensive chunk walk (bounds-checked sizes, recursion
    * into LISTs, word-aligned advance — the [[Wav]] discipline) that
    * collects `00dc`/`00dd` frame payloads in stream order. Index
    * (`idx1`) is optional per the spec and omitted/ignored.
    */
  object Avi {
    def encode(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(width > 0 && height > 0 && frames.nonEmpty)
      val strhSize = 56
      val strfSize = 40
      val avihSize = 56
      val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
      val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
      val framesPadded = frames.map(f => f.length + (f.length & 1))
      val moviSize = 4 + framesPadded.map(_ + 8).sum
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val out = new Array[Byte](8 + riffSize)
      var p = 0
      def tag(s: String): Unit = {
        val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, out, p, 4); p += 4
      }
      def i32o(v: Int): Unit = { putI32(out, p, v); p += 4 }
      tag("RIFF"); i32o(riffSize); tag("AVI ")
      tag("LIST"); i32o(hdrlSize); tag("hdrl")
      tag("avih"); i32o(avihSize)
      i32o(40000)               // µs per frame (25 fps)
      i32o(0); i32o(0)          // max bytes/sec, padding
      i32o(0x10)                // AVIF_HASINDEX off, AVIF_WASCAPTUREFILE-ish flags
      i32o(frames.length)       // total frames
      i32o(0); i32o(1)          // initial frames, streams
      i32o(framesPadded.max)    // suggested buffer
      i32o(width); i32o(height)
      i32o(0); i32o(0); i32o(0); i32o(0) // reserved
      tag("LIST"); i32o(strlSize); tag("strl")
      tag("strh"); i32o(strhSize)
      tag("vids"); tag("MJPG")
      i32o(0)                   // flags
      i32o(0)                   // priority + language
      i32o(0)                   // initial frames
      i32o(1); i32o(25)         // rate: 25/1 fps
      i32o(0)                   // start
      i32o(frames.length)       // length in frames
      i32o(framesPadded.max)    // suggested buffer
      i32o(-1)                  // quality
      i32o(0)                   // sample size (varies)
      i32o(0); putU16(out, p, width); putU16(out, p + 2, height); p += 4 // rcFrame
      tag("strf"); i32o(strfSize)
      i32o(40)                  // BITMAPINFOHEADER size
      i32o(width); i32o(height)
      putU16(out, p, 1); putU16(out, p + 2, 24); p += 4 // planes, bpp
      tag("MJPG"); // biCompression
      i32o(width * height * 3)  // biSizeImage
      i32o(0); i32o(0); i32o(0); i32o(0) // resolution, colors
      tag("LIST"); i32o(moviSize); tag("movi")
      frames.foreach { f =>
        tag("00dc"); i32o(f.length)
        System.arraycopy(f, 0, out, p, f.length); p += f.length
        if ((f.length & 1) == 1) { out(p) = 0; p += 1 }
      }
      require(p == out.length, s"AVI writer size mismatch: $p vs ${out.length}")
      out
    }

    /** Frame payloads (`00dc`/`00dd` chunks) in stream order. */
    def decodeFrames(b: Array[Byte]): Seq[Array[Byte]] = {
      require(b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ',
        "not a RIFF/AVI file")
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = new String(b, pos, 4, "US-ASCII")
          val size = i32(b, pos + 4)
          require(size >= 0 && pos + 8 + size <= end, s"truncated AVI chunk $id")
          if (id == "LIST" || id == "RIFF") walk(pos + 12, pos + 8 + size)
          else if (id == "00dc" || id == "00dd")
            out += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + size)
          pos += 8 + size + (size & 1)
        }
      }
      walk(12, b.length)
      out.toSeq
    }
  }

  /** PNG (ISO/IEC 15948 / RFC 2083), 8-bit depth, color types 0
    * (grayscale), 2 (truecolor RGB) and 6 (RGBA), non-interlaced —
    * the dominant lossless format in real image corpora. The encoder
    * here is the TEST-VECTOR generator (it can emit any per-row filter
    * type 0-4, which the production `graft.cli.Png` timeline encoder
    * never does); the decoder is the production path: chunk walk with
    * CRC32 verification, multi-IDAT zlib inflate via
    * `java.util.zip.Inflater`, and full filter reconstruction (None /
    * Sub / Up / Average / Paeth per the spec's filtering chapter).
    *
    * Decoded payload is the logical top-down sample stream (G, RGB or
    * RGBA per pixel) — same orientation contract as [[Bmp]]/[[Ppm]],
    * so encode→decode is the identity on the pixel function and the
    * full value oracle replays from the generating arithmetic alone;
    * the zlib stream and the filter predictors cancel in the round
    * trip, which is exactly what proves they are implemented right.
    */
  object Png {
    private val Signature =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    private def colorTypeOf(channels: Int): Int = channels match {
      case 1 => 0 // grayscale
      case 3 => 2 // truecolor
      case 4 => 6 // truecolor + alpha
      case c => throw new IllegalArgumentException(
        s"unsupported channel count $c (need 1, 3 or 4)")
    }

    private def channelsOf(colorType: Int): Int = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case t => throw new IllegalArgumentException(
        s"unsupported PNG color type $t (need 0, 2 or 6)")
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** @param pixel logical sample stream: index i = (y*w + x)*channels
      *   + c, y from the top; values 0-255
      * @param filterOfRow per-scanline filter type 0-4 — lets tests
      *   exercise every predictor; a quality encoder would pick per
      *   row by sum-of-absolute-residuals, which only changes size
      */
    def encode(width: Int, height: Int, channels: Int, pixel: Int => Int,
               filterOfRow: Int => Int = _ => 0): Array[Byte] = {
      require(width > 0 && height > 0)
      val bpp = channels // 8-bit depth → one byte per sample
      val stride = width * channels
      val raw = new Array[Byte](height * (1 + stride))
      val prior = new Array[Int](stride) // reconstructed previous row
      val cur = new Array[Int](stride)
      var y = 0
      var p = 0
      while (y < height) {
        val f = filterOfRow(y)
        require(f >= 0 && f <= 4, s"invalid PNG filter type $f")
        raw(p) = f.toByte; p += 1
        var i = 0
        while (i < stride) { cur(i) = pixel(y * stride + i) & 0xff; i += 1 }
        i = 0
        while (i < stride) {
          val left = if (i >= bpp) cur(i - bpp) else 0
          val up = if (y > 0) prior(i) else 0
          val ul = if (y > 0 && i >= bpp) prior(i - bpp) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          raw(p) = ((cur(i) - pred) & 0xff).toByte
          p += 1; i += 1
        }
        System.arraycopy(cur, 0, prior, 0, stride)
        y += 1
      }

      val out = new java.io.ByteArrayOutputStream()
      out.write(Signature)
      def chunk(tag: String, data: Array[Byte]): Unit = {
        def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
          (v >>> 8).toByte, v.toByte)
        val t = tag.getBytes("US-ASCII")
        out.write(be(data.length)); out.write(t); out.write(data)
        val crc = new java.util.zip.CRC32
        crc.update(t); crc.update(data)
        out.write(be(crc.getValue.toInt))
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(width).putInt(height)
        .put(8.toByte).put(colorTypeOf(channels).toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", ihdr.array())
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](16 * 1024)
      val idat = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      chunk("IDAT", idat.toByteArray)
      chunk("IEND", Array.empty)
      out.toByteArray
    }

    /** Strict decode: verifies the signature, every chunk's CRC32, the
      * IHDR constraints (8-bit, color type 0/2/6, deflate, adaptive
      * filtering, no Adam7 interlace), inflates the concatenated IDAT
      * stream, and reconstructs each scanline's filter. Ancillary
      * chunks (pHYs, tEXt, ...) are CRC-checked and skipped — so the
      * DPI-300 output of the `graft.cli.Png` timeline encoder decodes
      * here too (round-trip pinned in the spec).
      */
    def decode(b: Array[Byte]): Decoded = {
      require(b.length >= 8 && Signature.indices.forall(i => b(i) == Signature(i)),
        "not a PNG: bad signature")
      var pos = 8
      var width = -1; var height = -1; var channels = -1
      val idat = new java.io.ByteArrayOutputStream()
      var seenIend = false
      while (pos + 12 <= b.length && !seenIend) {
        val len = be32(b, pos)
        require(len >= 0 && pos + 12 + len <= b.length, "truncated PNG chunk")
        val tag = new String(b, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(b, pos + 4, 4 + len)
        require(crc.getValue.toInt == be32(b, pos + 8 + len),
          s"PNG chunk $tag CRC mismatch")
        tag match {
          case "IHDR" =>
            require(len == 13, "bad IHDR length")
            width = be32(b, pos + 8)
            height = be32(b, pos + 12)
            require(width > 0 && height > 0, "bad PNG dimensions")
            val depth = b(pos + 16) & 0xff
            require(depth == 8, s"unsupported PNG bit depth $depth (need 8)")
            channels = channelsOf(b(pos + 17) & 0xff)
            require((b(pos + 18) & 0xff) == 0, "unsupported PNG compression method")
            require((b(pos + 19) & 0xff) == 0, "unsupported PNG filter method")
            require((b(pos + 20) & 0xff) == 0, "interlaced PNG not supported")
          case "IDAT" => idat.write(b, pos + 8, len)
          case "IEND" => seenIend = true
          case _ => // ancillary (pHYs, tEXt, ...) — CRC-checked, skipped
        }
        pos += 12 + len
      }
      require(seenIend, "truncated PNG: no IEND chunk")
      require(width > 0 && idat.size > 0, "PNG missing IHDR or IDAT")
      val stride = width * channels
      val rawLen = height * (1 + stride)
      val raw = new Array[Byte](rawLen)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        require(n > 0 || inf.finished(), "truncated PNG zlib stream")
        off += n
      }
      inf.end()
      require(off == rawLen, s"PNG scanline data short: $off of $rawLen bytes")

      val px = new Array[Byte](height * stride)
      val bpp = channels
      var y = 0
      while (y < height) {
        val f = raw(y * (1 + stride)) & 0xff
        require(f <= 4, s"invalid PNG filter type $f")
        val rowIn = y * (1 + stride) + 1
        val rowOut = y * stride
        var i = 0
        while (i < stride) {
          val x = raw(rowIn + i) & 0xff
          val left = if (i >= bpp) px(rowOut + i - bpp) & 0xff else 0
          val up = if (y > 0) px(rowOut - stride + i) & 0xff else 0
          val ul = if (y > 0 && i >= bpp) px(rowOut - stride + i - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          px(rowOut + i) = ((x + pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      Decoded(width, height, channels, "png", px)
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
    require((d.channels == 3 || d.channels == 1) && d.width > 0 && d.height > 0,
      s"resize needs a decoded RGB or grayscale image, got ${d.format} ${d.width}x${d.height}")
    require(tw > 0 && th > 0)
    val ch = d.channels
    val out = new Array[Byte](tw * th * ch)
    var y = 0
    while (y < th) {
      val sy = y.toLong * d.height / th
      var x = 0
      while (x < tw) {
        val sx = x.toLong * d.width / tw
        val si = ((sy * d.width + sx) * ch).toInt
        val di = (y * tw + x) * ch
        var c = 0
        while (c < ch) { out(di + c) = d.payload(si + c); c += 1 }
        x += 1
      }
      y += 1
    }
    Decoded(tw, th, ch, d.format, out)
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

  /** Magic-byte sniffing decode: BMP / PPM / WAV / PNG / baseline
    * JPEG, else an explicit `unknown` row (zero dims) rather than an
    * exception — at corpus scale one corrupt blob must not kill a
    * partition.
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
      else if (is(0, "GIF87a") || is(0, "GIF89a")) Gif.decode(bytes)
      else if (is(0, "RIFF") && is(8, "WAVE")) Wav.decode(bytes)
      else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && is(1, "PNG"))
        Png.decode(bytes)
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xFF &&
               (bytes(1) & 0xff) == 0xD8 && (bytes(2) & 0xff) == 0xFF)
        Jpeg.decode(bytes)
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
