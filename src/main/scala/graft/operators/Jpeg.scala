package graft.operators

/** Baseline JPEG (ITU-T T.81 | ISO/IEC 10918-1), the dominant lossy
  * format in real image corpora — sequential DCT, Huffman entropy
  * coding, 8-bit samples.
  *
  * The DECODER is the production path and handles general baseline
  * streams: full marker walk (APPn/COM skipped, DRI honored with RSTn
  * predictor resets), any DQT/DHT set read FROM the stream (canonical
  * Huffman per F.2.2.3), interleaved MCUs for grayscale, 4:4:4 and
  * 4:2:0 (generic h×v sampling loop, nearest-neighbor chroma
  * upsampling), byte-unstuffing, dequantize → de-zigzag → full 2-D
  * IDCT (A.3.3) → level shift → YCbCr→RGB (the JFIF full-range
  * matrix). Progressive (SOF2), arithmetic coding, 12-bit precision
  * and hierarchical modes are explicitly rejected — `sniffDecode`
  * degrades those to `unknown` rather than mis-decoding.
  *
  * The ENCODER is the test-vector generator: standard Annex-K-shaped
  * pipeline (level shift, FDCT, quantize, zigzag, DC-diff + run-length
  * Huffman, byte stuffing) with programmatically built canonical
  * Huffman tables (all 162 AC symbols — any valid DHT is legal, the
  * decoder must read whatever the stream declares). Lossy in general —
  * but an image of CONSTANT 8×8 blocks has exactly one nonzero
  * coefficient per block (DC = 8·(v−128)), and with the luminance
  * table's q₀ = 16 and even v−128 the quantize/dequantize cancel
  * integer-exactly: decode(encode(img)) == img byte-for-byte. That is
  * what puts a lossy codec under the full value oracle — the gate
  * replays the generating arithmetic, and a hash match proves the
  * marker walk, the Huffman DC-diff chain across every block, the
  * dequantization and the IDCT DC path are all bit-right.
  */
object Jpeg {

  /** Zigzag scan order: zigzag index k → natural (row-major) index
    * (T.81 Figure A.6).
    */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (natural order), quality
    * 50 — q(0,0) = 16 is the DC step the oracle arithmetic leans on.
    */
  private[operators] val QuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.1 chrominance table (natural order). */
  private[operators] val QuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // ---- canonical Huffman ----

  /** Encoder-side canonical table: bits[l] symbols at code length l+1,
    * vals in canonical order → symbol → (code, length).
    */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code; lenOf(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1; l += 1
      }
    }
    def spec: (Array[Int], Array[Int]) = (bits, vals)
  }

  /** Our generated tables: DC sizes 0..11 all at length 4; AC's 162
    * symbols (EOB, ZRL, (run 0-15)×(size 1-10)) all at length 9 —
    * well inside the all-ones guard band at both lengths.
    */
  private val DcTable: HuffEncoder = {
    val bits = new Array[Int](16); bits(3) = 12
    new HuffEncoder(bits, (0 until 12).toArray)
  }
  private val AcTable: HuffEncoder = {
    val syms = 0x00 +: 0xF0 +: (for {
      run <- 0 to 15; size <- 1 to 10
    } yield (run << 4) | size)
    val sorted = syms.toArray // canonical order is ours to choose
    val bits = new Array[Int](16); bits(8) = sorted.length
    new HuffEncoder(bits, sorted)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing (B.1.1.5)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s (F.1.2.3)
      while (nbits != 0) put(1, 1)
    }
  }

  /** Magnitude category (T.81 F.1.2.1.2): bit length of |v|. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ---- encoder ----

  /** Encode an 8-bit image as baseline JFIF. `channels` 1 (grayscale,
    * one SOF0 component) or 3 (RGB input, converted to YCbCr, 4:4:4).
    * `pixel(i)` is the row-major sample stream as in
    * [[MediaCodecs.Png.encode]].
    */
  def encode(width: Int, height: Int, channels: Int,
             pixel: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    require(channels == 1 || channels == 3, "grayscale or RGB only")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >>> 8); out.write(len & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    // DQT, zigzag order on the wire (B.2.4.1)
    def dqt(id: Int, q: Array[Int]) =
      seg(0xDB, (id +: Zigzag.map(q(_))).toArray)
    dqt(0, QuantLuma)
    if (channels == 3) dqt(1, QuantChroma)
    // SOF0: 8-bit precision, all sampling factors 1×1 (4:4:4)
    val comps = (1 to channels).flatMap(c =>
      Seq(c, 0x11, if (c == 1) 0 else 1))
    seg(0xC0, (Array(8, height >>> 8, height & 0xFF,
      width >>> 8, width & 0xFF, channels) ++ comps).map(identity))
    // DHT: one DC and one AC table, shared by all components
    def dht(clazz: Int, id: Int, t: HuffEncoder) = {
      val (bits, vals) = t.spec
      seg(0xC4, ((clazz << 4 | id) +: (bits ++ vals)).toArray)
    }
    dht(0, 0, DcTable); dht(1, 0, AcTable)
    // SOS
    seg(0xDA, (Array(channels) ++
      (1 to channels).flatMap(c => Seq(c, 0x00)) ++
      Array(0, 63, 0)).map(identity))

    // component planes, level-shifted; RGB → YCbCr (JFIF full-range)
    val planes = Array.ofDim[Double](channels, width * height)
    var p = 0
    while (p < width * height) {
      if (channels == 1) planes(0)(p) = pixel(p) - 128.0
      else {
        val r = pixel(p * 3); val g = pixel(p * 3 + 1); val b = pixel(p * 3 + 2)
        planes(0)(p) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        planes(1)(p) = -0.168736 * r - 0.331264 * g + 0.5 * b
        planes(2)(p) = 0.5 * r - 0.418688 * g - 0.081312 * b
      }
      p += 1
    }
    val bw = new BitWriter(out)
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    val prevDc = new Array[Int](channels)
    val coef = new Array[Int](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < channels) {
          val q = if (c == 0) QuantLuma else QuantChroma
          // FDCT (A.3.3) of the 8×8 block, edge-replicated
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0.0
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val px = math.min(mx * 8 + x, width - 1)
                  val py = math.min(my * 8 + y, height - 1)
                  s += planes(c)(py * width + px) *
                    math.cos((2 * x + 1) * u * math.Pi / 16) *
                    math.cos((2 * y + 1) * v * math.Pi / 16)
                  x += 1
                }
                y += 1
              }
              val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
              val f = 0.25 * cu * cv * s
              coef(v * 8 + u) = math.round(f / q(v * 8 + u)).toInt
              v += 1
            }
            u += 1
          }
          // entropy-code the block: DC diff then AC run-lengths
          val dc = coef(0)
          val diff = dc - prevDc(c); prevDc(c) = dc
          val s0 = category(diff)
          bw.put(DcTable.codeOf(s0), DcTable.lenOf(s0))
          if (s0 > 0)
            bw.put(if (diff >= 0) diff else diff + (1 << s0) - 1, s0)
          var k = 1; var run = 0
          while (k < 64) {
            val ac = coef(Zigzag(k))
            if (ac == 0) run += 1
            else {
              while (run > 15) {
                bw.put(AcTable.codeOf(0xF0), AcTable.lenOf(0xF0)); run -= 16
              }
              val sz = category(ac)
              val sym = (run << 4) | sz
              bw.put(AcTable.codeOf(sym), AcTable.lenOf(sym))
              bw.put(if (ac >= 0) ac else ac + (1 << sz) - 1, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0)
            bw.put(AcTable.codeOf(0x00), AcTable.lenOf(0x00)) // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3: mincode/maxcode/valptr per length
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = k; minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit(); var l = 1
      while (l <= 16) {
        if (maxCode(l) >= code && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
        code = (code << 1) | br.bit(); l += 1
      }
      throw new IllegalArgumentException("invalid JPEG Huffman code")
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "truncated JPEG entropy stream")
        var byte0 = b(pos) & 0xFF; pos += 1
        if (byte0 == 0xFF) {
          require(pos < b.length, "truncated JPEG entropy stream")
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed
          else throw new MarkerInStream(m)
        }
        acc = byte0; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def reset(): Unit = { acc = 0; nbits = 0 }
  }
  private final class MarkerInStream(val marker: Int)
    extends RuntimeException(f"marker FF$marker%02X in entropy stream")

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTbl = 0; var acTbl = 0
  }

  /** Decode a baseline JFIF/JPEG byte stream. Returns
    * [[MediaCodecs.Decoded]] with format `"jpeg"`, channels 1
    * (grayscale) or 3 (RGB after YCbCr conversion).
    */
  def decode(b: Array[Byte]): MediaCodecs.Decoded =
    try decodeImpl(b)
    catch {
      // a truncated segment table walks off the buffer — surface the
      // same exception family as every other malformed-stream check
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated JPEG segment")
    }

  private def decodeImpl(b: Array[Byte]): MediaCodecs.Decoded = {
    require(b.length > 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8,
      "not a JPEG: missing SOI")
    var pos = 2
    val quant = Array.ofDim[Int](4, 64) // natural order
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var width = 0; var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0

    def u16(p: Int) = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)

    var scanDone = false
    var planes: Array[Array[Int]] = null
    var planeW: Array[Int] = null; var planeH: Array[Int] = null

    while (!scanDone) {
      require(pos + 1 < b.length, "truncated JPEG: no SOS/EOI")
      require((b(pos) & 0xFF) == 0xFF, f"expected marker at $pos")
      val m = b(pos + 1) & 0xFF; pos += 2
      m match {
        case 0xD8 => // stray SOI: ignore
        case 0xD9 => throw new IllegalArgumentException("EOI before scan")
        case 0xDB => // DQT
          val len = u16(pos); val end = pos + len
          var p = pos + 2
          while (p < end) {
            val pq = (b(p) & 0xFF) >> 4; val tq = b(p) & 0x0F
            require(pq == 0, "12-bit quantization tables not supported")
            var k = 0
            while (k < 64) {
              quant(tq)(Zigzag(k)) = b(p + 1 + k) & 0xFF; k += 1
            }
            p += 65
          }
          pos = end
        case 0xC4 => // DHT
          val len = u16(pos); val end = pos + len
          var p = pos + 2
          while (p < end) {
            val clazz = (b(p) & 0xFF) >> 4; val id = b(p) & 0x0F
            val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xFF)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => b(p + 17 + i) & 0xFF)
            val t = new HuffDecoder(bits, vals)
            if (clazz == 0) dcTables(id) = t else acTables(id) = t
            p += 17 + n
          }
          pos = end
        case 0xC0 | 0xC1 => // SOF0/1 (baseline / extended sequential)
          val p = pos + 2
          require((b(p) & 0xFF) == 8, "only 8-bit precision supported")
          height = u16(p + 1); width = u16(p + 3)
          val nc = b(p + 5) & 0xFF
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.tabulate(nc) { i =>
            val q = p + 6 + i * 3
            Component(b(q) & 0xFF, (b(q + 1) & 0xFF) >> 4,
              b(q + 1) & 0x0F, b(q + 2) & 0xFF)
          }
          pos += u16(pos)
        case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(
            f"unsupported JPEG mode (SOF FF$m%02X): baseline only")
        case 0xDD => restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xDA => // SOS — entropy-coded data follows
          require(comps != null, "SOS before SOF")
          val p = pos + 2
          val ns = b(p) & 0xFF
          require(ns == comps.length, "partial scans not supported")
          var i = 0
          while (i < ns) {
            val cid = b(p + 1 + i * 2) & 0xFF
            val tt = b(p + 2 + i * 2) & 0xFF
            val comp = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS names unknown component $cid"))
            comp.dcTbl = tt >> 4; comp.acTbl = tt & 0x0F
            i += 1
          }
          pos += u16(pos)

          val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
          require(comps.forall(c => c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2),
            "sampling factors beyond 2 not supported")
          val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
          val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
          planeW = comps.map(c => mcusX * 8 * c.h)
          planeH = comps.map(c => mcusY * 8 * c.v)
          planes = comps.indices.map(i =>
            new Array[Int](planeW(i) * planeH(i))).toArray
          val br = new BitReader(b, pos)
          val prevDc = new Array[Int](comps.length)
          val coef = new Array[Int](64)
          val block = new Array[Int](64)
          var restCount = 0
          var my = 0
          try {
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (restartInterval > 0 && restCount == restartInterval) {
                  // RSTn between MCUs: byte-align, swallow, reset DC
                  br.reset()
                  var q = br.pos
                  while (q + 1 < b.length && ((b(q) & 0xFF) != 0xFF ||
                    (b(q + 1) & 0xFF) < 0xD0 || (b(q + 1) & 0xFF) > 0xD7)) q += 1
                  require(q + 1 < b.length, "missing RST marker")
                  br.pos = q + 2
                  java.util.Arrays.fill(prevDc, 0)
                  restCount = 0
                }
                var ci = 0
                while (ci < comps.length) {
                  val comp = comps(ci)
                  val qt = quant(comp.tq)
                  val dcT = dcTables(comp.dcTbl); val acT = acTables(comp.acTbl)
                  require(dcT != null && acT != null, "scan before DHT")
                  var by = 0
                  while (by < comp.v) {
                    var bx = 0
                    while (bx < comp.h) {
                      java.util.Arrays.fill(coef, 0)
                      val s0 = dcT.decode(br)
                      require(s0 <= 11, "invalid DC category")
                      prevDc(ci) += extend(br.bits(s0), s0)
                      coef(0) = prevDc(ci) * qt(0)
                      var k = 1
                      while (k < 64) {
                        val rs = acT.decode(br)
                        if (rs == 0x00) k = 64 // EOB
                        else if (rs == 0xF0) k += 16 // ZRL
                        else {
                          k += rs >> 4
                          require(k < 64, "AC run past block end")
                          val sz = rs & 0x0F
                          coef(Zigzag(k)) = extend(br.bits(sz), sz) * qt(Zigzag(k))
                          k += 1
                        }
                      }
                      idct(coef, block)
                      // place block into the component plane
                      val ox = (mx * comp.h + bx) * 8
                      val oy = (my * comp.v + by) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          planes(ci)((oy + yy) * planeW(ci) + ox + xx) =
                            block(yy * 8 + xx)
                          xx += 1
                        }
                        yy += 1
                      }
                      bx += 1
                    }
                    by += 1
                  }
                  ci += 1
                }
                restCount += 1
                mx += 1
              }
              my += 1
            }
          } catch {
            case e: MarkerInStream => throw new IllegalArgumentException(
              s"JPEG entropy stream ended early: ${e.getMessage}")
          }
          scanDone = true
        case mk if mk >= 0xD0 && mk <= 0xD7 => // stray RST: skip
        case 0x01 => // TEM, parameterless
        case _ => // APPn, COM, anything else with a length: skip
          pos += u16(pos)
      }
    }

    // assemble output: nearest-neighbor upsample + color convert
    val nc = comps.length
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    val outPx = new Array[Byte](width * height * nc)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (nc == 1) {
          outPx(y * width + x) = clamp(planes(0)(
            (y * comps(0).v / vmax) * planeW(0) + x * comps(0).h / hmax))
        } else {
          def sample(i: Int): Int =
            planes(i)((y * comps(i).v / vmax) * planeW(i) + x * comps(i).h / hmax)
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val o = (y * width + x) * 3
          outPx(o) = clamp(math.round(yy + 1.402 * cr).toInt)
          outPx(o + 1) = clamp(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
          outPx(o + 2) = clamp(math.round(yy + 1.772 * cb).toInt)
        }
        x += 1
      }
      y += 1
    }
    MediaCodecs.Decoded(width, height, nc, "jpeg", outPx)
  }

  private def clamp(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Full 2-D IDCT (A.3.3) + level shift. Direct double-precision
    * basis summation with precomputed cosines — correctness-first; a
    * production hot path would use the AAN factored form, which only
    * changes speed, not values beyond last-ulp (and the gate's DC-only
    * blocks are exact under any conforming IDCT).
    */
  private val Cos: Array[Double] = Array.tabulate(8 * 8)(i =>
    math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16))
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 0.7071067811865476 else 1.0
              val cv = if (v == 0) 0.7071067811865476 else 1.0
              s += cu * cv * c * Cos(x * 8 + u) * Cos(y * 8 + v)
            }
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = math.round(0.25 * s).toInt + 128
        x += 1
      }
      y += 1
    }
  }
}
