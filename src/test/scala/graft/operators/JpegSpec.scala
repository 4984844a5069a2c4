package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: constant-block exactness (the oracle family),
  * AC-path fidelity within lossy tolerance, color conversion, and
  * corrupt-stream degradation.
  */
class JpegSpec extends AnyFunSuite {

  private def pix(i: Int): Int = (i * 31 + 7) % 256

  test("constant 8x8 blocks round-trip byte-exactly (the gate family)") {
    for (id <- 0L until 6L) {
      val bw = 2 + (id % 3).toInt; val bh = 2 + (id % 2).toInt
      val (w, h) = (bw * 8, bh * 8)
      def v(i: Int): Int = {
        val bx = (i % w) / 8; val by = (i / w) / 8
        2 * ((id * 31 + by * bw + bx) % 128).toInt
      }
      val d = Jpeg.decode(Jpeg.encode(w, h, 1, v))
      assert((d.width, d.height, d.channels, d.format) == ((w, h, 1, "jpeg")))
      val got = d.payload.map(_ & 0xff).toSeq
      assert(got == (0 until w * h).map(v), s"id=$id")
    }
  }

  test("gradient image survives the full AC path within lossy tolerance") {
    val (w, h) = (24, 16)
    def v(i: Int): Int = { val x = i % w; val y = i / w; (x * 7 + y * 5) % 256 }
    val d = Jpeg.decode(Jpeg.encode(w, h, 1, v))
    assert((d.width, d.height) == ((w, h)))
    val errs = (0 until w * h).map(i => math.abs((d.payload(i) & 0xff) - v(i)))
    // quality-50 quantization on a harsh synthetic gradient: generous
    // bound, but catches any systematic decode error (zigzag, EXTEND,
    // dequant), which produces errors in the hundreds
    assert(errs.max <= 64, s"max abs err ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 16, s"mean ${errs.sum.toDouble / errs.size}")
  }

  test("RGB 4:4:4 color round-trips through YCbCr within tolerance") {
    val (w, h) = (16, 8)
    // smooth per-channel gradients — the signal family JPEG is FOR;
    // per-pixel noise would be quantized away by design, not by bug
    def v(i: Int): Int = {
      val p = i / 3; val x = p % w; val y = p / w
      i % 3 match {
        case 0 => 40 + x * 8
        case 1 => 60 + y * 10
        case _ => 200 - x * 4 - y * 3
      }
    }
    val d = Jpeg.decode(Jpeg.encode(w, h, 3, v))
    assert((d.width, d.height, d.channels) == ((w, h, 3)))
    val errs = (0 until w * h * 3).map(i => math.abs((d.payload(i) & 0xff) - v(i)))
    assert(errs.max <= 32, s"max abs err ${errs.max}")
  }

  test("non-multiple-of-8 dimensions decode with edge replication") {
    val (w, h) = (13, 10)
    def v(i: Int): Int = 2 * ((i % w) / 8 * 4 % 128) // constant within blocks
    val d = Jpeg.decode(Jpeg.encode(w, h, 1, v))
    assert((d.width, d.height) == ((w, h)))
    assert(d.payload.map(_ & 0xff).toSeq == (0 until w * h).map(v))
  }

  test("corruption and unsupported modes are rejected; sniffDecode degrades") {
    val good = Jpeg.encode(16, 16, 1, i => 2 * (i / 37 % 128))
    // truncation mid-entropy-stream
    intercept[IllegalArgumentException](Jpeg.decode(good.take(good.length / 2)))
    // progressive SOF2 flag: patch the SOF0 marker byte (find FFC0)
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e.getMessage.contains("baseline"))
    assert(MediaCodecs.sniffDecode(prog).format == "unknown")
    assert(MediaCodecs.sniffDecode(good).format == "jpeg")
    assert(MediaCodecs.sniffDecode(good.take(3)).format == "unknown")
  }

  test("APPn/COM segments are skipped (JFIF-style headers decode)") {
    val good = Jpeg.encode(8, 8, 1, _ => 100)
    // splice a JFIF APP0 right after SOI
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00).map(_.toByte)
    val spliced = good.take(2) ++ app0 ++ good.drop(2)
    val d = Jpeg.decode(spliced)
    assert(d.payload.forall(b => (b & 0xff) == 100))
  }
}
