package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImageHashSpec extends AnyFunSuite with SparkTest {

  private def px(seed: Long)(i: Int): Int = ((seed * 31 + i) % 256).toInt

  test("dHash keys on pixels, not container bytes: BMP == PPM of the same image") {
    val bmp = MediaCodecs.Bmp.encode(16, 12, px(7))
    val ppm = MediaCodecs.Ppm.encode(16, 12, px(7))
    assert(!bmp.sameElements(ppm)) // different containers...
    assert(ImageHash.dhash64(bmp) == ImageHash.dhash64(ppm)) // ...same hash
  }

  test("dHash survives resize of the same image (gradient fingerprint)") {
    val small = MediaCodecs.Bmp.encode(18, 16, px(7))
    // 2x nearest-neighbor upscale of the same logical image
    val d = MediaCodecs.sniffDecode(small)
    val big = MediaCodecs.resizeNearest(d, 36, 32)
    val bigPpm = MediaCodecs.Ppm.encode(36, 32, i => big.payload(i) & 0xff)
    val (h1, l1) = ImageHash.dhash64(small)
    val (h2, l2) = ImageHash.dhash64(bigPpm)
    val dist = Integer.bitCount(h1 ^ h2) + Integer.bitCount(l1 ^ l2)
    assert(dist <= 7, s"2x upscale drifted the hash by $dist bits")
  }

  test("banded near-dup pairs == brute force for dist <= 7 (pigeonhole recall)") {
    import spark.implicits._
    val imgs = (0L until 60L).map { id =>
      (id, MediaCodecs.Bmp.encode(8 + (id % 3).toInt, 8, px(id)))
    }.toDF("id", "media")
    val banded = ImageHash.nearDupPairs(imgs, maxDist = 7)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = (0L until 60L).map { id =>
      id -> ImageHash.dhash64(
        MediaCodecs.Bmp.encode(8 + (id % 3).toInt, 8, px(id)))
    }
    val brute = (for {
      (ia, (hi1, lo1)) <- hashes
      (ib, (hi2, lo2)) <- hashes if ia < ib
      d = Integer.bitCount(hi1 ^ hi2) + Integer.bitCount(lo1 ^ lo2)
      if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("non-image media fails loudly, not with a garbage hash") {
    val wav = MediaCodecs.Wav.encode(16, 1, 8000, _ % 65536)
    intercept[IllegalArgumentException] { ImageHash.dhash64(wav) }
  }
}
