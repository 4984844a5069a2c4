package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image dedup: difference hash (dHash) over genuinely
  * decoded pixels, plus the banded Hamming near-dup join — the image
  * face of the SimHash machinery. dHash is the public
  * gradient-fingerprint scheme (resize to 9×8, compare horizontal
  * neighbors → 64 bits): robust to re-encoding and scaling, cheap
  * enough to run at corpus scale, and — unlike a byte-level md5 — it
  * keys on what the image LOOKS like, so the same photo saved as BMP
  * and PPM (or resized) dedups.
  *
  * Everything is integer arithmetic over the decoded pixel stream
  * (nearest-neighbor index map, integer-mean grayscale, comparisons),
  * so the full hash replays in the DuckDB oracle. The 64 bits are
  * carried as two unsigned 32-bit words (`dhash_hi`, `dhash_lo`) —
  * BIGINT-safe in every engine, no sign-bit edge cases.
  *
  * Scale: hashing is one decode per row (no shuffle); the near-dup
  * join buckets on 8-bit bands of the hash, so candidate generation is
  * an equi-join on (band, value) — the pigeonhole guarantee makes it
  * EXACT for distance ≤ 7 (8 disjoint bands; ≤7 flipped bits leave
  * some band untouched). The n² comparison never happens; a viral
  * image's million-copy bucket salts through the same distinct path
  * as SimHash's.
  */
object ImageHash {

  /** 64-bit dHash of a decoded image as (hi, lo) unsigned 32-bit
    * words. Bit k (k = y*8+x, within the word) is set iff
    * gray(x+1, y) > gray(x, y) on the 9×8 nearest-neighbor resize;
    * rows 0-3 → lo, rows 4-7 → hi. Grayscale = (r+g+b)/3 integer
    * division — engine-portable, no float luma weights.
    */
  private val ImageFormats = Set("bmp", "ppm", "png", "jpeg", "gif")

  def dhash64(bytes: Array[Byte]): (Int, Int) = {
    val d0 = MediaCodecs.sniffDecode(bytes)
    // grayscale audio decodes to channels=1 too — gate on the FORMAT,
    // not the channel count, so a WAV never hashes as an image
    require(ImageFormats(d0.format) && (d0.channels == 3 || d0.channels == 1),
      s"dhash needs an image, got ${d0.format} channels=${d0.channels}")
    dhash64Decoded(d0)
  }

  /** dHash over an already-decoded image — the video path hashes
    * frames it has just JPEG-decoded without re-encoding them.
    */
  private[operators] def dhash64Decoded(d0: MediaCodecs.Decoded): (Int, Int) = {
    val d = MediaCodecs.resizeNearest(d0, 9, 8)
    def gray(x: Int, y: Int): Int =
      if (d.channels == 3) {
        val base = (y * 9 + x) * 3
        ((d.payload(base) & 0xff) + (d.payload(base + 1) & 0xff) +
          (d.payload(base + 2) & 0xff)) / 3
      } else d.payload(y * 9 + x) & 0xff
    var hi = 0; var lo = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) {
          if (y < 4) lo |= 1 << (y * 8 + x)
          else hi |= 1 << ((y - 4) * 8 + x)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** (id, dhash_hi, dhash_lo) per image — decode + hash, one pass,
    * no shuffle.
    */
  def dhash(df: DataFrame, idCol: String = "id",
            mediaCol: String = "media"): DataFrame = {
    val h = udf { (bytes: Array[Byte]) =>
      val (hi, lo) = dhash64(bytes)
      Array(hi.toLong & 0xffffffffL, lo.toLong & 0xffffffffL)
    }
    df.select(col(idCol).as("id"), h(col(mediaCol)).as("h"))
      .select(col("id"), col("h")(0).as("dhash_hi"), col("h")(1).as("dhash_lo"))
  }

  /** Exact-duplicate collapse: one representative (min id) per
    * distinct dHash. A duplicate-saturated image corpus (the common
    * case — memes, logos, re-hosted thumbnails) collapses LINEARLY
    * here, which is what makes the near-dup pair step below tractable:
    * pairs among distinct signatures are bounded by the visual
    * diversity of the corpus, not its row count.
    */
  def exactClusters(df: DataFrame, idCol: String = "id",
                    mediaCol: String = "media"): DataFrame =
    dhash(df, idCol, mediaCol)
      .groupBy("dhash_hi", "dhash_lo").agg(min(col("id")).as("id"))
      .select("id", "dhash_hi", "dhash_lo")

  /** Near-duplicate image pairs with Hamming distance ≤ `maxDist`
    * (must be ≤ 7 for the band recall guarantee). Candidates via the
    * 8-bit-band equi-join; exact distance verified on candidates only.
    * Returns (id_a, id_b, dist).
    *
    * SCALE NOTE (measured, SCALING.md): on a duplicate-saturated
    * corpus the PAIR RELATION ITSELF is quadratic — 5k synthetic
    * images in ~300 hash classes produce ~2.4M true pairs, and no
    * algorithm outruns its own output. The production composition is
    * [[exactClusters]] first (linear collapse), then pairs among the
    * representatives — the `q_image_neardup` gate runs exactly that.
    */
  def nearDupPairs(df: DataFrame, idCol: String = "id",
                   mediaCol: String = "media", maxDist: Int = 7): DataFrame =
    nearDupPairsFromHashes(
      dhash(df, idCol, mediaCol).localCheckpoint(eager = false), maxDist)

  /** The pair join at the hash altitude — callers plug in raw hashes
    * ([[dhash]]) or deduped representatives ([[exactClusters]]).
    */
  def nearDupPairsFromHashes(hashFrame: DataFrame, maxDist: Int = 7): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"8 disjoint 8-bit bands guarantee recall only for dist <= 7, got $maxDist")
    val hashes = hashFrame
    // 8 bands: 4 bytes of each word
    val bands = hashes.select(col("id"), col("dhash_hi"), col("dhash_lo"),
      explode(array((0 until 8).map { b =>
        val word = if (b < 4) col("dhash_lo") else col("dhash_hi")
        val shiftN = (b % 4) * 8
        struct(lit(b).as("band"),
          shiftright(word, shiftN).bitwiseAND(lit(255L)).as("v"))
      }: _*)).as("bv"))
      .select(col("id"), col("dhash_hi"), col("dhash_lo"),
        col("bv.band").as("band"), col("bv.v").as("v"))
    val a = bands.select(col("band"), col("v"), col("id").as("id_a"),
      col("dhash_hi").as("a_hi"), col("dhash_lo").as("a_lo"))
    val b = bands.select(col("band"), col("v"), col("id").as("id_b"),
      col("dhash_hi").as("b_hi"), col("dhash_lo").as("b_lo"))
    a.join(b, Seq("band", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (call_function("bit_count", col("a_hi").bitwiseXOR(col("b_hi"))) +
          call_function("bit_count", col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
