package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio dedup — the audio face of [[ImageHash]]'s dHash:
  * an energy-difference fingerprint over genuinely decoded PCM (the
  * public Shazam/Chromaprint family's core idea, reduced to its
  * deterministic skeleton). The signal is cut into 65 equal-count
  * frame windows; each window's energy is the INTEGER sum of absolute
  * sample values; bit k of the 64-bit hash is set iff
  * energy(k+1) > energy(k). Sign-of-difference is invariant under
  * positive amplitude scaling (volume/normalization changes), which is
  * exactly the robustness a re-encoded-audio dedup needs — and every
  * step is integer arithmetic over the decoded stream, so the full
  * hash replays in the DuckDB oracle.
  *
  * Scale: one decode per row, no shuffle; near-dup pairs reuse the
  * pigeonhole band join (8 disjoint 8-bit bands → EXACT for Hamming
  * distance ≤ 7), identical to the image path. Collapse exact hashes
  * first (the measured q_image_neardup lesson) before any pair
  * enumeration.
  */
object AudioHash {

  /** 64-bit energy-difference hash of a decoded PCM payload as
    * (hi, lo) unsigned 32-bit words. Windows split the FRAME index
    * range into 65 integer-boundary buckets (window w covers frames
    * [w·n/65, (w+1)·n/65)); channels fold into the same window sum.
    * Audio shorter than 65 frames hashes on whatever windows are
    * non-empty — empty windows contribute energy 0.
    */
  def energyHash64(bytes: Array[Byte]): (Int, Int) = {
    val d = MediaCodecs.sniffDecode(bytes)
    require(d.format == "wav", s"energyHash needs decoded audio, got ${d.format}")
    val nFrames = d.width
    val ch = d.channels
    val energy = new Array[Long](65)
    var f = 0
    while (f < nFrames) {
      val w = ((f.toLong * 65) / nFrames).toInt
      var c = 0
      var acc = 0L
      while (c < ch) {
        val o = (f * ch + c) * 2
        val u = (d.payload(o) & 0xff) | ((d.payload(o + 1) & 0xff) << 8)
        val s = if (u >= 0x8000) u - 0x10000 else u
        acc += math.abs(s)
        c += 1
      }
      energy(w) += acc
      f += 1
    }
    var hi = 0; var lo = 0
    var k = 0
    while (k < 64) {
      if (energy(k + 1) > energy(k)) {
        if (k < 32) lo |= 1 << k else hi |= 1 << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** (id, ahash_hi, ahash_lo) for a binary `media` column of WAV
    * containers; undecodable blobs drop (the decodeMeta contract).
    */
  def ahash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df).select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val (hi, lo) = energyHash64(bytes)
            Iterator.single((id, hi.toLong & 0xffffffffL, lo.toLong & 0xffffffffL))
          } catch { case _: Exception => Iterator.empty }
        }
      }
      .toDF("id", "ahash_hi", "ahash_lo")
  }
}
