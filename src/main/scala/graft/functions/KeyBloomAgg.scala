package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst BLOOM-FILTER aggregate over long keys:
  * `KeyBloom.agg(key, mBits)` → the group's m-bit filter as BINARY.
  * The snapshot store's per-FILE key blooms ride this (grouped by the
  * file metadata column in the same one-pass stats scan that computes
  * min/max/rows), the role parquet's column bloom filters / Iceberg's
  * puffin blobs play in the public table formats: a point lookup of
  * SCATTERED keys — "fetch these 10 k doc ids from a 100 TB table" —
  * prunes files a range check alone cannot (tight [min, max]
  * envelopes still contain every absent key that falls in a gap).
  *
  * Imperative-aggregate shape for the same reason as [[MinHashAgg]]:
  * built-in aggregates cannot OR positions into a fixed bitmap
  * without exploding one row per (key, hash). The buffer is m/8 bytes
  * per group regardless of row count, map-side combines, and `merge`
  * is byte-OR — so blooms of unions come free, mirroring how manifest
  * stats compose.
  *
  * Hashing is Kirsch–Mitzenmacher over two splitmix64 finalizer
  * streams (`pos_i = (h1 + i·h2) mod m`, k = [[KeyBloom.KHashes]]) —
  * deterministic, engine-replayable, no false NEGATIVES by
  * construction (the property [[KeyBloom.mightContain]] and every
  * pruning caller lean on; false positives only cost an extra file
  * read).
  */
final case class KeyBloomAgg(
    child: Expression,
    mBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(mBits >= 8 && mBits % 8 == 0, s"mBits must be a positive multiple of 8, got $mBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"key_bloom_agg requires a BIGINT key input, got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "key_bloom_agg"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) KeyBloom.set(buf, v.asInstanceOf[Long], mBits)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KeyBloomAgg =
    copy(child = newChild)
}

object KeyBloom {
  /** k = 4 probes per key — with the ~10–16 bits/row the store's
    * sizing guidance recommends, FPR lands at ~1 %–0.2 %; a false
    * positive costs one extra file read, never a wrong row.
    */
  val KHashes = 4

  /** splitmix64 finalizer (public constants — Steele et al.). */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // the two finalizer streams are computed ONCE per key (set() runs
  // for every row of every bloom-enabled commit — recomputing them
  // per probe would quadruple the per-row hash work)
  private def pos(h1: Long, h2: Long, i: Int, mBits: Int): Int =
    java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong).toInt

  private[functions] def set(buf: Array[Byte], key: Long, mBits: Int): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < KHashes) {
      val p = pos(h1, h2, i, mBits)
      buf(p >>> 3) = (buf(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Add one key to a caller-owned filter buffer — the streaming twin
    * of the aggregate, for writers that fold rows one at a time (the
    * DataSourceV2 write path builds its per-file bloom inline with the
    * parquet write instead of paying a second stats scan).
    */
  def add(buf: Array[Byte], key: Long): Unit = set(buf, key, buf.length * 8)

  /** Driver-side membership probe against a stored filter. Never a
    * false negative for a key that was aggregated into `bloom`.
    */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val mBits = bloom.length * 8
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < KHashes) {
      val p = pos(h1, h2, i, mBits)
      if ((bloom(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** The aggregate as a Column (the stats-scan entry point). */
  def agg(key: Column, mBits: Int): Column =
    ColumnShim.column(
      KeyBloomAgg(ColumnShim.expression(key), mBits).toAggregateExpression())
}
