package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst MinHash sketch aggregate: `minhash_agg(hash)` over a
  * group's element hashes → the group's `numPerm`-wide signature
  * (elementwise `min((h*a_i + b_i) mod p)`).
  *
  * This is the sketch-as-AGGREGATE form SURVEY.md §7.3 reserves for a
  * custom `TypedImperativeAggregate`: built-in aggregates cannot express
  * "elementwise min over a permuted-hash family" without exploding one
  * row per (element, permutation). As an imperative aggregate it
  * map-side combines — each partition ships one numPerm×8-byte buffer
  * per group, never its elements — and `merge` is elementwise min, so
  * signatures of unions come free (sketch(A∪B) = min(sketch(A),
  * sketch(B))), the property that lets 100 TB corpora keep per-source /
  * per-shard sketches that roll up without rescanning documents.
  *
  * Coefficients match [[graft.operators.Dedup.minhashSignatureUdf]]
  * (same splitmix stream, same prime, same overflow bounds: h < 2^32,
  * a < 2^30 keeps h*a+b under 2^62 — ANSI-safe).
  */
final case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  @transient private lazy val as = MinHashAgg.aCoefs(numPerm)
  @transient private lazy val bs = MinHashAgg.bCoefs(numPerm)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a BIGINT hash input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerm) {
        val m = (h * as(i) + bs(i)) % MinHashAgg.Prime
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    var i = 0
    while (i < numPerm) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Smallest prime > 2^32 — the classic MinHash modulus. */
  val Prime = 4294967311L

  private[graft] def aCoefs(n: Int): Array[Long] =
    Array.tabulate(n)(i => graft.operators.Dedup.lcg(2 * i) % ((1L << 30) - 1) + 1)
  private[graft] def bCoefs(n: Int): Array[Long] =
    Array.tabulate(n)(i => graft.operators.Dedup.lcg(2 * i + 1) % Prime)

  /** Register `name(hash_col)` as a session temp function so DataFrame
    * code reaches it via `expr("name(h)")` and SQL directly.
    */
  def register(spark: SparkSession, name: String = "minhash_agg",
               numPerm: Int = 64): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => MinHashAgg(exprs.head, numPerm), "built-in")
}
