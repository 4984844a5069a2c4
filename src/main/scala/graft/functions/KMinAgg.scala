package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst K-MINIMUM-VALUES aggregate: `KMin.agg(h, k)` → the
  * group's k smallest DISTINCT longs as a sorted ARRAY<BIGINT>. The
  * KMV θ-sketch builder rides this ([[graft.operators.Sketches
  * .kmvSketch]]): one aggregate whose partial buffers are bounded
  * TreeSets replaces the prefilter→distinct→TakeOrdered pipeline —
  * map-side partials are ≤ k longs each, the single-partition reduce
  * merges ≤ k·partitions longs, and NOTHING data-sized crosses the
  * wire (the same exchange bound the old per-partition prefilter
  * achieved, with two fewer operators and no distinct's hash
  * aggregate).
  *
  * Imperative-aggregate shape for the same reason as [[MinHashAgg]] /
  * [[KeyBloomAgg]]: built-in aggregates cannot maintain a bounded
  * ordered set. The buffer bound makes memory k·8 bytes per group
  * regardless of input rows; `merge` is a bounded set-union, so
  * sketches of unions compose exactly (union IS the KMV merge).
  */
final case class KMinAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k_min_agg needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_agg requires a BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "k_min_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(ts: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (ts.size < k) { ts.add(h); () }
    else if (h < ts.last) { if (ts.add(h)) { ts.pollLast(); () } }

  override def update(ts: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(ts, v.asInstanceOf[Long])
    ts
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(ts: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](ts.size)
    val it = ts.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending
  }

  override def serialize(ts: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ts.size * 8)
    val it = ts.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val ts = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) { ts.add(bb.getLong); () }
    ts
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinAgg =
    copy(child = newChild)
}

object KMin {
  /** The aggregate as a Column. */
  def agg(value: Column, k: Int): Column =
    ColumnShim.column(
      KMinAgg(ColumnShim.expression(value), k).toAggregateExpression())
}
