package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The store's BUCKET layout function: `bucket(n, key) =
  * floorMod(xxh64(key), n)` — ONE definition shared by the write path
  * (which clusters rows into per-bucket files via the builtin
  * `xxhash64`, so the layout is whole-stage-codegen'd) and the V2
  * [[ScalarFunction]] the catalog serves to Catalyst (which is how
  * STORAGE-PARTITIONED JOINS check that two tables cluster by the
  * same function, and how Spark would shuffle an unbucketed side to
  * match — the public Iceberg `SparkFunctions.bucket` shape).
  *
  * The two sides MUST agree bit-for-bit: [[GraftBucketSpec]] property-
  * checks [[GraftBucket.apply]] against the `xxhash64` builtin. Keys
  * are LongType only — Spark's xxhash64 hashes an INT column through
  * a different lane (`hashInt`), so binding a non-long key would
  * silently disagree with the written layout; [[BucketUnbound.bind]]
  * refuses it instead.
  */
object GraftBucket {
  /** Spark's xxhash64 builtin seeds XXH64 with 42 and hashes a
    * LongType input through hashLong — mirrored here exactly.
    */
  def hash(key: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(key, 42L)

  def apply(key: Long, n: Int): Int = {
    require(n > 0, s"bucket count must be positive, got $n")
    java.lang.Math.floorMod(hash(key), n.toLong).toInt
  }

  /** Parse a per-file layout spec "bucket(n,b)" → (n, b). */
  def parseLayout(spec: String): Option[(Int, Int)] = {
    val m = BucketLayout.findFirstMatchIn(spec)
    m.map(g => (g.group(1).toInt, g.group(2).toInt))
  }

  def layoutName(n: Int, b: Int): String = s"bucket($n,$b)"

  /** The ONE definition of "uniformly bucketed": every entry carries a
    * `bucket(n,b)` spec with a single shared n. Shared by the table's
    * partitioning report, the scan's clustering derivation and
    * `appendBucketed`'s precondition, so the uniformity rule can never
    * diverge between them.
    */
  def uniformN(layouts: Seq[Option[String]]): Option[Int] = {
    val specs = layouts.map(_.flatMap(parseLayout))
    if (layouts.nonEmpty && specs.forall(_.isDefined)) {
      val ns = specs.flatten.map(_._1).distinct
      if (ns.size == 1) Some(ns.head) else None
    } else None
  }

  private val BucketLayout = """^bucket\((\d+),(\d+)\)$""".r
}

/** `bucket` as a catalog-served V2 function (FunctionCatalog): bound
  * shape matches the `bucket(n, col)` transform's argument order —
  * the numBuckets literal FIRST, then the key column.
  */
object BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): floorMod(xxhash64(key), n) — the snapshot " +
      "store's bucketed-layout function (storage-partitioned joins)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, key BIGINT); got ${inputType.toDDL}")
    val Array(n, k) = inputType.fields
    require(n.dataType == IntegerType,
      s"bucket's numBuckets must be INT, got ${n.dataType.sql}")
    require(k.dataType == LongType,
      s"bucket's key must be BIGINT (an INT key hashes through a " +
        s"different xxhash64 lane than the written layout), got " +
        k.dataType.sql)
    BucketFunction
  }
}

object BucketFunction extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  // SPJ compatibility hinges on this string: two scans report the
  // same clustering iff their transforms bind to the same canonical
  // function
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  override def produceResult(input: InternalRow): Integer =
    GraftBucket(input.getLong(1), input.getInt(0))

  /** The codegen "magic method" — Spark calls this unboxed when one
    * side of an SPJ must shuffle to match the other's clustering.
    */
  def invoke(n: Int, key: Long): Int = GraftBucket(key, n)
}
