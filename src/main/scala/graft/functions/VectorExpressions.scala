package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense float-vector math.
  *
  * A Scala UDF over `array<float>` deserializes both arrays into boxed
  * Seq[Float] per invocation and breaks whole-stage codegen around the
  * call site; these expressions read `ArrayData` in place and generate
  * a primitive loop into the surrounding codegen stage — the preference
  * order the engine follows everywhere: built-in functions, then a
  * native `Expression` with `doGenCode`, then (only for driver-side
  * loops like the dense self-join kernels) compiled UDF/mapPartitions.
  *
  * Fold order is the plain sequential sum over dimensions — identical
  * to [[graft.operators.Similarity]]'s compiled loops and the DuckDB
  * oracle's unnest-sum, so results are bit-identical across all three.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** `dot(a, b)` = Σ a_i·b_i over the common prefix, accumulated in
  * double.
  */
final case class FloatVectorDot(left: Expression, right: Expression)
  extends FloatVectorBinary {

  override def prettyName: String = "fvec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** `cosine(a, b)` = dot/(‖a‖·‖b‖), all three accumulators in ONE pass
  * over the arrays (a composed dot/sqrt Column tree would re-read both
  * arrays three times).
  */
final case class FloatVectorCosine(left: Expression, right: Expression)
  extends FloatVectorBinary {

  override def prettyName: String = "fvec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // norms over the FULL arrays (tail beyond the common prefix counts)
    i = n
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    i = n
    while (i < y.numElements()) { val v = y.getFloat(i).toDouble; nb += v * v; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = (double) $x.getFloat($i);
         |  double yv = (double) $y.getFloat($i);
         |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |}
         |for (int $i = $n; $i < $x.numElements(); $i++) {
         |  double $v = (double) $x.getFloat($i); $na += $v * $v;
         |}
         |for (int $i = $n; $i < $y.numElements(); $i++) {
         |  double $v = (double) $y.getFloat($i); $nb += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorCosine =
    copy(left = newLeft, right = newRight)
}

/** `jaccard(a, b)` over two DISTINCT-element string arrays:
  * |a∩b| / (|a|+|b|-|a∩b|), rounded to 6 (Spark `round` semantics,
  * BigDecimal HALF_UP) — bit-identical to the operators' UDF/oracle
  * formulation. Natively it hashes `UTF8String`s straight out of the
  * `ArrayData` — the row-at-a-time UDF decoded every shingle to a Java
  * String per PAIR, which dominated the prefix-join verify step — and
  * the loop generates into the surrounding whole-stage-codegen stage.
  * Empty inputs yield 0.0 (no division by zero).
  */
final case class StringArrayJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "arr_jaccard"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 || ny == 0) 0.0
    else {
      val (small, ns, big, nb) = if (nx <= ny) (x, nx, y, ny) else (y, ny, x, nx)
      val set = new java.util.HashSet[Any](ns * 2)
      var i = 0
      while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
      var common = 0
      i = 0
      while (i < nb) { if (set.contains(big.getUTF8String(i))) common += 1; i += 1 }
      java.math.BigDecimal.valueOf(common.toDouble / (nx + ny - common).toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val ns = ctx.freshName("ns")
      val nb = ctx.freshName("nb")
      val set = ctx.freshName("set")
      val common = ctx.freshName("common")
      val i = ctx.freshName("i")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |if ($nx == 0 || $ny == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  org.apache.spark.sql.catalyst.util.ArrayData $small = $x;
         |  org.apache.spark.sql.catalyst.util.ArrayData $big = $y;
         |  int $ns = $nx; int $nb = $ny;
         |  if ($ny < $nx) { $small = $y; $big = $x; $ns = $ny; $nb = $nx; }
         |  java.util.HashSet $set = new java.util.HashSet($ns * 2);
         |  for (int $i = 0; $i < $ns; $i++) { $set.add($small.getUTF8String($i)); }
         |  int $common = 0;
         |  for (int $i = 0; $i < $nb; $i++) {
         |    if ($set.contains($big.getUTF8String($i))) $common++;
         |  }
         |  ${ev.value} = java.math.BigDecimal
         |    .valueOf((double) $common / (double) ($nx + $ny - $common))
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** `zorder2(x, y)` — 32-bit Morton code interleaving the low 16 bits
  * of two non-negative integer keys (x on even bit positions, y on
  * odd). Sorting by the code gives multi-dimensional locality: rows
  * close in BOTH dimensions land in the same parquet row groups, so
  * min/max stats prune range predicates on EITHER column — the
  * data-layout clustering trick large table formats use for 100 TB
  * scans, here as a plain deterministic expression (pure bit
  * arithmetic, so the DuckDB oracle replays every code). Inputs are
  * masked to 16 bits; normalize wider domains first (e.g.
  * `pmod(col, 65536)` or a range-scaled bucket).
  */
final case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "zorder2"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two integral inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave((long) $x, (long) $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Classic bit-twiddling spread: low 16 bits of v to even positions
    * of a 32-bit word (public-domain "interleave by binary magic
    * numbers" construction). Static and Java-callable so generated
    * code shares the exact implementation with interpreted eval.
    */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
  def interleave(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)
}

/** Column-API entry points for the native vector expressions. */
object VectorExpressions {
  def fvecDot(a: Column, b: Column): Column =
    ColumnShim.column(FloatVectorDot(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def fvecCosine(a: Column, b: Column): Column =
    ColumnShim.column(FloatVectorCosine(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def arrJaccard(a: Column, b: Column): Column =
    ColumnShim.column(StringArrayJaccard(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def zorder2(x: Column, y: Column): Column =
    ColumnShim.column(ZOrder2(
      ColumnShim.expression(x), ColumnShim.expression(y)))
}
