package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * standard first text-cleaning step for a crawled corpus (decomposed
  * accents, mixed encodings of the same glyph) so that downstream
  * fingerprints, shingles and exact-dedup hashes agree on visually
  * identical strings. Spark has no built-in for it; a Scala UDF would
  * box every row and fence whole-stage codegen, so this follows the
  * engine's standing preference order (built-in > native Expression >
  * UDF). The JDK normalizer implements the Unicode standard's
  * canonical composition — the same algorithm DuckDB's
  * `nfc_normalize` implements, which is what makes a full-value
  * cross-engine oracle possible.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. The isNormalized
    * probe is a cheap forward scan that answers true for ASCII and
    * already-composed text — the overwhelming majority of corpus
    * rows — and skips the allocation entirely there, returning the
    * input buffer unchanged.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object TextExpressions {
  def nfcNormalize(c: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c)))
}
