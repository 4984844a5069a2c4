package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextExpressionsSpec extends AnyFunSuite with SparkTest {

  test("nfc_normalize composes decomposed sequences and singletons") {
    import spark.implicits._
    // escapes, not glyphs: composed-vs-decomposed is invisible in source
    val cases = Seq(
      (1L, "cafe\u0301", "caf\u00e9"),   // e + combining acute -> e-acute
      (2L, "A\u030A", "\u00c5"),         // A + combining ring -> A-ring
      (3L, "\u2126", "\u03a9"),          // ohm sign -> omega (singleton)
      (4L, "plain ascii stays", "plain ascii stays"),
      (5L, "caf\u00e9 already NFC", "caf\u00e9 already NFC"),
      (6L, "", ""),
      // NFC must NOT apply compatibility folds: the fi ligature and a
      // fullwidth A are unchanged (that would be NFKC)
      (7L, "\ufb01 \uff21", "\ufb01 \uff21"))
    val got = cases.toDF("id", "s", "expect")
      .select(col("id"), col("expect"),
        TextExpressions.nfcNormalize(col("s")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(2) == r.getString(1), s"case ${r.getLong(0)}"))
  }

  test("nfc_normalize: null in, null out") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(TextExpressions.nfcNormalize(col("s"))).head()
    assert(r.isNullAt(0))
  }
}
