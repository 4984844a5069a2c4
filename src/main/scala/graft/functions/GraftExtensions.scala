package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring for the engine's native functions — the
  * injection point a cluster enables with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`, making
  * `minhash_agg`, `fvec_dot`, `fvec_cosine` first-class SQL functions in
  * every session (no per-session registration calls).
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(hash) - 64-perm MinHash sketch of the group"),
      (exprs: Seq[Expression]) => MinHashAgg(exprs.head, numPerm = 64)))
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      info("fvec_dot", "fvec_dot(a, b) - double dot product of float vectors"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("fvec_cosine"),
      info("fvec_cosine", "fvec_cosine(a, b) - cosine similarity of float vectors"),
      (exprs: Seq[Expression]) => FloatVectorCosine(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("arr_jaccard"),
      info("arr_jaccard",
        "arr_jaccard(a, b) - exact Jaccard of distinct-element string arrays, rounded to 6"),
      (exprs: Seq[Expression]) => StringArrayJaccard(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode canonical composition (NFC) of a string"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      info("zorder2",
        "zorder2(x, y) - 32-bit Morton code of the low 16 bits of two integer keys"),
      (exprs: Seq[Expression]) => ZOrder2(exprs(0), exprs(1))))
  }
}
