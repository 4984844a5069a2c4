package graft.dsl

import scala.collection.mutable

/** Non-fatal error accumulation (reference tsa/error.py:9-93).
  *
  * Errors are recorded per object, deduped by message — a repeated message
  * bumps the first occurrence's counter instead of appending — and the
  * whole run reports a nested error tree rather than failing fast
  * (SURVEY.md §5 point 3: "error accumulation over assertion").
  */
final class ErrorCollector(val context: String) {

  final case class Err(msg: String, firstAt: java.time.Instant, var nMore: Int = 0) {
    def withContext: String = {
      val base = s"$context: $msg"
      if (nMore > 0) s"$base ($nMore more similar errors)" else base
    }
  }

  private val buf = mutable.ArrayBuffer.empty[Err]

  /** Dedup-counting add (tsa/error.py:71-80). */
  def add(msg: String): Unit =
    buf.find(_.msg == msg) match {
      case Some(e) => e.nMore += 1
      case None    => buf += Err(msg, java.time.Instant.now())
    }

  def addAll(msgs: Iterable[String]): Unit = msgs.foreach(add)

  def errors: List[Err] = buf.toList
  def messages: List[String] = buf.map(_.msg).toList
  def size: Int = buf.size
  def isEmpty: Boolean = buf.isEmpty
  def nonEmpty: Boolean = buf.nonEmpty

  /** One-line, time-ordered message join (tsa/error.py:82-87). */
  def shortStr: String = buf.sortBy(_.firstAt).map(_.msg).mkString("; ")
}

/** Error tree matching the reference's nested JSON shape
  * (tsa/analysis_collection.py:149-187, FIXTURES.md §5):
  * analysis → collections → conditions → blocks, each with an error list.
  */
final case class ErrorNode(
    name: String,
    errors: List[String],
    children: Map[String, ErrorNode] = Map.empty,
) {
  def hasAny: Boolean = errors.nonEmpty || children.values.exists(_.hasAny)

  /** Render as JSON (driver-side sink, SURVEY.md §2.1 S10). */
  def toJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errs = errors.map(q).mkString("[", ",", "]")
    val kids = children.map { case (k, v) => s"${q(k)}: ${v.toJson}" }
      .mkString("{", ",", "}")
    s"""{"errors": $errs, "children": $kids}"""
  }
}
