package graft.dsl

import graft.model._
import scala.util.matching.Regex

/** Parses a full condition string into a [[graft.model.ConditionSpec]]
  * (reference `Condition.make_blocks`, tsa/condition.py:155-305).
  *
  * Pipeline: whitespace-normalize → split on parens / space-delimited
  * and|or|not → re-glue `in (…)` tuples → classify tokens → dedup equal
  * raw logics to one block alias (CSE, tsa/condition.py:229-240) →
  * adjacency-matrix validation (tsa/condition.py:84-153) → recursive
  * descent to an [[graft.model.Expr]] AST with SQL precedence
  * (NOT > AND > OR — the reference splices the string into Postgres SQL,
  * tsa/condition.py:271-285; we compile a real AST to a Column instead).
  */
object ConditionParser {

  sealed trait Tok { def text: String }
  final case class OpenPar(text: String = "(") extends Tok
  final case class ClosePar(text: String = ")") extends Tok
  final case class AndOr(text: String) extends Tok
  final case class NotTok(text: String = "not") extends Tok
  final case class BlockTok(spec: BlockSpec) extends Tok { def text: String = spec.rawLogic }

  /** Split pattern mirroring tsa/condition.py:186-187: parens, and/or/not
    * surrounded by spaces, or a leading `not `.
    */
  private val sep: Regex =
    """([()]|(?<=\s)and(?=\s)|(?<=\s)or(?=\s)|(?<=\s)not(?=\s)|^not(?=\s))""".r

  /** Regex-split keeping separators (Python re.split with capture group). */
  private[dsl] def rawTokens(condition: String): Vector[String] = {
    val value = condition.split("\\s+").filter(_.nonEmpty).mkString(" ").trim
    val out = Vector.newBuilder[String]
    var last = 0
    for (m <- sep.findAllMatchIn(value)) {
      if (m.start > last) out += value.substring(last, m.start)
      out += m.matched
      last = m.end
    }
    if (last < value.length) out += value.substring(last)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Re-glue `in (…)` tuples that the paren split broke apart
    * (tsa/condition.py:195-205): a token ending in " in" absorbs the next
    * with a space; a token containing " in " but not yet closed by ")"
    * absorbs the next without one.
    */
  private[dsl] def reglueInTuples(sp: Vector[String]): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (el <- sp) {
      if (out.isEmpty) out += el
      else if (out.last.length > 3 && out.last.endsWith(" in"))
        out(out.size - 1) = out.last + " " + el
      else if (out.last.contains(" in ") && !out.last.endsWith(")"))
        out(out.size - 1) = out.last + el
      else out += el
    }
    out.toVector
  }

  /** Legal adjacency pairs (tsa/condition.py:104-153). */
  private def kind(t: Tok): String = t match {
    case _: OpenPar => "open_par"
    case _: ClosePar => "close_par"
    case _: AndOr => "andor"
    case _: NotTok => "not"
    case _: BlockTok => "block"
  }
  private val allowedFirst = Set("open_par", "not", "block")
  private val allowedLast = Set("close_par", "block")
  private val allowedPairs = Set(
    ("open_par", "open_par"), ("open_par", "not"), ("open_par", "block"),
    ("close_par", "close_par"), ("close_par", "andor"),
    ("andor", "open_par"), ("andor", "not"), ("andor", "block"),
    ("not", "open_par"), ("not", "block"),
    ("block", "close_par"), ("block", "andor"))

  private def validateOrder(toks: Vector[Tok], errors: ErrorCollector): Boolean = {
    var ok = true
    toks.zipWithIndex.foreach { case (t, i) =>
      if (i == 0 && !allowedFirst.contains(kind(t))) {
        errors.add(s""""${t.text}" cannot be first element in condition""")
        ok = false
      }
      if (i == toks.size - 1 && !allowedLast.contains(kind(t))) {
        errors.add(s""""${t.text}" cannot be last element in condition""")
        ok = false
      }
      if (i < toks.size - 1 && !allowedPairs.contains((kind(t), kind(toks(i + 1))))) {
        errors.add(
          s"""Illegal combination in condition: "${t.text}" before "${toks(i + 1).text}" """)
        ok = false
      }
    }
    ok
  }

  /** Recursive descent over the validated token stream.
    * Grammar: or := and ("and"|"or" binds per keyword) — SQL precedence:
    * or-expr := and-expr ("or" and-expr)* ; and-expr := not-expr
    * ("and" not-expr)* ; not-expr := "not" not-expr | "(" or-expr ")" | block.
    */
  private def parseExpr(toks: Vector[Tok]): Either[String, Expr] = {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.size) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }

    def orExpr(): Either[String, Expr] =
      andExpr().flatMap { left =>
        var acc = left
        var err: Option[String] = None
        while (err.isEmpty && peek.exists { case AndOr("or") => true; case _ => false }) {
          next()
          andExpr() match {
            case Right(r) => acc = Expr.Or(acc, r)
            case Left(e) => err = Some(e)
          }
        }
        err.toLeft(acc)
      }

    def andExpr(): Either[String, Expr] =
      notExpr().flatMap { left =>
        var acc = left
        var err: Option[String] = None
        while (err.isEmpty && peek.exists { case AndOr("and") => true; case _ => false }) {
          next()
          notExpr() match {
            case Right(r) => acc = Expr.And(acc, r)
            case Left(e) => err = Some(e)
          }
        }
        err.toLeft(acc)
      }

    def notExpr(): Either[String, Expr] = peek match {
      case Some(_: NotTok) => next(); notExpr().map(Expr.Not)
      case Some(_: OpenPar) =>
        next()
        orExpr().flatMap { inner =>
          peek match {
            case Some(_: ClosePar) => next(); Right(inner)
            case _ => Left("expected closing parenthesis")
          }
        }
      case Some(BlockTok(spec)) => next(); Right(Expr.Ref(spec.alias))
      case Some(t) => Left(s"""unexpected "${t.text}"""")
      case None => Left("unexpected end of condition")
    }

    orExpr().flatMap { e =>
      if (pos < toks.size) Left(s"""unexpected trailing "${toks(pos).text}"""") else Right(e)
    }
  }

  /** Full parse. Returns None (with errors recorded) if the condition is
    * not analyzable — mirroring the reference's skip-not-crash posture.
    */
  def parse(site: String, masterAlias: String, rawCondition: String,
            errors: ErrorCollector): Option[ConditionSpec] = {
    // umlaut-fold + lowercase the WHOLE condition before anything else
    // (tsa/condition.py:49: `eliminate_umlauts(raw_condition).strip()
    // .lower()`): keywords arrive as AND/OR/NOT/In in real sheets
    val condition = Identifiers.eliminateUmlauts(rawCondition).trim.toLowerCase
    var valid = true

    // Identifier failures abort the whole condition (the reference raises
    // in Condition.__init__ before make_blocks runs); everything below
    // accumulates errors and keeps going.
    var idOk = true
    val normSite = Identifiers.toPgIdentifier(site) match {
      case Right(s) => s
      case Left(e) => errors.add(e); idOk = false; ""
    }
    val normMaster = Identifiers.toPgIdentifier(masterAlias) match {
      case Right(s) => s
      case Left(e) => errors.add(e); idOk = false; ""
    }
    if (!idOk) return None

    val nOpen = condition.count(_ == '(')
    val nClose = condition.count(_ == ')')
    if (nOpen != nClose) {
      errors.add(s"""Unequal of "(" ($nOpen) and ")" ($nClose) in condition""")
      valid = false
    }

    val glued = reglueInTuples(rawTokens(condition))

    val keywords = Map("(" -> "open_par", ")" -> "close_par",
      "and" -> "andor", "or" -> "andor", "not" -> "not")

    // Classify; equal raw logic within the condition reuses the existing
    // block (same alias, no new order number) — tsa/condition.py:229-240.
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val blocksByRaw = scala.collection.mutable.LinkedHashMap.empty[String, BlockSpec]
    var orderNr = 0
    for (el <- glued) {
      keywords.get(el) match {
        case Some("open_par") => toks += OpenPar()
        case Some("close_par") => toks += ClosePar()
        case Some("andor") => toks += AndOr(el)
        case Some("not") => toks += NotTok()
        case _ =>
          blocksByRaw.get(el) match {
            case Some(existing) => toks += BlockTok(existing)
            case None =>
              BlockParser.parse(normMaster, normSite, orderNr, el) match {
                case Right(spec) =>
                  blocksByRaw(el) = spec
                  toks += BlockTok(spec)
                  orderNr += 1
                case Left(es) =>
                  es.foreach(errors.add)
                  errors.add(s"""Cannot create Block from "$el"""")
                  valid = false
              }
          }
      }
    }

    val tokVec = toks.toVector
    valid = validateOrder(tokVec, errors) && valid

    val blocks = blocksByRaw.values.toVector
    if (blocks.isEmpty) {
      errors.add("No Blocks were created")
      valid = false
    }

    // alias_condition string for reports (tsa/condition.py:271-285)
    val aliasCondition = tokVec.map {
      case AndOr(s) => s" $s "
      case _: NotTok => "not "
      case t: OpenPar => t.text
      case t: ClosePar => t.text
      case BlockTok(spec) => spec.alias
    }.mkString

    if (!valid) {
      errors.add("There were errors with this condition and it will not be analyzed")
      return None
    }

    parseExpr(tokVec) match {
      case Right(expr) =>
        Some(ConditionSpec(normSite, normMaster, condition, blocks, expr, aliasCondition))
      case Left(e) =>
        errors.add(s"Cannot parse condition: $e")
        errors.add("There were errors with this condition and it will not be analyzed")
        None
    }
  }
}
