package graft.dsl

import graft.model._

/** Parses one atomic logic string into a [[graft.model.BlockSpec]]
  * (reference `Block.unpack_logic`, tsa/block.py:78-179).
  *
  * Case analysis on `#` count and binary-operator count:
  *   - 0 hashtags, 0 ops → secondary ref in parent site (`d1`)
  *   - 1 hashtag,  0 ops → secondary ref with site (`site#d1`)
  *   - 1 hashtag,  1 op  → primary comparison (`s1122#tie_1 < 3`)
  *   - otherwise         → error
  *
  * Operators MUST be surrounded by whitespace (tsa/block.py:88-95); the
  * `in` value must be a parenthesized tuple (tsa/block.py:164-172).
  */
object BlockParser {

  /** `' = ', ' <> ', ' > ', ' < ', ' >= ', ' <= ', ' in '` in reference
    * order (tsa/block.py:93). Space-delimited, so ops never overlap when
    * counting substring occurrences.
    */
  private val binops: Vector[String] =
    Vector(" = ", " <> ", " > ", " < ", " >= ", " <= ", " in ")

  private def countOccurrences(haystack: String, needle: String): Int = {
    var i = haystack.indexOf(needle); var n = 0
    while (i >= 0) { n += 1; i = haystack.indexOf(needle, i + 1) }
    n
  }

  /** @return Right(spec) or Left(error messages); alias is
    *   `<masterAlias>_<orderNr>` (tsa/block.py:44).
    */
  def parse(masterAlias: String, parentSite: String, orderNr: Int,
            rawLogic: String): Either[List[String], BlockSpec] = {
    val errs = scala.collection.mutable.ListBuffer.empty[String]

    val master = Identifiers.toPgIdentifier(masterAlias) match {
      case Right(m) => m
      case Left(e) => errs += e; ""
    }
    val site = Identifiers.toPgIdentifier(parentSite) match {
      case Right(s) => s
      case Left(e) => errs += e; ""
    }
    if (errs.nonEmpty) return Left(errs.toList)

    val alias = s"${master}_$orderNr"

    val nHashtags = rawLogic.count(_ == '#')
    if (nHashtags > 1)
      errs += """Too many "#" symbols, only one or zero allowed"""

    // Last matching operator wins the tie (mirrors the reference's loop
    // that overwrites binop_in_str on every hit, tsa/block.py:96-101).
    var nBinops = 0
    var binop: Option[String] = None
    binops.foreach { op =>
      val c = countOccurrences(rawLogic, op)
      if (c > 0) { nBinops += c; binop = Some(op) }
    }
    if (nBinops > 1)
      errs += """Too many "=", "<>", ">", "<", ">=", "<=", "in" operators, only one or zero allowed"""
    if (errs.nonEmpty) return Left(errs.toList)

    (nHashtags, nBinops) match {
      // Case 1/2: secondary reference (tsa/block.py:113-146)
      case (0, 0) =>
        Identifiers.toPgIdentifier(rawLogic) match {
          case Right(src) => Right(SecondaryBlock(alias, rawLogic, orderNr, site, src))
          case Left(e) =>
            Left(List("Cannot set source alias and view for secondary condition: " + e))
        }
      case (1, 0) =>
        val parts = rawLogic.split("#", 2)
        (Identifiers.toPgIdentifier(parts(0)), Identifiers.toPgIdentifier(parts(1))) match {
          case (Right(st), Right(src)) =>
            Right(SecondaryBlock(alias, rawLogic, orderNr, st, src))
          case (a, b) =>
            Left(List("Cannot set site, source alias and view for secondary condition: " +
              List(a, b).collect { case Left(e) => e }.mkString("; ")))
        }

      // Case 3: primary comparison (tsa/block.py:148-175)
      case (1, 1) =>
        val op = binop.get
        val hashParts = rawLogic.split("#", 2)
        val opIdx = hashParts(1).indexOf(op)
        val sensorRaw = hashParts(1).substring(0, opIdx)
        val valueRaw = hashParts(1).substring(opIdx + op.length)
        val stationE = Identifiers.toPgIdentifier(hashParts(0))
        val sensorE = Identifiers.toPgIdentifier(sensorRaw)
        (stationE, sensorE) match {
          case (Right(station), Right(sensor)) =>
            // station id = the digits of the station token (tsa/block.py:158)
            val digits = station.filter(_.isDigit)
            // toIntOption: 10+ digits would overflow Int — record an
            // error instead of throwing past the accumulate-errors
            // posture (the reference records and skips, tsa/error.py:54).
            digits.toIntOption match {
              case None if digits.isEmpty =>
                Left(List("Cannot set attributes for primary condition: " +
                  s"""no digits in station identifier "$station""""))
              case None =>
                Left(List("Cannot set attributes for primary condition: " +
                  s"""station number "$digits" is out of range"""))
              case Some(stationId) =>
                val cmpOp = CmpOp.fromSym(op.trim.toLowerCase).get
                val valueStr = valueRaw.toLowerCase.trim
                parseValues(cmpOp, valueStr).map { vs =>
                  PrimaryBlock(alias, rawLogic, orderNr, station, stationId,
                    sensor, cmpOp, vs)
                }
            }
          case (a, b) =>
            Left(List("Cannot set attributes for primary condition: " +
              List(a, b).collect { case Left(e) => e }.mkString("; ")))
        }

      // Case 4: operator without hashtag (tsa/block.py:174-179)
      case _ =>
        Left(List("""Primary Block requires a "#" between station and sensor"""))
    }
  }

  /** The reference splices `value_str` into SQL as text and lets Postgres
    * fail at execution (tsa/block.py:211-221, database/01_init_db.sql:138);
    * we parse numerics at plan time instead — same rejection surface, but
    * typed (SURVEY.md §4 "injection class vanishes").
    */
  private def parseValues(op: CmpOp, valueStr: String): Either[List[String], Vector[Double]] =
    op match {
      case CmpOp.In =>
        if (!(valueStr.startsWith("(") && valueStr.endsWith(")")))
          Left(List(""""in" must be followed by values enclosed by "()""""))
        else {
          val inner = valueStr.substring(1, valueStr.length - 1)
          val parts = inner.split(",").map(_.trim).filter(_.nonEmpty)
          if (parts.isEmpty) Left(List(""""in" tuple is empty"""))
          else {
            val parsed = parts.map(p => p -> p.toDoubleOption)
            parsed.collect { case (p, None) => p } match {
              case bad if bad.nonEmpty =>
                Left(List(s"""non-numeric value(s) in "in" tuple: ${bad.mkString(", ")}"""))
              case _ => Right(parsed.flatMap(_._2).toVector)
            }
          }
        }
      case _ =>
        valueStr.toDoubleOption match {
          case Some(v) => Right(Vector(v))
          case None => Left(List(s"""cannot parse comparison value "$valueStr" as a number"""))
        }
    }
}
