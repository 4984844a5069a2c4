package graft.dsl

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** DSL specs. Clean cases mirror the reference's example_data/toimiva.csv;
  * error cases mirror example_data/virheita_Syntaksivirheet.csv:4-16
  * (the reference's de-facto correctness corpus, SURVEY.md §5).
  */
class IdentifiersSpec extends AnyFunSuite {
  import Identifiers._

  test("umlauts folded, lowercased, spaces to underscores") {
    assert(toPgIdentifier("Sipoo Itään") == Right("sipoo_itaan"))
    assert(toPgIdentifier("  Ylöjärvi 3 ") == Right("ylojarvi_3"))
  }
  test("leading digit rejected") {
    assert(toPgIdentifier("111220").isLeft)
  }
  test("reserved words rejected") {
    assert(toPgIdentifier("statobs").isLeft)
    assert(toPgIdentifier("sensors").isLeft)
  }
  test("length cap is 63 (enforced behavior, not the documented 40 — tsa/utils.py:81-84)") {
    assert(toPgIdentifier("a" * 63).isRight)
    assert(toPgIdentifier("a" * 64).isLeft)
  }
  test("invalid characters rejected with pointer") {
    val e = toPgIdentifier("foo-bar")
    assert(e.isLeft)
    assert(e.swap.exists(_.contains("^ HERE")))
  }
  test("strfdelta formats seconds") {
    assert(strfdelta(90061) == "1d 1h 1m 1s")
  }
}

class BlockParserSpec extends AnyFunSuite {

  private def parse(raw: String) = BlockParser.parse("a1", "site", 0, raw)

  test("primary block: station#sensor op value") {
    val Right(b: PrimaryBlock) = parse("s1122#tie_1 < 3"): @unchecked
    assert(b.stationId == 1122)
    assert(b.sensorName == "tie_1")
    assert(b.op == CmpOp.Lt)
    assert(b.values == Vector(3.0))
    assert(b.alias == "a1_0")
  }
  test("float literal") {
    val Right(b: PrimaryBlock) = parse("s1115#kitka3_luku >= 0.4"): @unchecked
    assert(b.op == CmpOp.Ge && b.values == Vector(0.4))
  }
  test("in-tuple") {
    val Right(b: PrimaryBlock) = parse("s1122#keli_1 in (2, 3, 5)"): @unchecked
    assert(b.op == CmpOp.In && b.values == Vector(2.0, 3.0, 5.0))
  }
  test("in without parens rejected (tsa/block.py:164-172)") {
    assert(parse("s1122#keli_1 in 2,3").isLeft)
  }
  test("station id overflowing Int records an error, no exception") {
    val res = parse("s99999999999#keli_1 = 1")
    assert(res.isLeft)
    assert(res.left.exists(_.exists(_.contains("out of range"))), res)
  }
  test("secondary ref without site") {
    val Right(b: SecondaryBlock) = parse("d1"): @unchecked
    assert(b.site == "site" && b.sourceAlias == "d1" && b.sourceView == "site_d1")
  }
  test("secondary ref with site") {
    val Right(b: SecondaryBlock) = parse("ylöjärvi_etelään#d1"): @unchecked
    assert(b.site == "ylojarvi_etelaan" && b.sourceView == "ylojarvi_etelaan_d1")
  }
  test("station without digits rejected") {
    assert(parse("sabc#tie_1 < 3").isLeft)
  }
  test("operator without hashtag rejected (case 4)") {
    assert(parse("tie_1 < 3").isLeft)
  }
  test("two hashtags rejected") {
    assert(parse("a#b#c").isLeft)
  }
  test("two operators rejected") {
    assert(parse("s1#x = 1 = 2").isLeft)
  }
  test("bad operator == is not an operator -> not a primary (== splits as '=' twice)") {
    // "s1122#keli_1 == 8": ' = ' occurs once? No: " == " contains no " = "
    // with both spaces; it has "= " and " =". The reference counts 0
    // binops and 1 hashtag -> tries secondary with '#' -> site "s1122",
    // alias "keli_1 == 8" -> invalid char error.
    assert(parse("s1122#keli_1 == 8").isLeft)
  }
}

class ConditionParserSpec extends AnyFunSuite {

  private def parse(site: String, alias: String, cond: String) = {
    val errs = new ErrorCollector(s"COND <${site}_$alias>")
    (ConditionParser.parse(site, alias, cond, errs), errs)
  }

  test("toimiva row 1: two-block AND") {
    val (Some(spec), errs) = parse("Sipoo Itään", "A1",
      "s1120#keli_1 = 8 and s1120#tie_1 < -3"): @unchecked
    assert(errs.isEmpty)
    assert(spec.idString == "sipoo_itaan_a1")
    assert(spec.blocks.map(_.alias) == Vector("a1_0", "a1_1"))
    assert(spec.aliasCondition == "a1_0 and a1_1")
    assert(spec.expr == Expr.And(Expr.Ref("a1_0"), Expr.Ref("a1_1")))
    assert(!spec.secondary)
  }

  test("toimiva row 2: nested parens, in-tuples, 6 stations") {
    val cond = "(s1122#kitka3_luku >= 0.4 and s1122#keli_1 in (2,3)) " +
      "or (s1115#kitka3_luku >= 0.4 and s1115#keli_1 in (2, 3)) " +
      "or (s1101#tie_1 < -5 and not s1101#keli_1 in (7,8))"
    val (Some(spec), errs) = parse("site", "D2", cond): @unchecked
    assert(errs.isEmpty)
    assert(spec.blocks.size == 6)
    assert(spec.blocks.count(!_.secondary) == 6)
  }

  test("mixed primary + secondary") {
    val (Some(spec), errs) = parse("site", "C3",
      "s1130#tie_1 < 0 and d1"): @unchecked
    assert(errs.isEmpty)
    assert(spec.secondary)
    assert(spec.blocks.collect { case s: SecondaryBlock => s.sourceView } ==
      Vector("site_d1"))
  }

  test("pure secondary cross-site (toimiva row 4)") {
    val (Some(spec), errs) = parse("Aakkoslandia 1", "D3",
      "sipoo_itaan#a1 and (aakkoslandia_1#d1 or aakkoslandia_1#d2)"): @unchecked
    assert(errs.isEmpty)
    assert(spec.blocks.size == 3)
    assert(spec.blocks.forall(_.secondary))
    assert(spec.expr == Expr.And(Expr.Ref("d3_0"),
      Expr.Or(Expr.Ref("d3_1"), Expr.Ref("d3_2"))))
  }

  test("CSE: identical raw logic reuses one block (tsa/condition.py:229-240)") {
    val (Some(spec), _) = parse("site", "A1",
      "s1120#tie_1 < -3 or (s1120#keli_1 = 8 and s1120#tie_1 < -3)"): @unchecked
    assert(spec.blocks.size == 2)
    assert(spec.aliasCondition == "a1_0 or (a1_1 and a1_0)")
  }

  test("unbalanced parens recorded") {
    val (res, errs) = parse("site", "A1", "(s1120#keli_1 = 8")
    assert(res.isEmpty)
    assert(errs.messages.exists(_.contains("Unequal")))
  }

  test("NOT as binary operator rejected (virheita row: 'a NOT b')") {
    val (res, errs) = parse("site", "A1",
      "s1120#keli_1 = 8 not s1120#tie_1 < -3")
    assert(res.isEmpty)
    assert(errs.messages.exists(_.contains("Illegal combination")))
  }

  test("Finnish JA is not a keyword -> block parse error") {
    val (res, errs) = parse("site", "A1",
      "s1120#keli_1 = 8 ja s1120#tie_1 < -3")
    assert(res.isEmpty)
    assert(errs.nonEmpty)
  }

  test("over-long site rejected") {
    val (res, errs) = parse("a" * 70, "A1", "s1120#keli_1 = 8")
    assert(res.isEmpty)
    assert(errs.messages.exists(_.contains("too long")))
  }

  test("precedence: NOT > AND > OR") {
    val (Some(spec), _) = parse("s", "A1",
      "not s1#x = 1 and s2#x = 1 or s3#x = 1"): @unchecked
    assert(spec.expr == Expr.Or(
      Expr.And(Expr.Not(Expr.Ref("a1_0")), Expr.Ref("a1_1")),
      Expr.Ref("a1_2")))
  }

  test("trailing 'and' is swallowed into the value string and rejected") {
    // `(?<=\s)and(?=\s)` needs whitespace on BOTH sides; after whitespace
    // normalization a trailing "and" has none, so it lands inside the
    // block's value string — rejected as a non-numeric comparison value
    // (the reference would fail at SQL execution instead).
    val (res, errs) = parse("s", "A1", "s1#x = 1 and")
    assert(res.isEmpty)
    assert(errs.nonEmpty)
  }

  test("open paren last rejected") {
    val (res, errs) = parse("s", "A1", "s1#x = 1 and (")
    assert(res.isEmpty)
    assert(errs.messages.exists(_.contains("cannot be last element")))
  }

  test("leading 'and' is swallowed into the block token (reference quirk)") {
    // The reference's split regex only breaks `and` when surrounded by
    // whitespace (tsa/condition.py:186-187), so a leading "and" becomes
    // part of the block: station "and_s1". Parse succeeds; station-id
    // validation is what catches it later. We mirror that behavior.
    val (res, errs) = parse("s", "A1", "and s1#x = 1")
    assert(errs.isEmpty)
    assert(res.get.blocks.collect { case p: PrimaryBlock => p.station } ==
      Vector("and_s1"))
  }

  test("misplaced 'and' after open paren rejected") {
    val (res, errs) = parse("s", "A1", "( and s1#x = 1 )")
    assert(res.isEmpty)
    assert(errs.messages.exists(_.contains("Illegal combination")))
  }
}
