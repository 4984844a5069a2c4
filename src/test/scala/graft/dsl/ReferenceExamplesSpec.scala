package graft.dsl

import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Integration parity: parse the reference's OWN example sheets
  * (example_data/toimiva.csv = the golden "works" case;
  * virheita_*.csv = the error corpus) byte-for-byte.
  */
class ReferenceExamplesSpec extends AnyFunSuite {

  private def ref(name: String): String = {
    val p = Paths.get(s"/root/reference/example_data/$name")
    assume(Files.exists(p), s"reference example $name not present")
    Files.readString(p)
  }

  test("toimiva.csv parses clean: 4 conditions, correct types") {
    val parsed = SheetParser.parse("toimiva", ref("toimiva.csv"))
    assert(parsed.sheetErrors.isEmpty, parsed.sheetErrors.shortStr)
    assert(parsed.conditionErrors.isEmpty,
      parsed.conditionErrors.map { case (k, v) => s"$k: ${v.shortStr}" }.mkString(" | "))
    val spec = parsed.spec.get
    assert(spec.timeFrom == java.time.LocalDateTime.of(2018, 2, 1, 0, 0, 0))
    assert(spec.conditions.map(_.idString) == Vector(
      "sipoo_itaan_a1", "aakkoslandia_1_d1", "aakkoslandia_1_d2", "yhdistelma_c1"))

    val byId = spec.conditions.map(c => c.idString -> c).toMap
    // row 1: simple two-block AND, primary
    assert(!byId("sipoo_itaan_a1").secondary)
    assert(byId("sipoo_itaan_a1").blocks.size == 2)
    // row 2: the long nested condition — 10 unique primary blocks
    // (uppercase AND/OR/in and in-tuples all normalize)
    val d1 = byId("aakkoslandia_1_d1")
    assert(!d1.secondary)
    assert(d1.blocks.forall(!_.secondary))
    assert(d1.blocks.collect { case p: PrimaryBlock => p.stationId }.toSet ==
      Set(1115, 1120, 1122))
    // 14 distinct comparisons after CSE dedup of repeated raw logics
    assert(d1.blocks.size == 14, d1.blocks.map(_.rawLogic).mkString("\n"))
    // row 3: mixed primary + trailing secondary ref to D1
    val d2 = byId("aakkoslandia_1_d2")
    assert(d2.secondary)
    assert(d2.blocks.count(_.secondary) == 1)
    assert(d2.blocks.collect { case s: SecondaryBlock => s.sourceView } ==
      Vector("aakkoslandia_1_d1"))
    // row 4: pure secondary cross-site
    val c1 = byId("yhdistelma_c1")
    assert(c1.blocks.size == 3)
    assert(c1.blocks.forall(_.secondary))
    assert(c1.blocks.collect { case s: SecondaryBlock => s.sourceView }.toSet ==
      Set("sipoo_itaan_a1", "aakkoslandia_1_d1", "aakkoslandia_1_d2"))
  }

  test("virheita_Syntaksivirheet.csv: every data row produces an error") {
    val csv = ref("virheita_Syntaksivirheet.csv")
    val parsed = SheetParser.parse("syntaksivirheet", csv)
    // rows: over-long site; over-long alias; D1 ok; D1 duplicate;
    // missing station; station without digits; NOT as binary op; JA
    // keyword; unknown sensor (parses, caught by validation); unknown
    // station (parses; caught by validation); ==; =<; unbalanced parens;
    // dangling secondary refs (parse, caught at scheduling)
    assert(parsed.sheetErrors.nonEmpty || parsed.conditionErrors.nonEmpty)
    val sheetMsgs = parsed.sheetErrors.messages.mkString(" | ")
    assert(sheetMsgs.contains("Duplicate condition identifier"))

    val allCondMsgs = parsed.conditionErrors.values.flatMap(_.messages).mkString(" | ")
    assert(allCondMsgs.contains("too long"))
    assert(allCondMsgs.contains("Illegal combination") ||
      allCondMsgs.contains("Cannot create Block"))
    assert(allCondMsgs.contains("Unequal"))

    // dry validation catches the unknown station / sensor rows
    val res = Validation.dryValidate(Seq("syntaksivirheet" -> csv))
    assert(!res.ok)
    val json = res.tree.toJson
    assert(json.contains("does not exist") || json.contains("No sensor id"))
  }

  test("virheita_Virheet_taulukossa.csv: table-structure errors recorded") {
    val parsed = SheetParser.parse("taulukko", ref("virheita_Virheet_taulukossa.csv"))
    // missing start date → sheet unusable, matching the reference which
    // rejects the whole collection (tsa/cond_collection.py:39-45 asserts)
    assert(parsed.sheetErrors.nonEmpty)
  }
}
