package graft.dsl

import org.scalatest.funsuite.AnyFunSuite

/** Sheet-protocol and dry-validation specs; error cases mirror
  * example_data/virheita_Virheet_taulukossa.csv (missing start date,
  * empty master_alias, empty row) and the syntax sheet's station/sensor
  * existence rows.
  */
class SheetParserSpec extends AnyFunSuite {

  private val goodSheet =
    """start,end,
      |1.2.2018,31.3.2018,
      |site,master_alias,condition
      |Sipoo Itään,A1,s1120#keli_1 = 8 and s1120#tie_1 < -3
      |Sipoo Itään,B1,not sipoo_itaan#a1
      |""".stripMargin

  test("good sheet: dates widened, conditions parsed in order") {
    val p = SheetParser.parse("sheet1", goodSheet)
    assert(p.sheetErrors.isEmpty)
    val spec = p.spec.get
    assert(spec.timeFrom == java.time.LocalDateTime.of(2018, 2, 1, 0, 0, 0))
    assert(spec.timeUntil == java.time.LocalDateTime.of(2018, 3, 31, 23, 59, 59))
    assert(spec.conditions.map(_.idString) ==
      Vector("sipoo_itaan_a1", "sipoo_itaan_b1"))
  }

  test("missing start date recorded") {
    val p = SheetParser.parse("s", ",31.3.2018\n".prepended('\n'))
    assert(p.spec.isEmpty)
    assert(p.sheetErrors.messages.exists(_.contains("Missing start date")))
  }

  test("empty master_alias cell skips row with error") {
    val sheet = goodSheet + "Sipoo Itään,,s1120#keli_1 = 8\n"
    val p = SheetParser.parse("s", sheet)
    assert(p.spec.get.conditions.size == 2)
    assert(p.sheetErrors.messages.exists(_.contains("row skipped")))
  }

  test("fully empty rows are ignored silently") {
    val sheet = goodSheet + "\n\n"
    val p = SheetParser.parse("s", sheet)
    assert(p.spec.get.conditions.size == 2)
    assert(p.sheetErrors.isEmpty)
  }

  test("duplicate (site, master_alias) recorded") {
    val sheet = goodSheet + "Sipoo Itään,A1,s1120#keli_1 = 7\n"
    val p = SheetParser.parse("s", sheet)
    assert(p.spec.get.conditions.size == 2)
    assert(p.sheetErrors.messages.exists(_.contains("Duplicate condition identifier")))
  }

  test("duplicate row's diagnostics keyed by row, original collector intact") {
    // original A1 parses clean; the duplicate A1 row carries a parse
    // error — it must NOT overwrite the original's (empty) collector
    val sheet = goodSheet + "Sipoo Itään,A1,s1120#keli_1 == 7\n"
    val p = SheetParser.parse("s", sheet)
    assert(p.spec.get.conditions.size == 2)
    assert(!p.conditionErrors.contains("sipoo_itaan_a1"),
      p.conditionErrors.keySet.toString)
    assert(p.conditionErrors.keys.exists(_.matches(".*[Aa]1 \\(row \\d+\\)")),
      p.conditionErrors.keySet.toString)
  }

  test("quoted cells with commas") {
    assert(SheetParser.splitCsvLine("""a,"b,c",d""") == Vector("a", "b,c", "d"))
    assert(SheetParser.splitCsvLine("a,\"say \"\"hi\"\"\",d") ==
      Vector("a", "say \"hi\"", "d"))
  }
}

class ValidationSpec extends AnyFunSuite {

  test("resource sets load (761 stations, 69 sensors — tsa/utils.py:115-273)") {
    assert(Validation.localStationIds.size == 761)
    assert(Validation.localSensorIds.size == 69)
    assert(Validation.localStationIds.contains(1120))
    assert(Validation.localSensorIds("keli_1") == 27)
    assert(Validation.localSensorIds("tie_1") == 3)
  }

  test("dry validation: clean sheet passes") {
    val sheet =
      """start,end
        |1.2.2018,31.3.2018
        |site,master_alias,condition
        |Sipoo Itään,A1,s1120#keli_1 = 8 and s1120#tie_1 < -3
        |""".stripMargin
    val res = Validation.dryValidate(Seq("sheet1" -> sheet))
    assert(res.ok, res.tree.toJson)
  }

  test("dry validation: unknown station and sensor recorded (virheita rows)") {
    val sheet =
      """start,end
        |1.2.2018,31.3.2018
        |site,master_alias,condition
        |site,A1,s111220#keli_1 = 8
        |site,A2,s1120#keli_10 = 8
        |""".stripMargin
    val res = Validation.dryValidate(Seq("sheet1" -> sheet))
    assert(!res.ok)
    val json = res.tree.toJson
    assert(json.contains("Station id \\\"111220\\\" does not exist"))
    assert(json.contains("No sensor id found by sensor name \\\"keli_10\\\""))
  }

  test("error tree JSON shape") {
    val node = ErrorNode("analysis", Nil, Map(
      "sheet1" -> ErrorNode("sheet1", List("boom"), Map(
        "site_a1" -> ErrorNode("site_a1", List("""bad "quote""""))))))
    val json = node.toJson
    assert(json.contains(""""errors": []"""))
    assert(json.contains(""""sheet1""""))
    assert(json.contains("""bad \"quote\""""))
  }
}
