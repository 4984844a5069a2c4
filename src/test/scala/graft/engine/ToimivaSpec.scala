package graft.engine

import graft.SparkTest
import graft.dsl.{ErrorCollector, SheetParser}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** End-to-end sheet → engine run shaped like the reference's golden
  * example (example_data/toimiva.csv): multiple sites, an in-tuple and
  * nested parens, a mixed primary+secondary condition, and a pure
  * cross-site secondary condition — submitted OUT of dependency order to
  * exercise the topological scheduler (the reference requires the user
  * to order them, tsa/cond_collection.py:169-171).
  */
class ToimivaSpec extends AnyFunSuite with SparkTest {

  private val t0 = 1517443200L
  private def ts(min: Long): Timestamp = new Timestamp((t0 + min * 60) * 1000)

  private lazy val obs = {
    import spark.implicits._
    // station 1120: keli_1 (27) and tie_1 (3); station 1122: kitka3_luku (181)
    val keli = Seq(0L -> 8.0, 10L -> 8.0, 20L -> 7.0, 30L -> 8.0, 40L -> 8.0, 50L -> 2.0)
      .map { case (m, v) => (ts(m), 1120L, 27L, v) }
    val tie = Seq(0L -> -5.0, 20L -> -5.0, 40L -> -1.0, 50L -> -6.0)
      .map { case (m, v) => (ts(m), 1120L, 3L, v) }
    val kitka = Seq(0L -> 0.5, 25L -> 0.3, 50L -> 0.45, 55L -> 0.2)
      .map { case (m, v) => (ts(m), 1122L, 181L, v) }
    (keli ++ tie ++ kitka).toDF("tfrom", "statid", "seid", "seval")
  }

  private val sensorIds = Map("keli_1" -> 27, "tie_1" -> 3, "kitka3_luku" -> 181)

  test("four-condition collection with cross-site secondary chain") {
    val sheet =
      """start,end
        |1.2.2018,28.2.2018
        |site,master_alias,condition
        |Aakkoslandia 1,D3,"sipoo_itaan#a1 and aakkoslandia_1#d1"
        |Sipoo Itään,A1,"s1120#keli_1 in (7, 8) and s1120#tie_1 < -3"
        |Aakkoslandia 1,D1,s1122#kitka3_luku >= 0.4
        |Sipoo Itään,B1,"not a1 or s1120#keli_1 = 2"
        |""".stripMargin
    val parsed = SheetParser.parse("toimiva", sheet)
    assert(parsed.sheetErrors.isEmpty)
    assert(parsed.conditionErrors.isEmpty)

    val engine = new TsaEngine(spark)
    val results = engine.run(parsed.spec.get, obs, sensorIds)
    val byId = results.map(r => r.spec.idString -> r).toMap
    assert(results.forall(_.errors.isEmpty),
      results.flatMap(_.errors.messages).mkString("; "))

    // a1 = keli in (7,8) AND tie < -3
    // keli in(7,8): [0,50) T (islands merged over 7 and 8), last dropped
    // tie < -3:     [0,40) T, [40,50) F, last dropped
    // boundaries: 0,40,50 → [0,40) T&T=T, [40,50) T&F=F
    val a1 = byId("sipoo_itaan_a1")
    val a1rows = a1.data.collect().map(r =>
      (r.getTimestamp(0), r.getTimestamp(1), Option(r.get(5)))).toList
    assert(a1rows == List(
      (ts(0), ts(40), Some(true)),
      (ts(40), ts(50), Some(false))))

    // b1 = NOT a1 OR keli = 2; keli=2: [0,50) F (islands: 8,8,7,8,8 →
    // false throughout). NOT a1: [0,40) F, [40,50) T.
    // boundaries(a1 ∪ keli-block): 0,40,50 → master: F|F=F, T|F=T
    val b1 = byId("sipoo_itaan_b1")
    val s1 = b1.summary.collect()(0)
    assert(s1.getAs[Long]("valid_s") == 600L)     // [40,50)
    assert(s1.getAs[Long]("notvalid_s") == 2400L) // [0,40)

    // d1 = kitka >= 0.4: [0,25) T, [25,50) F, [50,55) T (the reading at
    // 55 is dropped, but it is the lead of reading 50)
    // d3 = a1 AND d1 (cross-site): boundaries 0,25,40,50,55
    //   [0,25) T&T=T, [25,40) T&F=F, [40,50) F&F=F,
    //   [50,55) NULL&T=NULL — a1 has no coverage there → nodata
    val d3 = byId("aakkoslandia_1_d3")
    val s3 = d3.summary.collect()(0)
    assert(s3.getAs[Long]("valid_s") == 1500L)
    assert(s3.getAs[Long]("notvalid_s") == 1500L)
    assert(s3.getAs[Long]("nodata_s") == 300L)

    // engine evaluated despite submission order (d3 first)
    assert(engine.catalog.keySet.contains("sipoo_itaan_a1"))
    assert(engine.catalog.keySet.contains("aakkoslandia_1_d1"))

    // catalog persists across collections (the reference's session temp
    // tables): a later sheet can reference an earlier sheet's condition
    val errs2 = new ErrorCollector("sheet2")
    val e1 = graft.dsl.ConditionParser.parse(
      "Muu Paikka", "E1", "not sipoo_itaan#a1", errs2).get
    val later = graft.model.CollectionSpec("sheet2",
      java.time.LocalDateTime.of(2018, 2, 1, 0, 0, 0),
      java.time.LocalDateTime.of(2018, 2, 28, 23, 59, 59), Vector(e1))
    val r2 = engine.run(later, obs, sensorIds)
    assert(r2.head.errors.isEmpty, r2.head.errors.shortStr)
    val s2e = r2.head.summary.collect()(0)
    // NOT a1: valid/notvalid swap vs a1 ([0,40) T, [40,50) F)
    assert(s2e.getAs[Long]("valid_s") == 600L)
    assert(s2e.getAs[Long]("notvalid_s") == 2400L)
  }
}
