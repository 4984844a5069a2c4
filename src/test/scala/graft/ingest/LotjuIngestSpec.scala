package graft.ingest

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ingestion specs on the reference wire format (FIXTURES.md §3:
  * pipe-CSV, Finnish timestamps with nanosecond tail, LOTJU ids needing
  * metadata remap; database/example_data/EXAMPLE_*.csv shape).
  */
class LotjuIngestSpec extends AnyFunSuite with SparkTest {

  private def tmpCsv(name: String, content: String): String = {
    val dir = Files.createTempDirectory("lotju")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private lazy val stationsCsv = tmpCsv("stations.csv",
    """1001|1|"vt1_Espoo"
      |1120|7|"kt51_Sipoo"
      |""".stripMargin)
  private lazy val sensorsCsv = tmpCsv("sensors.csv",
    """3|3|"TIE_1"
      |27|22|"KELI_1"
      |""".stripMargin)

  test("timestamp parse: Helsinki wall time with ns tail → UTC instant (E1)") {
    import spark.implicits._
    // 01.03.2018 02:09 Helsinki (EET, +02) = 00:09 UTC
    val df = Seq("01.03.2018 02:09:00,000000000").toDF("AIKA")
    val got = df.select(LotjuIngest.parseLotjuTimestamp($"AIKA")).head().getTimestamp(0)
    assert(got.toInstant == java.time.Instant.parse("2018-03-01T00:09:00Z"))
    // summer time: 01.07.2018 03:00 EEST (+03) = 00:00 UTC
    val dst = Seq("01.07.2018 03:00:00,500000000").toDF("AIKA")
      .select(LotjuIngest.parseLotjuTimestamp($"AIKA")).head().getTimestamp(0)
    assert(dst.toInstant == java.time.Instant.parse("2018-07-01T00:00:00Z"))
  }

  test("timestamp parse is session-timezone independent") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      val instants = for (tz <- Seq("UTC", "America/New_York", "Asia/Tokyo")) yield {
        spark.conf.set("spark.sql.session.timeZone", tz)
        Seq("01.03.2018 02:09:00,000000000").toDF("AIKA")
          .select(LotjuIngest.parseLotjuTimestamp($"AIKA"))
          .head().getTimestamp(0).toInstant
      }
      assert(instants.distinct ==
        List(java.time.Instant.parse("2018-03-01T00:09:00Z")),
        instants.toString)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("statobs: FK remap, null filter, natural-key dedup (E2/E4/E5)") {
    import spark.implicits._
    val raw = Seq(
      (420958436L, "01.03.2018 02:09:00,000000000", 7),   // → statid 1120
      (420958437L, "01.03.2018 02:09:00,000000000", 7),   // dup (tfrom, statid)
      (420958438L, "01.03.2018 02:10:00,000000000", 99),  // unknown station → dropped by join
      (420958439L, null, 7))                              // null time → dropped
      .toDF("ID", "AIKA", "ASEMA_ID")
    val stations = LotjuIngest.readMetadata(spark, stationsCsv)
    val got = LotjuIngest.statobs(raw, stations)
    assert(got.count() == 1)
    val r = got.head()
    assert(r.getAs[Int]("statid") == 1120)
  }

  test("seobs: remap + dedup on (obsid, seid) (E3/E5)") {
    import spark.implicits._
    val raw = Seq(
      (23855559698L, 3, 275.0f, 420944339L, ""),
      (23855559699L, 3, 276.0f, 420944339L, ""),  // dup (obsid, seid)
      (23855559700L, 22, 8.0f, 420944339L, ""),
      (23855559701L, 77, 1.0f, 420944339L, ""))   // unknown sensor → dropped
      .toDF("ID", "ANTURI_ID", "ARVO", "MITTATIETO_ID", "TIEDOSTO_ID")
    val sensors = LotjuIngest.readMetadata(spark, sensorsCsv)
    val got = LotjuIngest.seobs(raw, sensors)
    assert(got.count() == 2)
    assert(got.select("seid").collect().map(_.getInt(0)).toSet == Set(3, 27))
  }

  test("obsMain join produces the analysis relation (R2)") {
    import spark.implicits._
    val so = Seq((1L, java.sql.Timestamp.valueOf("2018-03-01 00:09:00"), 1120))
      .toDF("id", "tfrom", "statid")
    val se = Seq((10L, 1L, 3, 275.0f), (11L, 1L, 27, 8.0f))
      .toDF("id", "obsid", "seid", "seval")
    val got = LotjuIngest.obsMain(so, se)
    assert(got.columns.toSeq == Seq("tfrom", "statid", "seid", "seval"))
    assert(got.count() == 2)
  }

  test("sensor name-id lookup normalizes quotes and case (E6)") {
    val sensors = LotjuIngest.readMetadata(spark, sensorsCsv)
    val m = LotjuIngest.sensorNameIds(sensors)
    assert(m == Map("tie_1" -> 3, "keli_1" -> 27))
  }
}
