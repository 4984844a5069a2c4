package graft.cli

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** End-to-end CLI regression: sheet CSV → engine → summary CSV +
  * per-condition parquet. Runs TsaBatch.main in-process (getOrCreate
  * picks up the shared test session, master already set).
  */
class TsaBatchSpec extends AnyFunSuite with SparkTest {

  test("full run: sheet to summary CSV and condition parquet") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsabatch_spec")
    val sheets = dir.resolve("sheets"); Files.createDirectories(sheets)
    Files.writeString(sheets.resolve("demo.csv"),
      """"start","end"
        |"1.2.2018","28.2.2018"
        |"site","master_alias","condition"
        |"Testi","A1","s1120#keli_1 = 8 and s1120#tie_1 < 0"
        |""".stripMargin)

    // hourly obs for station 1120, sensors keli_1(27) and tie_1(3)
    val t0 = java.time.Instant.parse("2018-02-01T00:00:00Z")
    val rows = for {
      h <- 0 until 24 * 27
      (seid, v) <- Seq(27 -> (if (h % 3 == 0) 8.0 else 2.0),
                       3 -> (if (h % 2 == 0) -2.0 else 1.0))
    } yield (java.sql.Timestamp.from(t0.plusSeconds(h * 3600L)), 1120L, seid.toLong, v)
    val obsPath = dir.resolve("obs.parquet").toString
    rows.toDF("tfrom", "statid", "seid", "seval").write.parquet(obsPath)

    val out = dir.resolve("out").toString
    Files.createDirectories(Paths.get(out))
    TsaBatch.run(spark,
      Vector("demo" -> Files.readString(sheets.resolve("demo.csv"))),
      obsPath, out, "spec")

    val summary = Files.readAllLines(Paths.get(s"$out/spec_summary.csv"))
    assert(summary.size == 2, summary)
    val fields = summary.get(1).split(",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)")
    assert(fields(0) == "demo" && fields(1) == "testi" && fields(2) == "a1")
    val Array(validS, notvalidS, nodataS, tottimeS) =
      fields.slice(6, 10).map(_.toLong)
    assert(validS + notvalidS + nodataS == tottimeS)
    assert(validS > 0 && notvalidS > 0)

    val cond = spark.read.parquet(s"$out/conditions/testi_a1")
    assert(cond.count() > 0)
    assert(cond.columns.toSeq ==
      Seq("vfrom", "vuntil", "vdiff_s", "a1_0", "a1_1", "master"))
  }
}
