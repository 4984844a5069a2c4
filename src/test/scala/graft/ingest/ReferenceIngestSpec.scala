package graft.ingest

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Ingestion parity over the reference's OWN raw example dumps and the
  * full 933-station / 145-sensor metadata files
  * (database/example_data/EXAMPLE_... and the two filtered metadata
  * CSVs) — the exact wire format the production pipeline receives.
  */
class ReferenceIngestSpec extends AnyFunSuite with SparkTest {

  private val refDb = "/root/reference/database"
  private def assumeRef(): Unit =
    assume(Files.exists(Paths.get(refDb)), "reference database dir not present")

  test("full metadata files load: 933 stations, 145 sensors; name map complete") {
    assumeRef()
    val stations = LotjuIngest.readMetadata(spark, s"$refDb/tiesaa_asema_filtered.csv")
    val sensors = LotjuIngest.readMetadata(spark, s"$refDb/laskennallinen_anturi_filtered.csv")
    assert(stations.count() == 933)
    assert(sensors.count() == 145)
    val nameIds = LotjuIngest.sensorNameIds(sensors)
    // 145 rows → 144 unique normalized names: one name collides after
    // lower/unquote, and the reference's dict comprehension collapses it
    // identically (tsa/utils.py:275-283, last occurrence wins)
    assert(nameIds.size == 144)
    assert(nameIds("tie_1") == 3)
    assert(nameIds("ilma") == 1)
    // the dry-validation subset (69 sensors) must agree with the full
    // metadata on every shared name
    graft.dsl.Validation.localSensorIds.foreach { case (name, id) =>
      assert(nameIds.get(name).contains(id), s"$name: $id vs ${nameIds.get(name)}")
    }
  }

  test("raw example dumps ingest end-to-end through statobs/seobs/obsMain") {
    assumeRef()
    val stations = LotjuIngest.readMetadata(spark, s"$refDb/tiesaa_asema_filtered.csv")
    val sensors = LotjuIngest.readMetadata(spark, s"$refDb/laskennallinen_anturi_filtered.csv")
    val rawStat = spark.read.schema(LotjuIngest.statobsRawSchema)
      .option("delimiter", "|").option("header", "true")
      .csv(s"$refDb/example_data/EXAMPLE_tiesaa_mittatieto-2018_03.csv")
    val rawSe = spark.read.schema(LotjuIngest.seobsRawSchema)
      .option("delimiter", "|").option("header", "true")
      .csv(s"$refDb/example_data/EXAMPLE_anturi_arvo-2018_03.csv")

    val so = LotjuIngest.statobs(rawStat, stations)
    val se = LotjuIngest.seobs(rawSe, sensors)
    assert(so.count() > 0)
    assert(se.count() > 0)
    // timestamps parsed as Helsinki wall time: 01.03.2018 02:09 EET
    // → 00:09 UTC
    val t = so.orderBy("tfrom").select("tfrom").head().getTimestamp(0)
    assert(t.toInstant == java.time.Instant.parse("2018-03-01T00:09:00Z"))
    // FK remap happened: statids are station table ids, not LOTJU ids
    val statids = so.select("statid").collect().map(_.getInt(0)).toSet
    val known = stations.select("id").collect().map(_.getInt(0)).toSet
    assert(statids.subsetOf(known))
    // the joined analysis relation has the engine schema
    val obs = LotjuIngest.obsMain(so, se)
    assert(obs.columns.toSeq == Seq("tfrom", "statid", "seid", "seval"))
  }
}
