package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The file-drop adapter for the public road-weather API payload shape:
  * each dropped JSON document explodes to flat observation rows;
  * re-delivered readings (an unchanged station across two polls) dedup
  * across micro-batches; null-valued sensors are dropped.
  */
class DigitrafficSourceSpec extends AnyFunSuite with SparkTest {

  private def payload(updated: String, stations: String): String =
    s"""{"dataUpdatedTime": "$updated", "stations": [$stations]}"""

  private def station(id: Long, svs: String): String =
    s"""{"id": $id, "dataUpdatedTime": "2023-05-11T10:30:00Z",
       | "sensorValues": [$svs]}""".stripMargin

  private def sv(id: Long, stationId: Long, name: String, t: String,
                 v: String): String =
    s"""{"id": $id, "stationId": $stationId, "name": "$name",
       | "measuredTime": "$t", "value": $v, "unit": "°C"}""".stripMargin

  test("payload drops stream to flat obs rows, dedup across polls") {
    val dir = java.nio.file.Files.createTempDirectory("digitraffic_drop")
    val sink = s"digitraffic_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    try {
      val q = DigitrafficSource.sensorDataStream(spark, dir.toString, "2 hours")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        // poll 1: two stations; one sensor reports null (in error)
        java.nio.file.Files.writeString(dir.resolve("poll1.json"),
          payload("2023-05-11T10:30:00Z",
            station(12016,
              sv(1, 12016, "ILMA", "2023-05-11T10:28:00Z", "2.5") + "," +
                sv(2, 12016, "TIE", "2023-05-11T10:28:00Z", "null")) + "," +
              station(12017,
                sv(1, 12017, "ILMA", "2023-05-11T10:29:00Z", "-1.0"))))
        q.processAllAvailable()
        // poll 2: station 12016 unchanged (re-delivery), 12017 advanced
        java.nio.file.Files.writeString(dir.resolve("poll2.json"),
          payload("2023-05-11T10:35:00Z",
            station(12016,
              sv(1, 12016, "ILMA", "2023-05-11T10:28:00Z", "2.5")) + "," +
              station(12017,
                sv(1, 12017, "ILMA", "2023-05-11T10:34:00Z", "-1.5"))))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table(sink)
        .select(col("tfrom").cast("long"), col("statid"), col("seid"),
          col("sename"), col("seval"))
        .orderBy("tfrom", "statid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4))).toList
      val t = java.time.Instant.parse("2023-05-11T10:28:00Z").getEpochSecond
      assert(got == List(
        (t, 12016L, 1L, "ILMA", 2.5),
        (t + 60, 12017L, 1L, "ILMA", -1.0),
        (t + 360, 12017L, 1L, "ILMA", -1.5)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("poll loop lands JSON-Lines payloads; polled path == file-drop path") {
    val dir = java.nio.file.Files.createTempDirectory("digitraffic_poll")
    val sink = s"digipoll_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    try {
      // canned transport: the same two polls as the file-drop test,
      // PRETTY-PRINTED (embedded newlines) — poll() must flatten each
      // payload to one valid JSON-Lines row
      val payloads = Iterator(
        payload("2023-05-11T10:30:00Z",
          station(12016,
            sv(1, 12016, "ILMA", "2023-05-11T10:28:00Z", "2.5") + "," +
              sv(2, 12016, "TIE", "2023-05-11T10:28:00Z", "null")) + "," +
            station(12017,
              sv(1, 12017, "ILMA", "2023-05-11T10:29:00Z", "-1.0"))),
        payload("2023-05-11T10:35:00Z",
          station(12016,
            sv(1, 12016, "ILMA", "2023-05-11T10:28:00Z", "2.5")) + "," +
            station(12017,
              sv(1, 12017, "ILMA", "2023-05-11T10:34:00Z", "-1.5"))))
      val landed = DigitrafficSource.poll(() => payloads.next(),
        dir.toString, intervalMs = 0, maxPolls = 2)
      assert(landed == 2)
      // no partial/temp files visible to the stream
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString).toSet
      assert(files == Set("payload-0.jsonl", "payload-1.jsonl"), files)

      val q = DigitrafficSource.sensorDataStreamLines(spark, dir.toString, "2 hours")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(sink)
        .select(col("tfrom").cast("long"), col("statid"), col("seid"),
          col("sename"), col("seval"))
        .orderBy("tfrom", "statid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4))).toList
      val t = java.time.Instant.parse("2023-05-11T10:28:00Z").getEpochSecond
      // identical rows to the file-drop adapter: null sensor dropped,
      // the re-polled 12016 reading deduped
      assert(got == List(
        (t, 12016L, 1L, "ILMA", 2.5),
        (t + 60, 12017L, 1L, "ILMA", -1.0),
        (t + 360, 12017L, 1L, "ILMA", -1.5)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("poll loop skips failed fetches and keeps landing later ticks") {
    val dir = java.nio.file.Files.createTempDirectory("digitraffic_pollfail")
    try {
      var i = 0
      val landed = DigitrafficSource.poll(() => {
        i += 1
        if (i == 2) sys.error("connection reset")
        payload("2023-05-11T10:30:00Z",
          station(12016, sv(1, 12016, "ILMA", "2023-05-11T10:28:00Z", "2.5")))
      }, dir.toString, intervalMs = 0, maxPolls = 3)
      assert(landed == 2)
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString).toSet
      assert(files == Set("payload-0.jsonl", "payload-2.jsonl"), files)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("obs rows feed the streaming pack kernel unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("digitraffic_pack")
    val sink = s"digipack_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    try {
      // one station, sensor 1: ≥0 for 20 min, then <0 — packStream
      // should close the leading true island when the sign flips
      val t0 = "2023-05-11T10:00"
      def at(min: Int) = s"2023-05-11T${10 + min / 60}:${"%02d".format(min % 60)}:00Z"
      val svs = Seq(0 -> "1.0", 10 -> "2.0", 20 -> "-3.0", 30 -> "-1.0")
        .map { case (m, v) => sv(1, 12016, "ILMA", at(m), v) }.mkString(",")
      java.nio.file.Files.writeString(dir.resolve("poll.json"),
        payload("2023-05-11T11:00:00Z", station(12016, svs)))
      val obs = DigitrafficSource.sensorDataStream(spark, dir.toString, "2 hours")
        .select(col("statid").cast("int").as("block_id"), col("tfrom"),
          when(col("seval") >= 0, 1).otherwise(0).as("enc"))
      val q = StreamingPack.packStream(obs, maxMinutes = 30)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(sink).orderBy("vfrom")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toList
      val b = java.time.Instant.parse("2023-05-11T10:00:00Z").getEpochSecond
      // closed: [0,20) true; [20,30)+ still open in state
      assert(got == List((b * 1000000L, (b + 1200) * 1000000L, 1)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
