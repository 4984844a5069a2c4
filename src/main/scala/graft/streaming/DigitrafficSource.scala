package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live road-weather feed adapter. The reference names the Digitraffic
  * real-time API as its data source (README.md:5 → digitraffic.fi road
  * traffic documentation) but never consumes it — its batch pipeline
  * bulk-loads monthly LOTJU dumps instead. This closes that gap
  * Spark-first: drop the API's JSON payloads (the public
  * `/api/weather/v1/stations/data` shape — a `stations` array, each
  * station carrying a `sensorValues` array) into a directory — the
  * landing pattern any HTTP poller or queue-to-file sink produces —
  * and a file streaming source turns them into the engine's flat
  * (tfrom, statid, seid, seval) observation rows, continuously, with
  * the same watermarked natural-key dedup the CSV stream uses
  * ([[StreamingIngest.statobsStreamFrom]]). Re-polls of an unchanged
  * station re-deliver identical readings; first-wins dedup on
  * (tfrom, statid, seid) collapses them. The output feeds every
  * downstream streaming operator (StreamingPack, StreamingCondition)
  * unchanged.
  *
  * 100 TB posture: the explode is stateless per-row work; only the
  * dedup holds state, bounded to the lateness horizon × active sensor
  * count. Payload files shard freely across executors.
  */
object DigitrafficSource {

  /** The public API payload: only the fields the engine consumes —
    * unknown JSON fields are ignored by schema projection, which is
    * what keeps this adapter stable across API additions.
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("dataUpdatedTime", StringType),
    StructField("stations", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("dataUpdatedTime", StringType),
      StructField("sensorValues", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("stationId", LongType),
        StructField("name", StringType),
        StructField("measuredTime", StringType),
        StructField("value", DoubleType),
        StructField("unit", StringType)))))))))))

  /** Stream a drop directory of API payload files (one JSON document
    * per file → multiLine).
    */
  def sensorDataStream(spark: SparkSession, dir: String,
                       lateness: String = "1 hour"): DataFrame =
    fromPayloads(
      spark.readStream.schema(payloadSchema)
        .option("multiLine", value = true).json(dir),
      lateness)

  /** JSON-Lines variant: one payload document per LINE — the layout a
    * poller appending to a rolling file (or a queue-to-file sink)
    * produces.
    */
  def sensorDataStreamLines(spark: SparkSession, dir: String,
                            lateness: String = "1 hour"): DataFrame =
    fromPayloads(spark.readStream.schema(payloadSchema).json(dir), lateness)

  /** Transform-only variant for arbitrary payload sources: explode
    * stations → sensorValues, project the engine's observation schema,
    * drop incomplete readings (the API emits null values for sensors
    * in error), dedup re-delivered readings within the watermark.
    */
  def fromPayloads(raw: DataFrame, lateness: String): DataFrame =
    raw
      .select(explode(col("stations")).as("st"))
      .select(col("st.id").as("statid"),
        explode(col("st.sensorValues")).as("sv"))
      .select(
        to_timestamp(col("sv.measuredTime")).as("tfrom"),
        col("statid"),
        col("sv.id").as("seid"),
        col("sv.name").as("sename"),
        col("sv.value").as("seval"),
        col("sv.unit").as("unit"))
      .filter(col("tfrom").isNotNull && col("statid").isNotNull &&
        col("seid").isNotNull && col("seval").isNotNull)
      .withWatermark("tfrom", lateness)
      .dropDuplicatesWithinWatermark("tfrom", "statid", "seid")

  /** HTTP polling loop closing the last gap to the reference-named
    * live endpoint: fetch the payload every `intervalMs`, land it as
    * ONE JSON-Lines row in `dropDir` — exactly the layout
    * [[sensorDataStreamLines]] watches, so the poller composes with
    * the whole streaming stack without new parsing code. Files land
    * ATOMICALLY (write to a dot-prefixed temp sibling, then move):
    * Spark's file source must never list a half-written payload.
    *
    * Transport is INJECTED (`fetch`): production passes
    * [[httpFetcher]]; tests (and this sandbox, which has no egress)
    * pass a canned-payload closure — the parity spec proves the
    * polled path and the file-drop path produce identical rows.
    * A failed fetch logs-and-skips the tick; re-polls of an unchanged
    * station re-deliver identical readings, which the watermarked
    * first-wins dedup above collapses.
    *
    * @return number of successfully landed payloads
    */
  def poll(fetch: () => String, dropDir: String, intervalMs: Long,
           maxPolls: Int): Int = {
    val dir = java.nio.file.Paths.get(dropDir)
    java.nio.file.Files.createDirectories(dir)
    // resume past any earlier run's files: a restarted poller must
    // land NEW names (the file source treats a name as already-seen)
    val start = {
      import scala.jdk.CollectionConverters._
      val pat = "payload-(\\d+)\\.jsonl".r
      // Using closes the directory stream — a bare Files.list leaks a
      // handle per poll cycle in a long-lived driver
      val existing = scala.util.Using.resource(java.nio.file.Files.list(dir))(
        _.iterator().asScala
          .flatMap(p => pat.unapplySeq(p.getFileName.toString))
          .flatMap(_.headOption).map(_.toLong).toSeq)
      if (existing.isEmpty) 0L else existing.max + 1L
    }
    var landed = 0
    for (i <- 0 until maxPolls) {
      if (i > 0 && intervalMs > 0) Thread.sleep(intervalMs)
      try {
        // literal newlines are illegal inside JSON strings, so
        // flattening them yields one valid JSON-Lines row even from a
        // pretty-printing server
        val payload = fetch().replaceAll("[\r\n]+", " ").trim
        if (payload.nonEmpty) {
          val tmp = dir.resolve(s".payload-${start + i}.jsonl.tmp")
          java.nio.file.Files.writeString(tmp, payload + "\n")
          java.nio.file.Files.move(tmp, dir.resolve(s"payload-${start + i}.jsonl"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          landed += 1
        }
      } catch {
        case e: Exception =>
          org.apache.logging.log4j.LogManager.getLogger(getClass)
            .warn(s"digitraffic poll $i failed: ${e.getMessage}")
      }
    }
    landed
  }

  /** JDK-HttpClient fetcher for [[poll]] — the production transport
    * (`https://tie.digitraffic.fi/api/weather/v1/stations/data`).
    */
  def httpFetcher(url: String, timeoutMs: Long = 10000L): () => String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    () => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Accept-Encoding", "identity").GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"HTTP ${resp.statusCode()} from $url")
      resp.body()
    }
  }
}
