package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The watermarked stream-stream interval join must (a) match the batch
  * interval join when arrivals respect the watermark and (b) keep
  * emitting as later micro-batches land — clicks arriving AFTER their
  * view's batch still attribute, which is the whole point of buffering
  * join state.
  */
class StreamingJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(minute: Int) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)

  private def rm(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("clicks in a later micro-batch still attribute; batch parity holds") {
    val tmpV = java.nio.file.Files.createTempDirectory("sj_views")
    val tmpC = java.nio.file.Files.createTempDirectory("sj_clicks")
    val sink = s"sj_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    try {
      val views = Seq((1L, ts(0), 100L), (1L, ts(30), 101L), (2L, ts(5), 102L))
        .toDF("user_id", "view_ts", "view_id")
      val clicks1 = Seq((1L, ts(10), 200L)) // same-batch match for view 100
        .toDF("c_user", "click_ts", "click_id")
      views.coalesce(1).write.mode("overwrite").parquet(tmpV.toString)
      clicks1.coalesce(1).write.mode("overwrite").parquet(tmpC.toString)
      val vSrc = spark.readStream.schema(views.schema).parquet(tmpV.toString)
      val cSrc = spark.readStream.schema(clicks1.schema).parquet(tmpC.toString)
      val q = StreamingJoin.attributionJoin(vSrc, cSrc, "20 minutes")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // a later batch: click for view 101 (user 1) and view 102 (user 2),
        // plus one OUTSIDE the window that must not attribute
        Seq((1L, ts(35), 201L), (2L, ts(20), 202L), (2L, ts(90), 203L))
          .toDF("c_user", "click_ts", "click_id")
          .coalesce(1).write.mode("append").parquet(tmpC.toString)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(sink)
        .select("view_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 200L), (101L, 201L), (102L, 202L)))
    } finally { rm(tmpV); rm(tmpC) }
  }
}
