package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object DbgWiden {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, 4)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dbgwiden").toString
    // decimal(9,2) files (INT32-backed)
    Seq(("1234567.89", 1L), ("-0.01", 2L)).toDF("d", "k")
      .select(col("k"), col("d").cast("decimal(9,2)").as("d"))
      .write.parquet(s"$dir/dec9")
    // read under wider precision, same scale
    for (ddl <- Seq("decimal(12,2)", "decimal(18,2)", "decimal(38,2)", "decimal(12,3)")) {
      val t = try {
        val got = spark.read.schema(StructType(Seq(
          StructField("k", LongType), StructField("d", DataType.fromDDL(ddl)))))
          .parquet(s"$dir/dec9").orderBy("k").collect().mkString(";")
        s"OK $got"
      } catch { case e: Throwable => "FAIL " + e.getMessage.take(120) }
      println(s"=== dec9 as $ddl: $t")
    }
    // decimal(20,2) (binary) read from decimal(9,2)? then date->timestamp_ntz
    Seq((java.sql.Date.valueOf("2021-03-14"), 1L)).toDF("d", "k")
      .write.parquet(s"$dir/date")
    for (ddl <- Seq("timestamp_ntz", "timestamp")) {
      val t = try {
        val got = spark.read.schema(StructType(Seq(
          StructField("d", DataType.fromDDL(ddl)), StructField("k", LongType))))
          .parquet(s"$dir/date").collect().mkString(";")
        s"OK $got"
      } catch { case e: Throwable => "FAIL " + e.getMessage.take(120) }
      println(s"=== date as $ddl: $t")
    }
    // also non-vectorized check: disable vectorized reader
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    for (ddl <- Seq("decimal(18,2)", "decimal(38,2)")) {
      val t = try {
        val got = spark.read.schema(StructType(Seq(
          StructField("k", LongType), StructField("d", DataType.fromDDL(ddl)))))
          .parquet(s"$dir/dec9").orderBy("k").collect().mkString(";")
        s"OK $got"
      } catch { case e: Throwable => "FAIL " + e.getMessage.take(120) }
      println(s"=== mr dec9 as $ddl: $t")
    }
    spark.stop()
  }
}
