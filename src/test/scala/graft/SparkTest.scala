package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs. */
trait SparkTest {
  lazy val spark: SparkSession = SparkTest.session
}

object SparkTest {
  // the entry-point builder (GraftSession.local) so specs exercise the
  // same session config the bench/verify mains run under — UTC, local
  // scan sizing, core-count shuffle partitions
  lazy val session: SparkSession = GraftSession.local(4, 4)
}
