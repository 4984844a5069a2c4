package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Observation-store layouts.
  *
  * The narrow EAV layout `(tfrom, statid, seid, seval)` mirrors the
  * reference's statobs⋈seobs relation. The WIDE layout — one row per
  * (tfrom, statid) with one column per sensor — is the reference's own
  * proposed-but-unimplemented optimization
  * (database/README.md:128-131, SURVEY.md §7.4 pt 6) and the preferred
  * 100 TB shape: block predicates become plain column comparisons on one
  * scan, no R2 join, no per-block row duplication, and parquet prunes
  * unused sensor columns at read time.
  */
object ObsLayouts {

  /** Pivot the narrow relation to wide: `(tfrom, statid, se_<id>...)`.
    * Sensor ids must be enumerated (metadata-driven) so the pivot needs
    * no extra value-discovery pass and column order is stable.
    */
  def widen(obs: DataFrame, sensorIds: Seq[Int]): DataFrame =
    obs.groupBy("tfrom", "statid")
      .pivot("seid", sensorIds.map(_.toString))
      .agg(max("seval"))
      .select(col("tfrom") +: col("statid") +:
        sensorIds.map(id => col(s"$id").as(s"se_$id")): _*)

  /** Inverse: melt wide back to the narrow EAV relation (rows with NULL
    * readings drop, matching the EAV absence-of-row semantics).
    */
  def narrow(wide: DataFrame, sensorIds: Seq[Int]): DataFrame = {
    val entries = sensorIds.map(id =>
      struct(lit(id.toLong).as("seid"), col(s"se_$id").as("seval")))
    wide.select(col("tfrom"), col("statid"),
        explode(array(entries: _*)).as("e"))
      .select(col("tfrom"), col("statid"), col("e.seid"), col("e.seval"))
      .filter(col("seval").isNotNull)
  }
}
