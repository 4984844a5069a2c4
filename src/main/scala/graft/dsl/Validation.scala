package graft.dsl

import graft.model._
import scala.io.Source

/** Dry validation against known station/sensor sets (reference
  * tsa/utils.py:115-273 hard-codes 761 Digitraffic station ids and 69
  * sensor name→id pairs as of 8/2019; here loaded from resource CSVs
  * extracted from the same public data) — SURVEY.md §2.5 L9-L11.
  *
  * Spark-free on purpose: `--dryvalidate` is a fast CI gate
  * (SURVEY.md §3.2) that must run without a SparkSession.
  */
object Validation {

  private def resourceLines(name: String): Vector[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource $name")
    try Source.fromInputStream(in, "UTF-8").getLines().map(_.trim)
      .filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** Digitraffic station ids (tsa/utils.py:115-197). */
  lazy val localStationIds: Set[Int] = resourceLines("statids.csv").map(_.toInt).toSet

  /** Sensor name → id (tsa/utils.py:199-273). */
  lazy val localSensorIds: Map[String, Int] =
    resourceLines("sensors.csv").map { l =>
      val Array(name, id) = l.split(",", 2)
      name -> id.toInt
    }.toMap

  /** Validate primary-block station ids against a known set
    * (tsa/analysis_collection.py:123-147): unknown id → recorded error.
    */
  def validateStationIds(spec: ConditionSpec, known: Set[Int],
                         errs: ErrorCollector): Boolean = {
    val bad = spec.blocks.collect {
      case p: PrimaryBlock if !known.contains(p.stationId) => p.stationId
    }
    bad.foreach(id => errs.add(s"""Station id "$id" does not exist"""))
    bad.isEmpty
  }

  /** Resolve sensor ids on primary blocks (tsa/block.py:181-193);
    * unknown sensor name → recorded error, block left unresolved.
    */
  def resolveSensorIds(spec: ConditionSpec, sensors: Map[String, Int],
                       errs: ErrorCollector): ConditionSpec = {
    val blocks = spec.blocks.map {
      case p: PrimaryBlock =>
        sensors.get(p.sensorName) match {
          case Some(id) => p.copy(sensorId = Some(id))
          case None =>
            errs.add(s"""No sensor id found by sensor name "${p.sensorName}"""")
            p
        }
      case b => b
    }
    spec.copy(blocks = blocks)
  }

  final case class DryResult(tree: ErrorNode, ok: Boolean)

  /** Whole-batch dry validation (reference `--dryvalidate`,
    * tsabatch.py:89-107): parse + station/sensor checks, no Spark, no
    * data access. Returns the nested error tree and overall status.
    */
  def dryValidate(sheets: Seq[(String, String)]): DryResult = {
    val collections = sheets.map { case (title, csv) =>
      val parsed = SheetParser.parse(title, csv)
      val condNodes = scala.collection.mutable.LinkedHashMap.empty[String, ErrorNode]
      parsed.conditionErrors.foreach { case (id, ce) =>
        condNodes(id) = ErrorNode(id, ce.messages)
      }
      parsed.spec.foreach { spec =>
        spec.conditions.foreach { c =>
          val ce = new ErrorCollector(s"CONDITION <${c.idString}>")
          validateStationIds(c, localStationIds, ce)
          resolveSensorIds(c, localSensorIds, ce)
          if (ce.nonEmpty) {
            val prev = condNodes.get(c.idString).map(_.errors).getOrElse(Nil)
            condNodes(c.idString) = ErrorNode(c.idString, prev ++ ce.messages)
          }
        }
      }
      title -> ErrorNode(title, parsed.sheetErrors.messages, condNodes.toMap)
    }
    val tree = ErrorNode("analysis", Nil, collections.toMap)
    DryResult(tree, !tree.hasAny)
  }
}
