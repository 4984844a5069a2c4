package graft.model

/** Domain model for the condition-analysis engine.
  *
  * Mirrors the reference object model (SURVEY.md §0: tsa/condition.py:27,
  * tsa/block.py:13) as immutable Scala ADTs: a Condition is a boolean
  * expression over Blocks; a Block is either a primary sensor comparison
  * (`s1122#tie_1 < 3`) or a secondary reference to another condition's
  * result (`site#alias`).
  */
sealed trait CmpOp { def sym: String }
object CmpOp {
  case object Eq extends CmpOp { val sym = "=" }
  case object Ne extends CmpOp { val sym = "<>" }
  case object Gt extends CmpOp { val sym = ">" }
  case object Lt extends CmpOp { val sym = "<" }
  case object Ge extends CmpOp { val sym = ">=" }
  case object Le extends CmpOp { val sym = "<=" }
  case object In extends CmpOp { val sym = "in" }
  val all: Vector[CmpOp] = Vector(Eq, Ne, Gt, Lt, Ge, Le, In)
  def fromSym(s: String): Option[CmpOp] = all.find(_.sym == s)
}

/** One atomic subcondition (reference tsa/block.py:13-240). */
sealed trait BlockSpec {
  def alias: String
  def rawLogic: String
  def orderNr: Int
  def secondary: Boolean
}

/** `station#sensor op value` — evaluated against the observation store
  * (reference tsa/block.py:148-175, "Case 3").
  * @param sensorId resolved later from metadata (tsa/block.py:181-193)
  * @param values one element for comparison ops, several for `in`
  */
final case class PrimaryBlock(
    alias: String,
    rawLogic: String,
    orderNr: Int,
    station: String,
    stationId: Int,
    sensorName: String,
    op: CmpOp,
    values: Vector[Double],
    sensorId: Option[Int] = None,
) extends BlockSpec {
  def secondary: Boolean = false
}

/** `[site#]masterAlias` — reads a previously evaluated condition's master
  * ranges (reference tsa/block.py:113-146, "Case 1/2").
  */
final case class SecondaryBlock(
    alias: String,
    rawLogic: String,
    orderNr: Int,
    site: String,
    sourceAlias: String,
) extends BlockSpec {
  def secondary: Boolean = true
  /** Catalog key of the referenced condition (tsa/block.py:122,137). */
  def sourceView: String = s"${site}_$sourceAlias"
}

/** Boolean expression AST over block aliases; compiled to a Spark Column
  * under native SQL 3VL (reference splices the string into SQL,
  * tsa/condition.py:271-285 — we keep a real AST instead).
  */
sealed trait Expr
object Expr {
  final case class Ref(alias: String) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
}

/** One parsed condition row (reference tsa/condition.py:27-82). */
final case class ConditionSpec(
    site: String,
    masterAlias: String,
    rawCondition: String,
    blocks: Vector[BlockSpec],
    expr: Expr,
    aliasCondition: String,
) {
  /** Result-catalog key (reference `id_string`, tsa/condition.py:63). */
  def idString: String = s"${site}_$masterAlias"
  /** A condition is secondary iff any block is (tsa/condition.py:287-293). */
  def secondary: Boolean = blocks.exists(_.secondary)
}

/** One sheet: conditions sharing a date range (tsa/cond_collection.py:24-60).
  * Times are widened to 00:00:00 / 23:59:59 by the sheet parser
  * (tsa/cond_collection.py:44-45).
  */
final case class CollectionSpec(
    title: String,
    timeFrom: java.time.LocalDateTime,
    timeUntil: java.time.LocalDateTime,
    conditions: Vector[ConditionSpec],
)

/** Per-condition summary scalars (reference tsa/condition.py:435-446).
  * Durations in seconds; percentages of `tottime`.
  */
final case class ConditionSummary(
    site: String,
    masterAlias: String,
    condition: String,
    dataFrom: Option[java.sql.Timestamp],
    dataUntil: Option[java.sql.Timestamp],
    tottimeSec: Long,
    validSec: Long,
    notValidSec: Long,
    nodataSec: Long,
    rows: Long,
) {
  def pct(x: Long): Double = if (tottimeSec == 0) 0.0 else x.toDouble / tottimeSec
  def percentValid: Double = pct(validSec)
  def percentNotValid: Double = pct(notValidSec)
  def percentNodata: Double = pct(nodataSec)
}
