package graft.dsl

/** Identifier normalization (reference tsa/utils.py:10-113).
  *
  * All sites/aliases/station/sensor names are normalized to lowercase
  * SQL-safe identifiers: ä/ö folded to a/o, inner spaces to `_`; leading
  * digits, non-alphanumerics and a reserved-word list are rejected.
  * Pure functions, no Spark dependency — the dry-validate path
  * (SURVEY.md §3.2) runs without a SparkSession.
  */
object Identifiers {

  /** tsa/utils.py:10-23 */
  def eliminateUmlauts(x: String): String =
    x.map {
      case 'ä' => 'a'; case 'Ä' => 'A'
      case 'ö' => 'o'; case 'Ö' => 'O'
      case c => c
    }

  /** Caret diagnostics under the offending character (tsa/utils.py:25-37). */
  def withErrPointer(s: String, pos: Int): String =
    if (pos < 0) s else s + "\n" + ("~" * pos) + "^ HERE"

  /** Reserved physical-table names (tsa/utils.py:66-68). */
  val DisabledIdentifiers: Set[String] = Set(
    "stations", "statobs", "sensors", "seobs",
    "laskennallinen_anturi", "tiesaa_asema")

  /** tsa/utils.py:39-92. Returns Left(errorMessage) instead of raising.
    *
    * NOTE the reference docstring declares a 40-char maximum but the code
    * enforces 63 (tsa/utils.py:81-84); we match the enforced behavior and
    * keep the reference's (misleading) message text shape.
    */
  def toPgIdentifier(raw: String): Either[String, String] = {
    val trimmed = raw.trim
    val x = eliminateUmlauts(trimmed.toLowerCase).replace(' ', '_')
    if (x.isEmpty)
      Left("identifier is empty")
    else if (DisabledIdentifiers.contains(x))
      Left(s""""$x" cannot be used as identifier since it is already reserved in database!""")
    else if (x.head.isDigit)
      Left("String starts with digit:\n" + withErrPointer(x, 0))
    else if (x.length > 63)
      Left(s""""$x" is too long, maximum is 40 characters:""" + "\n" + withErrPointer(x, 62))
    else
      x.zipWithIndex.collectFirst {
        case (c, i) if !(c.isLetterOrDigit && c < 128) && c != '_' =>
          Left(s""""$x" contains an invalid character:""" + "\n" + withErrPointer(x, i))
      }.getOrElse(Right(x))
  }

  /** Duration formatting (tsa/utils.py:94-103): seconds → "Xd Xh Xm Xs". */
  def strfdelta(totalSeconds: Long, fmt: String = "{days}d {hours}h {minutes}m {seconds}s"): String = {
    val days = totalSeconds / 86400
    val rem = totalSeconds % 86400
    val hours = rem / 3600
    val minutes = (rem % 3600) / 60
    val seconds = rem % 60
    fmt.replace("{days}", days.toString).replace("{hours}", hours.toString)
      .replace("{minutes}", minutes.toString).replace("{seconds}", seconds.toString)
  }

  /** tsa/utils.py:105-113 */
  def truncStr(s: String, n: Int = 80): String =
    if (s.length <= n - 4) s else s.substring(0, n - 5) + " ..."
}
