package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Bridge for converting DataSourceV2 [[Predicate]]s (what runtime
  * filtering delivers to [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering.filter]])
  * to V1 [[Filter]]s: Spark's own converter lives behind
  * `private[sql]`, so extension sources reach it via a shim in an
  * `org.apache.spark.sql` subpackage — same pattern as [[ColumnShim]].
  */
object PredicateShim {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}

/** Re-export of the `private[sql]` scan-metadata hook: a custom V2
  * Scan implementing this surfaces standard `PushedFilters:` /
  * `ReadSchema:` lines in EXPLAIN FORMATTED, same as Spark's own
  * FileScans — the contract plan-pinning specs assert on.
  */
trait ScanMetadataShim
    extends org.apache.spark.sql.internal.connector.SupportsMetadata
