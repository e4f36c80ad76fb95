package graft.cdc

import org.apache.spark.sql.DataFrame

/** Source/target reconciliation (SURVEY.md §2.4 A1, §3.3).
  *
  * The reference's only correctness instrument is COUNT(*) parity between
  * MySQL and Redshift (`source/start_dms_replication_task_lambda/handler.py:27-57`
  * — whose Redshift side never actually fetches, a bug we do not
  * reproduce). `exceptAll` strengthens count-parity to multiset equality:
  * two distributed scans + one shuffle, no driver materialization.
  */
object Reconcile {

  final case class Report(sourceCount: Long, targetCount: Long, missingInTarget: Long, extraInTarget: Long) {
    def countsMatch: Boolean = sourceCount == targetCount
    def exactMatch: Boolean = missingInTarget == 0 && extraInTarget == 0
  }

  /** A1: the reference's count-parity check. */
  def countParity(source: DataFrame, target: DataFrame): Boolean =
    source.count() == target.count()

  /** Multiset difference both ways — the stronger invariant. */
  def report(source: DataFrame, target: DataFrame): Report =
    Report(
      sourceCount = source.count(),
      targetCount = target.count(),
      missingInTarget = source.exceptAll(target).count(),
      extraInTarget = target.exceptAll(source).count())
}
