package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, PartitioningCollection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Whole-operator keyed interval OVERLAP join: every same-key pair of
  * left/right intervals with `ls < re AND rs < le` (non-empty
  * intersection of two half-open intervals).
  *
  * Interval×interval overlap is the third member of the custom-plan
  * family (as-of: latest-at-or-before; interval: point containment;
  * overlap: interval intersection) and the one genomic/observability
  * engines on Spark hand-build (interval overlap is the core join of
  * range-partitioned genomics and of "which incidents overlapped this
  * deploy window" ops queries). Open-source Spark has no strategy for
  * it: the equi+two-inequality predicate plans as SortMergeJoin on the
  * key + post-join filter over the per-key cross product.
  *
  * Plan: both sides cluster on the key (one shuffle each, declared, AQE
  * reusable) and sort by (key, start). The merge walks BOTH sorted
  * streams in global (key, start) order; when the next interval comes
  * from one side, it (a) evicts the OTHER side's active intervals whose
  * end is at or before the newcomer's start — they can never overlap
  * anything later, since starts only grow — then (b) emits a pair for
  * every surviving opposite-side active (their start <= newcomer.start <
  * their end ⇒ overlap), and (c) joins its own side's active set. Cost
  * O(n_l + n_r + matches); peak memory = max CONCURRENT intervals per
  * key per side (the sweep-line bound), surfaced as `peakActive`.
  *
  * Semantics: INNER. NULL keys/bounds never match; empty intervals
  * (end <= start) never overlap anything. Each qualifying pair emits
  * exactly once (when the later-starting member arrives; ties broken by
  * processing left-before-right so the pair still emits once).
  */
final case class OverlapJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): OverlapJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[OverlapJoinNode]] as [[OverlapJoinExec]]. */
object OverlapJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case OverlapJoinNode(l, r, lk, rk, ls, le, rs, re) =>
      OverlapJoinExec(planLater(l), planLater(r), lk, rk, ls, le, rs, re) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sweep-line overlap join (see [[OverlapJoinNode]]). */
final case class OverlapJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightStart, Ascending)))

  /** INNER equi-key join — both children's clusterings hold on the
    * output; see the IntervalJoinExec note. */
  override def outputPartitioning: Partitioning =
    PartitioningCollection(Seq(left.outputPartitioning, right.outputPartitioning))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    // driver aggregates by SUM over per-task peaks — named accordingly
    "peakActive" -> SQLMetrics.createMetric(sparkContext,
      "sum of per-partition peak active intervals (both sides)"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): OverlapJoinExec =
    copy(left = newLeft, right = newRight)

  private def asLong(v: Any): Long = v match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
    case other => throw new IllegalArgumentException(
      s"interval bounds must be integral/timestamp/date, got value $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val peakActive = longMetric("peakActive")
    val keyType = leftKey.dataType
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, ls, le, rs, re) = (leftKey, rightKey, leftStart, leftEnd, rightStart, rightEnd)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, ls, le), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rs, re), rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val joined = new JoinedRow
      val lBuf = lIter.buffered
      val rBuf = rIter.buffered
      // Actives per side: (row copy, key copy holder row, start, end).
      // The key is retained via a copied projection row (AsOfJoinExec
      // lesson: projection buffers are rewritten on the next apply).
      final case class Active(row: InternalRow, kt: InternalRow, start: Long, end: Long)
      val activeL = new ArrayBuffer[Active]
      val activeR = new ArrayBuffer[Active]
      var peak = 0L

      // Pull the head (key, start, end) of a buffered side, skipping
      // null-key/bound rows; None when exhausted.
      def head(buf: scala.collection.BufferedIterator[InternalRow],
          proj: UnsafeProjection): Option[InternalRow] = {
        while (buf.hasNext) {
          val kt = proj(buf.head)
          if (kt.isNullAt(0) || kt.isNullAt(1) || kt.isNullAt(2)) buf.next()
          else return Some(kt)
        }
        None
      }

      def evictAndClear(actives: ArrayBuffer[Active], key: Any, start: Long): Unit = {
        var i = 0
        while (i < actives.length) {
          val a = actives(i)
          if (keyOrd.compare(a.kt.get(0, keyType), key) != 0 || a.end <= start)
            actives.remove(i)
          else i += 1
        }
      }

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty

        private def step(): Unit = {
          // Process the globally-next interval by (key, start); ties go
          // left-first (either order is correct — each pair still emits
          // exactly once, from whichever member is processed second).
          val lh = head(lBuf, lProj)
          val rh = head(rBuf, rProj)
          if (lh.isEmpty && rh.isEmpty) return
          val takeLeft = (lh, rh) match {
            case (Some(l), Some(r)) =>
              val c = keyOrd.compare(l.get(0, keyType), r.get(0, keyType))
              c < 0 || (c == 0 &&
                asLong(l.get(1, ls.dataType)) <= asLong(r.get(1, rs.dataType)))
            case (Some(_), None) => true
            case _ => false
          }
          if (takeLeft) {
            val kt = lh.get.copy()
            val row = lBuf.next().copy()
            val key = kt.get(0, keyType)
            val start = asLong(kt.get(1, ls.dataType))
            val end = asLong(kt.get(2, le.dataType))
            evictAndClear(activeR, key, start)
            evictAndClear(activeL, key, start)
            if (end > start) {
              activeL += Active(row, kt, start, end)
              // all surviving right actives: same key, rs <= start < re
              val matches = activeR.toArray
              numOutputRows += matches.length
              pending = matches.iterator.map(a => resultProj(joined(row, a.row)))
            }
          } else {
            val kt = rh.get.copy()
            val row = rBuf.next().copy()
            val key = kt.get(0, keyType)
            val start = asLong(kt.get(1, rs.dataType))
            val end = asLong(kt.get(2, re.dataType))
            evictAndClear(activeL, key, start)
            evictAndClear(activeR, key, start)
            if (end > start) {
              activeR += Active(row, kt, start, end)
              val matches = activeL.toArray
              numOutputRows += matches.length
              pending = matches.iterator.map(a => resultProj(joined(a.row, row)))
            }
          }
          val sz = (activeL.length + activeR.length).toLong
          if (sz > peak) { peak = sz; peakActive.set(peak) }
        }

        override def hasNext: Boolean = {
          while (!pending.hasNext && (lBuf.hasNext || rBuf.hasNext)) step()
          pending.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }
  }
}

/** DataFrame-level entry point (and per-session strategy registration). */
object Overlap {

  /** Registers [[OverlapJoinStrategy]] (and the rest of the custom-plan
    * family) once per session. */
  def register(spark: SparkSession): Unit = synchronized {
    Interval.register(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(OverlapJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ OverlapJoinStrategy
  }

  /** Overlap-joins two interval tables on `key`: emits every same-key
    * pair with a non-empty intersection of [leftStart, leftEnd) and
    * [rightStart, rightEnd). Both sides must carry `key`; other columns
    * keep their names (disambiguate beforehand, like any join). */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val r2 = right.select(right.columns.map {
      case c if c == key => col(c).as("__ov_key")
      case c             => col(c).as(c)
    }.toIndexedSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    def attr(pl: LogicalPlan, n: String): AttributeReference =
      pl.output.collectFirst { case a: AttributeReference if a.name == n => a }
        .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    val node = OverlapJoinNode(lp, rp,
      attr(lp, key), attr(rp, "__ov_key"),
      attr(lp, leftStart), attr(lp, leftEnd),
      attr(rp, rightStart), attr(rp, rightEnd))
    GraftPlanBridge.ofRows(spark, node).drop("__ov_key")
  }
}
