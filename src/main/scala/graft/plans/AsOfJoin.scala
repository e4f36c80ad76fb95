package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Whole-operator as-of join: for every left row, the LATEST right row of
  * the same key whose time is <= the left row's time (optionally within a
  * tolerance), as a single co-partitioned merge pass.
  *
  * This is SURVEY §2.3 J6 (the reference's "latest trade at or before the
  * txn" lookup — the one join its warehouse surface hand-builds; see
  * SURVEY.md §2.3 citing trades/txns) expressed at the level the builder
  * prompt calls tier (c): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered either per-session (`AsOf.join` auto-registers
  * on `spark.experimental.extraStrategies`) or globally via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Why a custom operator when q25/q53 already pass with the window
  * rewrite: the rewrite UNIONs both sides and runs a running-`max` window,
  * which (a) carries every left column through the union (wide rows
  * shuffle), and (b) can only fetch ONE right column per window pass —
  * k payload columns cost k window evaluations. The merge exec shuffles
  * each side once on the key, sorts within partitions on (key, time) —
  * both enforced declaratively via `requiredChildDistribution` /
  * `requiredChildOrdering`, so Catalyst/AQE plan the exchanges and can
  * reuse an existing layout — and then streams BOTH sorted iterators in
  * one O(n_left + n_right) pass holding exactly one buffered right row.
  * No union, no per-column passes, no state beyond the held row: at 100 TB
  * the cost is the two key shuffles, which is the floor for any
  * key-matched join.
  *
  * Semantics (left-outer, Pandas `merge_asof`-shaped): every left row is
  * emitted once; unmatched rows carry nulls on the right columns. NULL
  * keys and NULL times never match. Ties on right time take the row
  * latest in (key, time) sort order. `toleranceLong` (same unit as the
  * time column's internal value — µs for timestamps, the raw value for
  * ints/longs) drops matches older than `leftTime - tolerance`.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; every other node falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sorted-merge as-of join.
  *
  * `requiredChildDistribution` asks Catalyst for both sides clustered on
  * the key (EnsureRequirements inserts/reuses compatible hash exchanges —
  * under AQE the two leaf shuffle stages coalesce together, like a
  * sort-merge join's), `requiredChildOrdering` for a (key, time) sort
  * within partitions. `doExecute` then zips the co-partitioned RDDs and
  * merges: advance the right iterator while its (key, time) is at or
  * before the current left row's, remembering the last right row whose
  * key matched; that held row (if still the same key, within tolerance)
  * is the match. Left rows stream straight through — one output row per
  * left row, in left sort order (`outputOrdering` declares it, so a
  * downstream sort on the same key is elided).
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // Internal time values are integral for every supported ordering column
  // (timestamp = µs long, date = day int, plus int/long/short/byte).
  private def asLong(v: Any): Long = v match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
    case other => throw new IllegalArgumentException(
      s"as-of time column must be integral/timestamp, got value $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val tol = tolerance
    val keyType = leftKey.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOut)
      val rProj = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOut)
      // Bind against NULLABLE right attributes: unmatched left rows read
      // the all-null pad row, and a BoundReference built from the child's
      // original non-nullable attribute would skip the null check and
      // materialize primitive zeros instead of nulls.
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rBuf = rIter.buffered
      // The one piece of merge state: the last right row consumed whose
      // key/time were valid. Both the full row and its projected
      // (key, time) pair are COPIES — the child iterators reuse their
      // row buffers, and a projection's output row is rewritten on the
      // next apply, so anything held across iterations must be snapped.
      var heldRow: InternalRow = null
      var heldKT: InternalRow = null
      var heldTime: Long = 0L
      lIter.map { lRow =>
        val lkRow = lProj(lRow)
        val lkNull = lkRow.isNullAt(0)
        val ltNull = lkRow.isNullAt(1)
        val lk = if (lkNull) null else lkRow.get(0, keyType)
        val lt = if (ltNull) 0L else asLong(lkRow.get(1, lTimeExpr.dataType))
        if (!lkNull) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val rkRow = rProj(rBuf.head)
            if (rkRow.isNullAt(0)) { rBuf.next(); () } // null key: never matches
            else {
              val cmp = keyOrd.compare(rkRow.get(0, keyType), lk)
              if (cmp < 0) { rBuf.next(); () } // earlier key: obsolete for every future left row too
              else if (cmp == 0 && !rkRow.isNullAt(1) && !ltNull &&
                asLong(rkRow.get(1, rTimeExpr.dataType)) <= lt) {
                // Same key, at-or-before the left time: newest candidate
                // so far. Snap full row + (key, time) out of the buffers.
                heldRow = rBuf.next().copy()
                heldKT = rProj(heldRow).copy()
                heldTime = asLong(heldKT.get(1, rTimeExpr.dataType))
              } else if (cmp == 0 && rkRow.isNullAt(1)) { rBuf.next(); () } // null time: never matches
              else advance = false
            }
          }
        }
        val matched = heldRow != null && !lkNull && !ltNull &&
          keyOrd.compare(heldKT.get(0, keyType), lk) == 0 && heldTime <= lt &&
          tol.forall(t => lt - heldTime <= t)
        numOutputRows += 1
        if (matched) { numMatched += 1; resultProj(joined(lRow, heldRow)) }
        else resultProj(joined(lRow, nullRight))
      }
    }
  }
}

/** DataFrame-level entry point (and per-session strategy registration). */
object AsOf {

  /** Adds [[AsOfJoinStrategy]] + the [[AsOfRules]] optimizer rules to the
    * session once (filter pushdown / column pruning through the custom
    * node — without them it is an optimization barrier). */
  def register(spark: SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.exists(AsOfRules.all.contains))
      exp.extraOptimizations = exp.extraOptimizations ++ AsOfRules.all
  }

  /** As-of joins `right` onto `left`: both sides must carry `key`; the
    * right side's time column lands in the output as `rightTimeAs`
    * (payload columns keep their names — disambiguate before calling,
    * like any join). `toleranceLong` is in the time column's internal
    * unit (µs for timestamps). */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTimeAs: String,
      toleranceLong: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // Fresh aliases give the right side new exprIds (safe self-join) and
    // intern the key/time under reserved names so they can be dropped /
    // renamed without colliding with left columns.
    val r2 = right.select(right.columns.map {
      case c if c == key       => col(c).as("__asof_key")
      case c if c == rightTime => col(c).as("__asof_time")
      case c                   => col(c).as(c)
    }.toIndexedSeq: _*)
    val lp = analyzed(left)
    val rp = analyzed(r2)
    def attr(p: LogicalPlan, n: String): AttributeReference =
      p.output.collectFirst { case a: AttributeReference if a.name == n => a }
        .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    val node = AsOfJoinNode(lp, rp,
      attr(lp, key), attr(rp, "__asof_key"),
      attr(lp, leftTime), attr(rp, "__asof_time"), toleranceLong)
    GraftPlanBridge.ofRows(spark, node)
      .drop("__asof_key")
      .withColumnRenamed("__asof_time", rightTimeAs)
  }

  private def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
