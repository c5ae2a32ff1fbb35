/** A whole-operator Catalyst extension: backward AS-OF join as a
  * first-class logical node + planner strategy + physical operator.
  *
  * Why a custom plan (SURVEY.md §2.2 "custom operators", preference
  * (c)): Spark has no as-of join. The composition in
  * `EventsOps.asOfJoin` (union both streams, last-ignore-nulls
  * window) is correct and oracle-checked, but it carries the match
  * stream's columns through a window over the UNION of both streams
  * — at 100 TB that is one wide shuffle of left+right together and a
  * running-state window over the merged stream. The native operator
  * instead hash-partitions each side on its key (two narrow
  * exchanges, each the size of its own side), sorts within
  * partitions, and emits matches in ONE merge scan with O(1) state
  * (the last-seen right row). No union, no window machinery, and the
  * right side streams through without being carried per-left-row.
  *
  * Semantics (matching the window formulation bit-for-bit, verified
  * in AsOfJoinSpec + the DuckDB oracle): for each left row, the
  * right row with the same key and the greatest (time, seq) that is
  * lexicographically <= the left row's (time, seq); unmatched left
  * rows emit nulls on the right (left-outer). Rows with a null key,
  * time, or seq never match (left ones still emit).
  */
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical backward as-of join. Output = left columns followed by
  * the right columns (right side forced nullable: left-outer). */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftSeq: Expression, rightSeq: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinNode into AsOfJoinExec; a no-op for everything
  * else. Registered via GraftExtensions and (idempotently) by
  * [[AsOfJoinApi.join]] through `spark.experimental`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, ls, rs) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ls, rs) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: both children hash-clustered on
  * their key and sorted by (key, time, seq); one forward merge scan
  * per partition with O(1) state. Skew note: state per key is a
  * single row, so a hot key costs only its own scan time — no
  * per-key buffering (contrast a window over the union, which holds
  * running columns for the merged stream). */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftSeq: Expression, rightSeq: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftSeq, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightSeq, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftSeq, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val nRight = right.output.length
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTime = BindReferences.bindReference(leftTime, left.output)
      val lSeq = BindReferences.bindReference(leftSeq, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTime = BindReferences.bindReference(rightTime, right.output)
      val rSeq = BindReferences.bindReference(rightSeq, right.output)
      val project = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (copied: SQL iterators
        // reuse row objects) and the last right row that matched the
        // current key — the operator's entire state
        private var rHead: InternalRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: Any = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey.eval(l)
          if (lk == null) { numOutputRows += 1; return project(joined(l, nullRight)) }
          val lt = lTime.eval(l)
          val ls = lSeq.eval(l)
          var advancing = lt != null && ls != null
          while (advancing) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next().copy()
            if (rHead == null) advancing = false
            else {
              val rk = rKey.eval(rHead)
              val cmp = if (rk == null) -1 else keyOrdering.compare(rk, lk)
              if (cmp < 0) rHead = null // behind the current key: discard
              else if (cmp > 0) advancing = false
              else {
                val rt = rTime.eval(rHead)
                val rs = rSeq.eval(rHead)
                if (rt == null || rs == null) {
                  // null time/seq can never match, and Ascending sort
                  // puts nulls FIRST — stopping here would leave the
                  // null row blocking every valid row behind it for
                  // this key; discard it and keep scanning
                  rHead = null
                } else {
                  val precedes =
                    rt.asInstanceOf[Long] < lt.asInstanceOf[Long] ||
                      (rt.asInstanceOf[Long] == lt.asInstanceOf[Long] &&
                        rs.asInstanceOf[Long] <= ls.asInstanceOf[Long])
                  if (precedes) { lastMatch = rHead; lastMatchKey = rk; rHead = null }
                  else advancing = false
                }
              }
            }
          }
          val matched = lastMatch != null && lt != null && ls != null &&
            keyOrdering.compare(lastMatchKey, lk) == 0
          numOutputRows += 1
          if (matched) numMatched += 1
          project(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }
}

/** DataFrame-level entry point (the `graft`-side wrapper lives in
  * graft.operators.EventsOps.asOfJoinNative). */
object AsOfJoinApi {

  /** Backward as-of join `left` with `right`. Column names are per
    * side; time and seq columns must be LongType. Right-side
    * attributes are re-aliased (fresh exprIds), so self-joins —
    * both sides derived from the same frame — are safe. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           leftSeq: String, rightSeq: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lplan = left.queryExecution.analyzed
    val rplan = right.select(right.columns.map(c => right(c).as(c)).toSeq: _*)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): AttributeReference =
      plan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    def longAttr(plan: LogicalPlan, name: String): AttributeReference = {
      val a = attr(plan, name)
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of join: column '$name' must be LongType (epoch micros / sequence), " +
          s"got ${a.dataType.simpleString} — cast it before joining")
      a
    }
    val node = AsOfJoinNode(lplan, rplan,
      attr(lplan, leftKey), attr(rplan, rightKey),
      longAttr(lplan, leftTime), longAttr(rplan, rightTime),
      longAttr(lplan, leftSeq), longAttr(rplan, rightSeq))
    org.apache.spark.sql.classic.Dataset.ofRows(spark, node)
  }
}
