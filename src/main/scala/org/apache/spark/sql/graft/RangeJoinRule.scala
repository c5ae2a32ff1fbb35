/** Optimizer-rule tier of the engine's Catalyst extensions: a
  * logical rewrite that turns declarative bounded time-range joins
  * into the scalable bucketed equi-join form automatically.
  *
  * A join whose condition contains `abs(lt - rt) <= w` (lt from the
  * left side, rt from the right, w a positive integer literal) is
  * planned by Spark as an equi-join on the remaining equality keys
  * with the range check as a per-key residual — a per-key cross
  * product — or, with no equality keys at all, as a broadcast
  * nested-loop join: quadratic either way. The rewrite adds a
  * time-bucket equi-key: the right side gets `floorDiv(rt, w)`, the
  * left side explodes `floorDiv(lt, w) ± 1` (any in-range pair's
  * buckets differ by at most 1, so probing the left row's own bucket
  * ±1 finds every match through the right row's SINGLE bucket —
  * exactly once, so no dedup is needed). The original condition
  * stays as the residual, so results are bit-identical; candidates
  * are bounded by bucket occupancy instead of key cardinality.
  * floorDiv (not `div`, which truncates toward zero) keeps the
  * coverage proof valid for negative times.
  *
  * This is the same transform `EventsOps.rangeJoin` applies by hand
  * — lifted into the optimizer so callers can write the naive
  * condition (see `EventsOps.rangeJoinNative`, oracle-checked
  * against the hand-bucketed form's SQL). Injected via
  * `injectOptimizerRule` (GraftExtensions); runs in the fixed-point
  * operator-optimization batch, so the rewritten join is guarded
  * against re-matching by its marker bucket columns.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotently attach the rule to an existing session (sessions
    * built with spark.sql.extensions=graft.GraftExtensions get it at
    * creation; this is the path for everyone else). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(RangeJoinRule))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ RangeJoinRule
  }

  private val BucketL = "__graft_bucket_l"
  private val BucketR = "__graft_bucket_r"

  /** Column-name prefix reserved as the "already bucketed" marker.
    * The rule's own rewrite emits `__graft_bucket_l/_r`; hand-bucketed
    * joins that must not be re-bucketed (EventsOps.rangeJoin) name
    * their probe key with this prefix too. */
  val BucketMarkerPrefix = "__graft_bucket"

  /** Set on the Join node this rule emits — survives later transform
    * copies (Catalyst copies tags on node replacement), so the
    * fixed-point batch never re-matches its own output even if the
    * marker columns get aliased away. */
  private val rewrittenTag = TreeNodeTag[Boolean]("graft.rangeJoin.rewritten")

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** floor(t / w) in exact long arithmetic: (t - pmod(t, w)) div w. */
  private def floorDiv(t: Expression, w: Long): Expression = {
    val tl = if (t.dataType == LongType) t else Cast(t, LongType)
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(tl, Pmod(tl, wl)), wl)
  }

  /** Extracts (leftTime, rightTime, window) from `abs(lt - rt) <= w`
    * (either operand order, either comparison direction). */
  private def rangePredicate(conjunct: Expression, left: LogicalPlan,
                             right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def window(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) if v > 0 => Some(v)
      case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
      case _ => None
    }
    def sides(diff: Expression): Option[(Expression, Expression)] = diff match {
      case Subtract(a, b, _) if isIntegral(a) && isIntegral(b) &&
          a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) =>
        Some((a, b))
      case Subtract(a, b, _) if isIntegral(a) && isIntegral(b) &&
          b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet) =>
        Some((b, a))
      case _ => None
    }
    conjunct match {
      case LessThanOrEqual(Abs(diff, _), wExpr) =>
        for (w <- window(wExpr); (lt, rt) <- sides(diff)) yield (lt, rt, w)
      case GreaterThanOrEqual(wExpr, Abs(diff, _)) =>
        for (w <- window(wExpr); (lt, rt) <- sides(diff)) yield (lt, rt, w)
      case _ => None
    }
  }

  /** True if the child's TOP-LEVEL output carries a `__graft_bucket*`
    * marker column — this rule's own rewrite (`__graft_bucket_l/_r`)
    * or a hand-bucketed form that opted out by naming its probe key
    * with the reserved prefix (EventsOps.rangeJoin). Deliberately NOT
    * a deep subtree scan: the rewrite projects its markers away above
    * the new join (and rewrittenTag guards self-rematch), so a range
    * join stacked ABOVE an already-bucketed one — cascaded range
    * joins — still gets its own independent rewrite instead of
    * silently falling back to a nested-loop plan. */
  private def hasBucketMarker(plan: LogicalPlan): Boolean =
    plan.output.exists(_.name.startsWith(BucketMarkerPrefix))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.getTagValue(rewrittenTag).isEmpty &&
          !cond.references.exists(a => a.name.startsWith(BucketMarkerPrefix)) &&
          !hasBucketMarker(left) && !hasBucketMarker(right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.flatMap(c => rangePredicate(c, left, right)).headOption match {
        case Some((lt, rt, w)) =>
          val bl = AttributeReference(BucketL, LongType, nullable = true)()
          val blBase = floorDiv(lt, w)
          val probes = CreateArray(Seq(
            Subtract(blBase, Literal(1L)), blBase, Add(blBase, Literal(1L))))
          val leftGen = Generate(Explode(probes), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(bl), child = left)
          val brAlias = Alias(floorDiv(rt, w), BucketR)()
          val rightProj = Project(right.output :+ brAlias, right)
          val newCond = And(cond, EqualTo(bl, brAlias.toAttribute))
          val newJoin = Join(leftGen, rightProj, Inner, Some(newCond), hint)
          newJoin.setTagValue(rewrittenTag, true)
          Project(j.output, newJoin)
        case None => j
      }
  }
}
