package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: broadcast any join side that PROVABLY produces at
  * most one row (a global aggregate, a LIMIT 1, a single-row range).
  *
  * Why Spark doesn't already always do this: the planner's broadcast
  * decision is driven by SIZE ESTIMATES, and a global aggregate over
  * a huge input inherits a pre-aggregation size estimate far above
  * `autoBroadcastJoinThreshold` until AQE observes the real 1-row
  * output at runtime — so the static plan can pick a shuffled or
  * cartesian strategy for a side that is structurally guaranteed to
  * be one row (`LogicalPlan.maxRows`, a static plan property — no
  * statistics involved). Joining against a 1-row side is the
  * "compare everything to the global total" shape all over this
  * suite (q44/q53 window formulations exist precisely to avoid
  * re-execution; where a crossJoin IS the right shape — tiny probe
  * frames, span scalars — this rule pins the broadcast at plan time
  * instead of hoping AQE re-plans).
  *
  * Correctness: broadcasting a ≤1-row side is always semantics-
  * preserving; the rule only FILLS IN a missing join-strategy hint on
  * the Join node itself (injected rules run after `ResolvedHint`
  * elimination, so the hint goes into `Join.hint` directly, the same
  * slot `EliminateResolvedHint` writes) and never rewrites
  * expressions. A user-supplied strategy on a side is left alone.
  * Registered by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`. */
object BroadcastScalarAgg extends Rule[LogicalPlan] {

  private def isScalar(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1L)

  private def filled(existing: Option[HintInfo], side: LogicalPlan): Option[HintInfo] =
    existing match {
      case Some(h) if h.strategy.isDefined => existing
      case Some(h) if isScalar(side) => Some(h.copy(strategy = Some(BROADCAST)))
      case None if isScalar(side) => Some(HintInfo(strategy = Some(BROADCAST)))
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join =>
      val lh = filled(j.hint.leftHint, j.left)
      val rh = filled(j.hint.rightHint, j.right)
      if ((lh eq j.hint.leftHint) && (rh eq j.hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}
