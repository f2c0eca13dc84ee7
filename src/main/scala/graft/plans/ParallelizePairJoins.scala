package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.RightOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Repartition, RepartitionOperation}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: round-robin-repartition the stream side of a tiny
  * non-equi (pair/cartesian) join.
  *
  * The trap this automates (measured in round 1, q34: 27 s → 0.7 s at
  * sf0.1): a fixture-sized table loads as ONE parquet split, so a
  * broadcast-nested-loop pair join — the O(n²) shape every all-pairs
  * similarity/dedup operator bottoms out in — runs as a single task no
  * matter how many cores the cluster has. Catalyst never inserts the
  * missing exchange because a BNLJ inherits the stream side's
  * partitioning as-is.
  *
  * Fire conditions (all must hold):
  *  - the join has NO equi-join conjunct (hash/sort-merge joins already
  *    shuffle into parallelism; touching them would add a useless pass);
  *  - BOTH sides' size estimates fit in one scan partition
  *    (`spark.sql.files.maxPartitionBytes`) — if the stream side is big it
  *    is already multi-split, and if only the build side is small the
  *    planner streams the big side in parallel on its own;
  *  - neither input is streaming, and the stream side has no explicit
  *    repartition below it (the author's layout wins — also makes the rule
  *    idempotent across optimizer passes).
  *
  * Engine operators (Dedup/Ann) keep their explicit `repartition` calls —
  * explicit beats implicit in reviewed code; this rule is the safety net
  * for ad-hoc user queries hitting the same cliff. Registered via
  * `experimental.extraOptimizations` ([[graft.core.GraftSession.tune]])
  * and `spark.sql.extensions` ([[graft.GraftExtensions]]).
  */
object ParallelizePairJoins extends Rule[LogicalPlan] with PredicateHelper {

  private def hasEquiConjunct(cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists { p =>
      val sides = p match {
        case EqualTo(a, b) => Some((a, b))
        case EqualNullSafe(a, b) => Some((a, b)) // <=> also plans as an equi join
        case _ => None
      }
      sides.exists { case (a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      }
    }

  private def singleSplit(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes <= conf.filesMaxPartitionBytes

  private def alreadyLaidOut(p: LogicalPlan): Boolean =
    p.exists {
      case _: RepartitionOperation => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // the STREAM side of a BNLJ is the left for every join type except
    // right-outer (which must build/broadcast the left) — repartitioning
    // the build side would add a shuffle and leave the cliff in place
    case j @ Join(left, right, joinType, cond, _)
        if !j.isStreaming &&
          cond.forall(c => !hasEquiConjunct(c, left, right)) &&
          singleSplit(left) && singleSplit(right) &&
          !alreadyLaidOut(if (joinType == RightOuter) right else left) =>
      val repartitioned = (p: LogicalPlan) =>
        Repartition(conf.numShufflePartitions, shuffle = true, p)
      if (joinType == RightOuter) j.copy(right = repartitioned(right))
      else j.copy(left = repartitioned(left))
  }
}
