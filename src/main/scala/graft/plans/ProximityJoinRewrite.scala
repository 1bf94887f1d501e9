package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: plan a naive proximity join as a banded equi-join.
  *
  * A user writing the natural form of "rows within c of each other" —
  *
  *   a JOIN b ON abs(a.t - b.t) <= c [AND more]
  *   a JOIN b ON levenshtein(a.s, b.s) <= k [AND more]
  *
  * hands Spark a join with NO equality conjunct, which the planner can
  * only execute as BroadcastNestedLoopJoin / cartesian — O(|a|·|b|)
  * comparisons, a non-starter at scale. Both predicates are Lipschitz
  * bounds on an integral DERIVED KEY — the value itself for the abs
  * form, string LENGTH for edit distance (levenshtein ≤ k ⇒
  * |len(a)−len(b)| ≤ k) — and any such bound means floor-div bands of
  * width c+1 over that key differ by at most 1. The join is therefore
  * equivalent to a shuffled EQUI-join on band id with the probe side
  * expanded to its three adjacent bands and the original predicate
  * kept as a post-filter — the same rewrite [[graft.ops.Intervals]]
  * (q53) and [[graft.ops.FuzzyJoin]] (q150) perform by hand, done here
  * INSIDE the optimizer so the naive SQL gets the scalable plan
  * automatically. This is the tier-(c) customization SURVEY §7.3
  * reserves for semantics the built-in planner genuinely cannot
  * reach: no DataFrame-level rewrite can fix a plan the user has
  * already declared.
  *
  * Scope guards (all load-bearing):
  *  - INNER joins only (band replication changes outer-side semantics);
  *  - fires only when NO cross-side equality conjunct exists — with an
  *    equi key the built-in hash join is already right, and the guard
  *    is also what makes the rule idempotent (the rewritten join HAS an
  *    equality conjunct, so it can never re-fire on its own output);
  *  - banded key integral (long/int), literal bound ≥ 0;
  *  - band = (x − pmod(x, w)) div w, i.e. true FLOOR division — a bare
  *    `div` truncates toward zero and mis-bands negative values.
  *
  * The original condition survives verbatim as part of the new join
  * condition, so the rewrite can never change results — only the plan
  * shape (3× probe replication buys hash partitioning; band width c+1
  * bounds per-band fan-in). Note the levenshtein band is coarser than
  * the predicate (equal-length strings can still be k edits apart), so
  * its win depends on length dispersion — but the REWRITE is always
  * sound, and the verify still runs only inside length-compatible
  * bands instead of everywhere. ProximityJoinSpec pins plan + result
  * parity against the nested-loop originals and the hand-banded op. */
object ProximityJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSides(a, b, j)
        case EqualNullSafe(a, b) => crossSides(a, b, j)
        case _ => false
      }
      // (bandable key on one side, key on the other side, band width):
      // abs-distance bands the compared value; edit-distance bands the
      // string length (|len(a)−len(b)| ≤ k whenever levenshtein ≤ k)
      val prox = if (hasEqui) None else conjuncts.collectFirst {
        case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(c, t))
            if integral(x) && integral(y) && bound(c, t) >= 0 &&
              crossSides(x, y, j) =>
          (x, y, bound(c, t) + 1)
        case GreaterThanOrEqual(Literal(c, t), Abs(Subtract(x, y, _), _))
            if integral(x) && integral(y) && bound(c, t) >= 0 &&
              crossSides(x, y, j) =>
          (x, y, bound(c, t) + 1)
        case LessThanOrEqual(Levenshtein(x, y, None), Literal(c, t))
            if bound(c, t) >= 0 && crossSides(x, y, j) =>
          (Length(x), Length(y), bound(c, t) + 1)
        case GreaterThanOrEqual(Literal(c, t), Levenshtein(x, y, None))
            if bound(c, t) >= 0 && crossSides(x, y, j) =>
          (Length(x), Length(y), bound(c, t) + 1)
      }
      prox match {
        case Some((x, y, width)) =>
          val (lx, ry) =
            if (x.references.subsetOf(left.outputSet)) (x, y) else (y, x)
          val bandL = AttributeReference("__prox_band_l", LongType)()
          val bandR = Alias(bandOf(ry, width), "__prox_band_r")()
          val expandedLeft = Expand(
            Seq(-1L, 0L, 1L).map(d =>
              left.output :+ Add(bandOf(lx, width), Literal(d))),
            left.output :+ bandL, left)
          val projRight = Project(right.output :+ bandR, right)
          val newJoin = Join(expandedLeft, projRight, Inner,
            Some(And(EqualTo(bandL, bandR.toAttribute), cond)), hint)
          Project(j.output, newJoin)
        case None => j
      }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def bound(c: Any, t: org.apache.spark.sql.types.DataType): Long =
    t match {
      case LongType => c.asInstanceOf[Long]
      case IntegerType => c.asInstanceOf[Int].toLong
      case _ => -1L
    }

  private def crossSides(a: Expression, b: Expression, j: Join): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(j.left.outputSet) &&
        b.references.subsetOf(j.right.outputSet)) ||
        (a.references.subsetOf(j.right.outputSet) &&
          b.references.subsetOf(j.left.outputSet)))

  /** floor(x / width) over integral x, negative-safe: subtract the
    * always-non-negative Pmod remainder first, then exact `div`. */
  private def bandOf(x: Expression, width: Long): Expression = {
    val xl = if (x.dataType == LongType) x else Cast(x, LongType)
    val w = Literal(width)
    IntegralDivide(Subtract(xl, Pmod(xl, w)), w)
  }
}
