package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure interval join (point BETWEEN lo AND
  * hi with NO equi-join key) into a binned equi-join.
  *
  * Why: Spark plans a join whose condition has no equality conjunct as
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|L|·|R|)
  * predicate evaluations. At 100 TB that plan is a non-starter: a
  * 40 M-error × 15 M-window overlap query would evaluate 6·10^14
  * predicates. The standard fix (public technique, e.g. the range-join
  * bin optimization in Databricks Runtime and the interval-join
  * binning used by Flink) maps time onto fixed-width bins:
  *
  *   - a POINT p falls in exactly one bin  floor(p / W)
  *   - an INTERVAL [lo, hi] covers bins    floor(lo/W) .. floor(hi/W)
  *
  * Exploding the interval side over its covered bins (≤ len/W + 1 rows
  * per interval) and equi-joining on the bin id yields every candidate
  * pair exactly once (the point's single bin either is or isn't in the
  * interval's covered set — no dedup step needed), and the original
  * predicate is kept as a residual filter, so the rewrite is exact:
  * shuffle-hash/sort-merge on bin id + residual ≡ nested loop.
  *
  * Exactness at the bin boundary: bins are computed in double
  * arithmetic; IEEE-754 division and floor are monotone
  * non-decreasing, so lo ≤ p ≤ hi implies
  * bin(lo) ≤ bin(p) ≤ bin(hi) — a matching pair can never be missed
  * to rounding, independent of magnitude.
  *
  * Fires only when `spark.graft.rangeJoin.binSeconds` > 0 and only on
  * an INNER join whose condition has a point-in-interval pattern and
  * no cross-side equality (if an equi key exists, Spark's hash join
  * already scales and the band belongs as a post-filter — q20's
  * shape). The rewritten join contains a bin equality, so the guard
  * also terminates the fixed-point iteration. Registered through
  * [[graft.GraftExtensions]] (`spark.sql.extensions`).
  *
  * The reference has no joins at all (its single pipeline is
  * scan→insert, `/root/reference/src/main.rs:75-100`); this is pure
  * extension surface driven by SURVEY §2.2 row "joins: range".
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "spark.graft.rangeJoin.binSeconds"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = conf.getConfString(BinConf, "0").toDouble
    if (bin <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) if j.resolved =>
        rewrite(j, bin).getOrElse(j)
    }
  }

  /** b is a lower (isLower) or upper bound of the candidate point. */
  private case class Bound(point: Expression, bound: Expression, isLower: Boolean)

  private def bounds(c: Expression): Seq[Bound] = c match {
    // a >= b: b lower-bounds a AND a upper-bounds b — emit both
    // orientations; `pick` decides which side holds the point.
    case GreaterThanOrEqual(a, b) => Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
    case GreaterThan(a, b)        => Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
    case LessThanOrEqual(a, b)    => Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
    case LessThan(a, b)           => Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
    case _ => Seq.empty
  }

  private def supported(t: DataType): Boolean = t match {
    case TimestampType    => true
    case _: NumericType   => true
    case _                => false
  }

  /** Bin id as a codegen-friendly scalar: floor(value / width).
    * Timestamps go through unix_micros (ANSI-safe; no ts→numeric cast). */
  private def toBin(e: Expression, binSeconds: Double): Expression = {
    val (asDouble, width) = e.dataType match {
      case TimestampType => (Cast(UnixMicros(e), DoubleType), binSeconds * 1e6)
      case _             => (Cast(e, DoubleType), binSeconds)
    }
    Floor(Divide(asDouble, Literal(width)))
  }

  private def rewrite(j: Join, bin: Double): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)

    def crossSided(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
         (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet)))

    // An existing cross-side equality means Spark already has a hash
    // key — leave the plan alone (also the fixed-point terminator).
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => crossSided(a, b)
      case EqualNullSafe(a, b) => crossSided(a, b)
      case _ => false
    }
    if (hasEqui) return None

    val cands = conjuncts.flatMap(bounds)

    // Find p (point side) with both a lower and an upper bound from
    // the interval side, all deterministic and of one supported type.
    def pick(pointPlan: LogicalPlan, intervalPlan: LogicalPlan)
        : Option[(Expression, Expression, Expression)] = {
      val ps = cands.filter { b =>
        b.point.deterministic && b.bound.deterministic &&
          supported(b.point.dataType) && b.bound.dataType == b.point.dataType &&
          b.point.references.nonEmpty &&
          b.point.references.subsetOf(pointPlan.outputSet) &&
          b.bound.references.nonEmpty &&
          b.bound.references.subsetOf(intervalPlan.outputSet)
      }
      (for {
        lo <- ps.filter(_.isLower)
        hi <- ps.filterNot(_.isLower)
        if lo.point.semanticEquals(hi.point)
      } yield (lo.point, lo.bound, hi.bound)).headOption
    }

    val (pointIsLeft, (p, lo, hi)) = pick(j.left, j.right) match {
      case Some(t) => (true, t)
      case None => pick(j.right, j.left) match {
        case Some(t) => (false, t)
        case None    => return None
      }
    }

    val pointPlan    = if (pointIsLeft) j.left else j.right
    val intervalPlan = if (pointIsLeft) j.right else j.left

    // Point side: one extra projected column, its single bin id.
    val ptBin = Alias(toBin(p, bin), "graft_bin_pt")()
    val newPoint = Project(pointPlan.output :+ ptBin, pointPlan)

    // Interval side: explode the covered bin range. step=1 makes an
    // inverted (empty) interval generate zero rows instead of a
    // descending sequence.
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved and fails optimizer plan validation.
    val seq = Sequence(toBin(lo, bin), toBin(hi, bin), Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val ivBin = AttributeReference("graft_bin_iv", LongType, nullable = false)()
    val newInterval = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ivBin),
      child = intervalPlan)

    val newCond = And(EqualTo(ptBin.toAttribute, ivBin), cond)
    val newJoin =
      if (pointIsLeft) Join(newPoint, newInterval, Inner, Some(newCond), j.hint)
      else             Join(newInterval, newPoint, Inner, Some(newCond), j.hint)

    // Restore the original output (drop the two bin columns).
    Some(Project(j.output, newJoin))
  }
}
