package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

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
  * Dirty-data hardening (the generator is only ever evaluated on rows
  * proven safe):
  *
  *   - INVERTED intervals (hi < lo, e.g. a corrupted row): Sequence
  *     with stop < start and step 1 THROWS at runtime on Spark 4
  *     ("Illegal sequence boundaries") — it does not yield an empty
  *     array. Such rows cannot match the original predicate, so they
  *     are dropped before the generator (filter + an If belt inside
  *     the generator itself).
  *   - WIDE intervals (a sentinel far-future end date against 1 h
  *     bins): exploding floor(len/W)+1 bins per row can generate
  *     millions of rows or overflow Sequence's max array length. Rows
  *     covering more than `spark.graft.rangeJoin.maxBinsPerRow`
  *     (default 4096) bins are routed to a separate nested-loop guard
  *     leg that evaluates the ORIGINAL predicate — exact, and cheap as
  *     long as wide rows are the rare exception they should be (the
  *     guard side carries a broadcast hint). The rewrite stays a pure
  *     two-leg partition of the interval side:
  *       narrow rows → explode + hash join;  wide rows → nested loop;
  *       inverted/null rows → provably matchless, dropped.
  *   - Fixed-length windows (hi = lo + CONSTANT, the dominant idiom —
  *     q47's `w_start + INTERVAL 1 HOUR`): the fan-out bound is proven
  *     STATICALLY by tracing the bound expressions through
  *     Project/Aggregate aliases, and the guard leg is omitted
  *     entirely — the plan is a single hash join, nothing nested-loop.
  *
  * Plain-numeric ranges reuse the time bin width by default, which is
  * wrong when the data's scale isn't seconds-like; set
  * `spark.graft.rangeJoin.numericBinWidth` to the expected interval
  * length of the NUMERIC ranges (too small → fan-out toward the
  * per-row cap; too large → everything lands in one bin and the hash
  * join degenerates to one task doing a filtered cartesian).
  *
  * Fires only when `spark.graft.rangeJoin.binSeconds` > 0 and only on
  * an INNER join whose condition has a point-in-interval pattern and
  * no cross-side equality (if an equi key exists, Spark's hash join
  * already scales and the band belongs as a post-filter — q20's
  * shape). The rewritten join contains a bin equality, so the guard
  * also terminates the fixed-point iteration; the nested-loop guard
  * leg is tagged so the rule never re-fires on it. Registered through
  * [[graft.GraftExtensions]] (`spark.sql.extensions`).
  *
  * The reference has no joins at all (its single pipeline is
  * scan→insert, `/root/reference/src/main.rs:75-100`); this is pure
  * extension surface driven by SURVEY §2.2 row "joins: range".
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "spark.graft.rangeJoin.binSeconds"

  /** Bin width for plain-numeric (non-timestamp) bounds. Empty →
    * falls back to [[BinConf]]'s value, interpreted unitless. */
  val NumericWidthConf = "spark.graft.rangeJoin.numericBinWidth"

  /** Per-interval fan-out cap. Intervals covering more bins than this
    * go to the nested-loop guard leg instead of being exploded. */
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerRow"

  /** Marks the guard-leg join (which still has no equi key) so the
    * fixed-point optimizer does not rewrite it again. TreeNode tags
    * survive `makeCopy`/`withNewChildren`, so the mark persists across
    * later rule applications that rebuild the node. */
  private val SkipTag = TreeNodeTag[Boolean]("graft.rangeJoin.skip")

  private case class Cfg(seconds: Double, numeric: Double, maxBins: Long)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = conf.getConfString(BinConf, "0").toDouble
    if (bin <= 0) plan
    else {
      val numeric = conf.getConfString(NumericWidthConf, "") match {
        case "" => bin
        case s  => s.toDouble
      }
      val cfg = Cfg(bin, numeric, conf.getConfString(MaxBinsConf, "4096").toLong)
      plan.transformUp {
        // Guard-leg detection is belt-and-suspenders: the SkipTag is
        // set on the guard join, but optimizer rules that rebuild a
        // Join through its constructor (rather than withNewChildren)
        // silently drop tags — so ALSO recognize the guard leg by its
        // "graft_g_"-renamed child attributes, which survive every
        // plan rewrite (pruning keeps names; the guard's top Project
        // maps back to the original names, so the sentinel never
        // escapes the guard subtree).
        case j @ Join(_, _, Inner, Some(_), _)
            if j.resolved && j.getTagValue(SkipTag).isEmpty &&
              !j.children.exists(_.output.exists(_.name.startsWith("graft_g_"))) =>
          rewrite(j, cfg).getOrElse(j)
      }
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
    case TimestampNTZType => true
    case _: NumericType   => true
    case _                => false
  }

  /** Bin id as a codegen-friendly scalar: floor(value / width).
    * Timestamps go through unix_micros (ANSI-safe; no ts→numeric cast).
    * TIMESTAMP_NTZ — the shape Spark reads from Parquet
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) footers — is widened to
    * TimestampType first (value-identical under the UTC session zone
    * every entry point pins); without this arm the rule silently
    * no-fires on NTZ columns and the join degrades to a nested loop. */
  private def toBin(e: Expression, cfg: Cfg): Expression = {
    val (asDouble, width) = e.dataType match {
      case TimestampType    => (Cast(UnixMicros(e), DoubleType), cfg.seconds * 1e6)
      // the NTZ→LTZ cast is TimeZoneAwareExpression: without an
      // explicit zone it reports unresolved and fails optimizer plan
      // validation (same trap as Sequence below). The zone is pinned
      // to UTC, NOT conf.sessionLocalTimeZone: bins are internal, so
      // any FIXED monotone local→instant mapping keeps the rewrite
      // exact, and UTC has no DST — under a DST session zone the
      // fall-back hour stretches a fixed-length local window's
      // instant span, so a window statically proven narrow could
      // exceed maxBins at runtime and the If-belt would silently
      // emit an empty bin array (dropped rows) on the guard-less
      // proven-narrow path.
      case TimestampNTZType =>
        (Cast(UnixMicros(Cast(e, TimestampType, Some("UTC"))),
          DoubleType), cfg.seconds * 1e6)
      case _                => (Cast(e, DoubleType), cfg.numeric)
    }
    Floor(Divide(asDouble, Literal(width)))
  }

  /** exprId → aliased child, for every Project/Aggregate in the plan
    * (exprIds are globally unique, so one flat map is unambiguous). */
  private def aliasMap(plan: LogicalPlan): Map[ExprId, Expression] =
    plan.collect {
      case p: Project   => p.projectList
      case a: Aggregate => a.aggregateExpressions
    }.flatten.collect { case a: Alias => a.toAttribute.exprId -> a.child }.toMap

  /** Substitute attributes by their defining expressions until fixpoint
    * (bounded fuel — alias chains are short in practice). */
  private def dealias(e: Expression, m: Map[ExprId, Expression]): Expression = {
    var cur = e
    var fuel = 8
    var changed = true
    while (changed && fuel > 0) {
      val next = cur.transformUp {
        case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
      }
      changed = !next.fastEquals(cur)
      cur = next
      fuel -= 1
    }
    cur
  }

  private def litToDouble(v: Any): Option[Double] = v match {
    case n: Byte    => Some(n.toDouble)
    case n: Short   => Some(n.toDouble)
    case n: Int     => Some(n.toDouble)
    case n: Long    => Some(n.toDouble)
    case n: Float   => Some(n.toDouble)
    case n: Double  => Some(n)
    case d: Decimal => Some(d.toDouble)
    case _          => None
  }

  /** Statically-proven upper bound on bins covered by [lo, hi], from
    * the `hi = lo + CONSTANT` shape (after tracing both bounds through
    * projection aliases). floor's monotonicity gives
    * bin(hi) - bin(lo) ≤ span/W + 1. None = not provable. */
  private def staticBinSpan(lo: Expression, hi: Expression,
      m: Map[ExprId, Expression], cfg: Cfg): Option[Double] = {
    val loD = dealias(lo, m)
    val span: Option[Double] = dealias(hi, m) match {
      case TimestampAddInterval(base, Literal(v, dt), _) if base.semanticEquals(loD) => dt match {
        case _: DayTimeIntervalType => Some(v.asInstanceOf[Long].toDouble / (cfg.seconds * 1e6))
        case CalendarIntervalType =>
          val iv = v.asInstanceOf[CalendarInterval]
          // months are calendar-variable; refuse to bound them statically
          if (iv.months != 0) None
          else Some((iv.days * 86400e6 + iv.microseconds) / (cfg.seconds * 1e6))
        case _ => None
      }
      case Add(base, Literal(v, _: NumericType), _) if base.semanticEquals(loD) =>
        litToDouble(v).map(_ / cfg.numeric)
      case Add(Literal(v, _: NumericType), base, _) if base.semanticEquals(loD) =>
        litToDouble(v).map(_ / cfg.numeric)
      case _ => None
    }
    span.map(_ + 1.0)
  }

  private def rewrite(j: Join, cfg: Cfg): Option[LogicalPlan] = {
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
    val ptBin = Alias(toBin(p, cfg), "graft_bin_pt")()
    val newPoint = Project(pointPlan.output :+ ptBin, pointPlan)

    val binLo = toBin(lo, cfg)
    val binHi = toBin(hi, cfg)
    val spanOk = LessThanOrEqual(Subtract(binHi, binLo), Literal(cfg.maxBins))
    val ordered = LessThanOrEqual(binLo, binHi)

    // Interval side: explode the covered bin range. The If belt makes
    // the generator total even if a later rule re-orders it above the
    // narrow filter: inverted/too-wide rows yield an empty array, not
    // a Sequence runtime error.
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved and fails optimizer plan validation.
    def binnedLeg(ivSide: LogicalPlan): LogicalPlan = {
      val seq = Sequence(binLo, binHi, Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val safeSeq = If(And(ordered, spanOk), seq,
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val ivBin = AttributeReference("graft_bin_iv", LongType, nullable = false)()
      val newInterval = Generate(Explode(safeSeq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ivBin),
        child = ivSide)
      val newCond = And(EqualTo(ptBin.toAttribute, ivBin), cond)
      val newJoin =
        if (pointIsLeft) Join(newPoint, newInterval, Inner, Some(newCond), j.hint)
        else             Join(newInterval, newPoint, Inner, Some(newCond), j.hint)
      // Restore the original output (drop the two bin columns).
      Project(j.output, newJoin)
    }

    val provenNarrow = staticBinSpan(lo, hi, aliasMap(intervalPlan), cfg)
      .exists(s => s >= 0.0 && s <= cfg.maxBins.toDouble)

    if (provenNarrow) {
      // Fixed-length windows: single hash-join leg, no guard needed.
      Some(binnedLeg(intervalPlan))
    } else {
      // General case: partition the interval side by runtime fan-out.
      //   ordered && span ≤ cap  → explode + hash join (the fast path)
      //   ordered && span > cap  → nested-loop guard leg, original
      //                            predicate, wide side broadcast
      //   inverted or null bound → cannot match; in neither leg
      // The guard leg exists for RARE pathological rows; if the bin
      // width is misconfigured for the data's scale (e.g. the seconds
      // default against microsecond-magnitude numerics), MOST rows
      // exceed the cap and an unbounded relation gets broadcast. Warn
      // with the knobs so a fat guard leg is diagnosable from logs.
      logWarning(s"graft range-join binning: interval span not provably ≤ " +
        s"$MaxBinsConf=${cfg.maxBins} bins — adding a broadcast nested-loop " +
        s"guard leg for over-wide rows. If most rows are wide, the guard " +
        s"side broadcast can OOM: check $BinConf/$NumericWidthConf match " +
        s"the data's scale (condition: ${cond.sql})")
      val narrow = binnedLeg(Filter(And(ordered, spanOk), intervalPlan))
      // The guard leg re-uses the same point/interval subtrees as the
      // narrow leg. A post-analysis self-union with IDENTICAL ExprIds
      // in both children executes correctly (Union is positional) but
      // violates per-operator ExprId-uniqueness assumptions that
      // plan-change validation and attribute-matching rules rely on —
      // so re-alias the guard leg's subtrees with FRESH ExprIds (what
      // analysis-time DeduplicateRelations would do) and rewrite the
      // predicates to the new attributes.
      //
      // The aliases are RENAMES ("graft_g_" prefix), deliberately: a
      // same-name Alias(attr) is "redundant" to RemoveRedundantAliases,
      // which strips it and rebuilds the enclosing Join through the
      // Join constructor — dropping the SkipTag and letting this rule
      // re-fire on the guard join every optimizer iteration (observed:
      // fixpoint hit max iterations, one extra Union leg per round).
      // A rename is semantically load-bearing, so no rule removes it,
      // the guard subtree reaches a fixed shape, and the tag survives.
      val ptAliases = pointPlan.output.map(a => Alias(a, "graft_g_" + a.name)())
      val ivAliases = intervalPlan.output.map(a => Alias(a, "graft_g_" + a.name)())
      val ptCopy = Project(ptAliases, pointPlan)
      val ivCopy = Project(ivAliases, intervalPlan)
      val subst = AttributeMap(
        (pointPlan.output ++ intervalPlan.output).zip(
          (ptAliases ++ ivAliases).map(_.toAttribute)))
      def rw(e: Expression): Expression = e.transform {
        case a: Attribute => subst.getOrElse(a, a)
      }
      val widePlan = Filter(rw(And(ordered, Not(spanOk))), ivCopy)
      val wideHint = JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))
      val wideJoin =
        if (pointIsLeft) Join(ptCopy, widePlan, Inner, Some(rw(cond)), wideHint)
        else             Join(widePlan, ptCopy, Inner, Some(rw(cond)), wideHint)
      wideJoin.setTagValue(SkipTag, true)
      // Project the guard leg back to j.output's NAMES with fresh
      // ExprIds (Union output comes from the first child — the narrow
      // leg already exposes j.output's ids; the guard child only needs
      // positional compatibility).
      val guard = Project(
        j.output.map(a => Alias(rw(a), a.name)()), wideJoin)
      Some(Union(Seq(narrow, guard)))
    }
  }
}
