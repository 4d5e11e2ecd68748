package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, Generate, HintInfo, Join, JoinHint, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Idempotence marker for [[BinnedRangeJoinRewrite]]'s theta union
  * branch: an always-true conjunct that is deliberately NON-foldable,
  * so ConstantFolding/BooleanSimplification (which run in the same
  * operator-optimization fixed-point batch as injected rules) cannot
  * erase it — erasing it would let the rule re-match its own output
  * and duplicate rows on every iteration.
  *
  * It deliberately CARRIES the point and interval-bound attributes as
  * children (their values are ignored — eval is constant true): a
  * reference-free conjunct is pushable, and PushDownPredicates would
  * hoist it out of the join condition into a Filter below — or, when
  * the theta branch sits above a previous rewrite's Union, THROUGH
  * the union — where no shape-local veto can reliably find it, and
  * the rule would re-match its own output every optimizer iteration
  * until maxIterations. With one reference on each join side the
  * conjunct is not evaluable on either child, so it is pinned in the
  * join condition for the rule's veto to see; both attributes already
  * appear in the surviving range conjuncts, so no extra columns are
  * retained.
  */
case class BinnedRewriteGuard(pointAttr: Expression,
    boundAttr: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(pointAttr, boundAttr)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pointAttr = newChildren(0), boundAttr = newChildren(1))
}

/** Catalyst optimizer rule that rewrites a point-in-interval THETA
  * join into a bin-keyed EQUI join — the planner-automatic face of
  * [[graft.operators.RangeJoin.binnedIntervalJoin]] (and the second
  * graft optimizer rule beside [[PropagateLimitToGraft]], following
  * the reference's extraOptimizations installation seam, reference
  * README.md:15,36):
  *
  *  - match an INNER join whose condition conjuncts contain
  *    `p >= lo AND p < hi` with `p` a numeric attribute of one side
  *    and `lo`/`hi` numeric attributes of the other (any further
  *    conjuncts — equi keys, single-side predicates — ride along
  *    unchanged);
  *  - add `floor(x / width)` bin columns: one per point, an exploded
  *    `sequence(bin(lo), bin(hi))` per interval (intervals with
  *    `lo > hi` are filtered first — `sequence` would otherwise count
  *    DOWN and fabricate bins);
  *  - conjoin `pointBin = intervalBin`: the planner now extracts a
  *    hash-partitionable equi key, so two large sides plan a
  *    shuffled join instead of a broadcast-nested-loop that dies when
  *    the interval side outgrows a broadcast. The original range
  *    conjuncts stay in the condition as the exact residual; a
  *    qualifying pair meets in exactly ONE bin (the point's), so the
  *    rewrite is result-invisible — no duplicates, no losses.
  *
  * Width: `spark.graft.binnedRangeJoin.width` when set to a positive
  * value (the profitable width is data-dependent — near the median
  * interval length; a broadcastable interval side is usually better
  * served by the plain theta join). When the conf is UNSET, the rule
  * derives the width from CBO histogram column stats of the interval
  * side's bound attributes (`median(hi) − median(lo)` ≈ the median
  * interval length, the classic tuning target): tables analyzed with
  * `spark.sql.statistics.histogram.enabled=true` get the rewrite with
  * zero hand-tuning, tables without histograms keep the plain theta
  * plan (never a guessed width). Disable the stats path with
  * `spark.graft.binnedRangeJoin.autoWidth=false`.
  *
  * Non-finite float/double BOUNDS are unsafe to bin: Spark orders NaN
  * above every double, so `p < hi` is TRUE for every non-NaN p when
  * hi is NaN — yet `Cast(Floor(NaN/w), Long)` yields bin 0 (NOT
  * NULL), so the explode would never reach the point's bin and the
  * match would be silently lost; `±Infinity` bounds bin to
  * `Long.Max/MinValue` and the sequence blows up. When the bound
  * attributes are float/double typed, the rewrite therefore splits
  * the interval side: finite-bound rows take the bin path, rows with
  * any NaN/±Inf bound ride a plain theta-join union branch carrying
  * the exact original condition (plus a non-foldable
  * [[BinnedRewriteGuard]] conjunct so the rule does not re-match that
  * branch). NULL bounds are dropped by both branch filters and would
  * match nothing in the theta join anyway. Integral bounds skip the
  * split — no non-finite values exist.
  */
object BinnedRangeJoinRewrite extends Rule[LogicalPlan]
    with PredicateHelper {

  val WidthConf = "spark.graft.binnedRangeJoin.width"
  val AutoWidthConf = "spark.graft.binnedRangeJoin.autoWidth"
  private val BinName = "_graft_bin"

  private def width: Double = scala.util.Try(
    SQLConf.get.getConfString(WidthConf, "0").toDouble).getOrElse(0.0)

  private def autoWidth: Boolean = scala.util.Try(
    SQLConf.get.getConfString(AutoWidthConf, "true").toBoolean)
    .getOrElse(true)

  /** Median of an equi-height histogram: each bin holds `height` rows,
    * so the middle bin's range brackets the median — its lower bound
    * is within one bin-height of the true value, plenty for a bin
    * WIDTH heuristic. */
  private def histMedian(
      h: org.apache.spark.sql.catalyst.plans.logical.Histogram)
      : Option[Double] =
    if (h.bins.isEmpty) None
    else {
      val m = h.bins(h.bins.length / 2).lo
      if (java.lang.Double.isFinite(m)) Some(m) else None
    }

  /** Stats-derived default bin width: `median(hi) − median(lo)` over
    * the interval child's CBO histograms. The median interval length
    * keeps the per-interval explode factor ≈ 2 whatever the length
    * distribution's tail does — the same target a hand-set width aims
    * for. None (= do not rewrite) when either histogram is absent or
    * the estimate is non-positive (crossed medians say the pattern's
    * `lo <= hi` rows are atypical — no safe guess). */
  private def statsWidth(iv: LogicalPlan, lo: Attribute, hi: Attribute)
      : Option[Double] = scala.util.Try {
    val st = iv.stats.attributeStats
    for {
      loStat <- st.get(lo)
      hiStat <- st.get(hi)
      loHist <- loStat.histogram
      hiHist <- hiStat.histogram
      loMed <- histMedian(loHist)
      hiMed <- histMedian(hiHist)
      w = hiMed - loMed
      if w > 0 && java.lang.Double.isFinite(w)
    } yield w
  }.toOption.flatten

  private def numericAttr(e: Expression): Option[AttributeReference] =
    e match {
      case a: AttributeReference => a.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType => Some(a)
        case _ => None
      }
      case _ => None
    }

  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  /** Does a previous rewrite's guard sit in this join's own fringe —
    * its condition, or a Project/Filter chain directly between the
    * join and its children? Predicate pushdown can only migrate the
    * (reference-free) guard conjunct into such a chain; scanning the
    * WHOLE subtree instead would also veto an unrelated second range
    * join stacked above a rewritten join's union output (a missed
    * optimization the old conservative scan accepted). The scan stops
    * at the first non-Project/Filter node: the theta branch's guard
    * can never sink below one. */
  private def guardInFringe(p: LogicalPlan): Boolean = {
    def hasGuard(e: Expression): Boolean =
      e.exists(_.isInstanceOf[BinnedRewriteGuard])
    p match {
      case f: Filter => hasGuard(f.condition) || guardInFringe(f.child)
      case pr: Project =>
        pr.projectList.exists(hasGuard) || guardInFringe(pr.child)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confW = width
    if (confW <= 0 && !autoWidth) return plan
    plan.transformDown {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjs = splitConjunctivePredicates(cond)
        // idempotence: a bin equality means this join was already
        // rewritten (the range conjuncts it kept would re-match); a
        // BinnedRewriteGuard in this join's condition or pushed into
        // a Project/Filter chain directly below means this IS the
        // theta union branch of a previous rewrite
        val rewritten = conjs.exists {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            a.name == BinName || b.name == BinName
          case _ => false
        } || conjs.exists(_.exists(_.isInstanceOf[BinnedRewriteGuard])) ||
          guardInFringe(left) || guardInFringe(right)
        if (rewritten) j
        else {
          // p >= lo (either spelling), p and lo on opposite sides
          def sideOf(a: Attribute): Option[Boolean] =
            if (left.outputSet.contains(a)) Some(true)
            else if (right.outputSet.contains(a)) Some(false)
            else None
          val geCands = conjs.flatMap {
            case GreaterThanOrEqual(p, lo) =>
              for (pa <- numericAttr(p); la <- numericAttr(lo))
                yield (pa, la)
            case LessThanOrEqual(lo, p) =>
              for (pa <- numericAttr(p); la <- numericAttr(lo))
                yield (pa, la)
            case _ => None
          }
          val ltCands = conjs.flatMap {
            case LessThan(p, hi) =>
              for (pa <- numericAttr(p); ha <- numericAttr(hi))
                yield (pa, ha)
            case GreaterThan(hi, p) =>
              for (pa <- numericAttr(p); ha <- numericAttr(hi))
                yield (pa, ha)
            case _ => None
          }
          val pattern = geCands.flatMap { case (p, lo) =>
            ltCands.collectFirst {
              case (p2, hi) if p2.semanticEquals(p) &&
                  sideOf(p).isDefined && sideOf(lo).isDefined &&
                  sideOf(hi).isDefined &&
                  sideOf(lo) == sideOf(hi) &&
                  sideOf(p) != sideOf(lo) =>
                (p, lo, hi, sideOf(p).get)
            }
          }.headOption
          pattern match {
            case None => j
            case Some((p, lo, hi, pOnLeft)) =>
              val (pointChild, ivChild) =
                if (pOnLeft) (left, right) else (right, left)
              // width: the explicit conf wins; otherwise histogram
              // stats of the interval side, else leave the plan alone
              val w = if (confW > 0) confW
                else statsWidth(ivChild, lo, hi).getOrElse(0.0)
              if (w <= 0) j else {
              val fractionalBounds = Seq(lo, hi).exists(_.dataType match {
                case FloatType | DoubleType => true
                case _ => false
              })
              def finiteE(a: Expression): Expression = {
                val d = Cast(a, DoubleType)
                And(Not(IsNaN(d)), And(
                  Not(EqualTo(d, Literal(Double.PositiveInfinity))),
                  Not(EqualTo(d, Literal(Double.NegativeInfinity)))))
              }
              val pAlias = Alias(binOf(p, w), BinName)()
              val pointPlan =
                Project(pointChild.output :+ pAlias, pointChild)
              val genOut =
                AttributeReference(BinName, LongType,
                  nullable = false)()
              val ivBase =
                if (fractionalBounds)
                  Filter(And(finiteE(lo), finiteE(hi)), ivChild)
                else ivChild
              // Sequence is TimeZoneAwareExpression: it resolves only
              // with a timezone pinned, even over BIGINT bounds
              val ivPlan = Generate(
                Explode(Sequence(binOf(lo, w), binOf(hi, w), None,
                  Some(SQLConf.get.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false,
                qualifier = None, generatorOutput = Seq(genOut),
                child = Filter(LessThanOrEqual(lo, hi), ivBase))
              val newCond =
                And(cond, EqualTo(pAlias.toAttribute, genOut))
              val (nl, nr) =
                if (pOnLeft) (pointPlan, ivPlan)
                else (ivPlan, pointPlan)
              val binned = Project(j.output,
                Join(nl, nr, Inner, Some(newCond), hint))
              if (!fractionalBounds) binned
              else {
                // NaN/±Inf-bound rows: exact theta semantics on the
                // (rare) non-finite slice — a union branch, not a
                // plan-wide fallback
                val nfIv = Filter(
                  Not(And(finiteE(lo), finiteE(hi))), ivChild)
                val (tl, tr) =
                  if (pOnLeft) (pointChild, nfIv)
                  else (nfIv, pointChild)
                // broadcast-PIN the non-finite slice: it is rare by
                // contract, and this rule runs after
                // EliminateResolvedHint, so the hint goes on the Join
                // node itself. A malformed-heavy interval table must
                // degrade to a broadcast nested loop, never a shuffled
                // one (and never a cartesian)
                val bc = Some(HintInfo(strategy = Some(BROADCAST)))
                val thetaHint =
                  if (pOnLeft) JoinHint(hint.leftHint, bc)
                  else JoinHint(bc, hint.rightHint)
                val theta = Project(j.output, Join(tl, tr, Inner,
                  Some(And(cond, BinnedRewriteGuard(p, lo))),
                  thetaHint))
                Union(Seq(binned, theta))
              }
              }
          }
        }
    }
  }
}
