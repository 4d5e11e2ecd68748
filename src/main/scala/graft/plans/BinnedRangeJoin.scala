package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

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
  * OPT-IN: fires only when `spark.graft.binnedRangeJoin.width` is a
  * positive bin width (the profitable width is data-dependent — near
  * the median interval length; a broadcastable interval side is
  * usually better served by the plain theta join). NaN/NULL bounds
  * bin to NULL and match nothing, exactly like the theta
  * comparisons they came from.
  */
object BinnedRangeJoinRewrite extends Rule[LogicalPlan]
    with PredicateHelper {

  val WidthConf = "spark.graft.binnedRangeJoin.width"
  private val BinName = "_graft_bin"

  private def width: Double = scala.util.Try(
    SQLConf.get.getConfString(WidthConf, "0").toDouble).getOrElse(0.0)

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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformDown {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjs = splitConjunctivePredicates(cond)
        // idempotence: a bin equality means this join was already
        // rewritten (the range conjuncts it kept would re-match)
        val rewritten = conjs.exists {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            a.name == BinName || b.name == BinName
          case _ => false
        }
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
              val pAlias = Alias(binOf(p, w), BinName)()
              val pointPlan =
                Project(pointChild.output :+ pAlias, pointChild)
              val genOut =
                AttributeReference(BinName, LongType,
                  nullable = false)()
              // Sequence is TimeZoneAwareExpression: it resolves only
              // with a timezone pinned, even over BIGINT bounds
              val ivPlan = Generate(
                Explode(Sequence(binOf(lo, w), binOf(hi, w), None,
                  Some(SQLConf.get.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false,
                qualifier = None, generatorOutput = Seq(genOut),
                child = Filter(LessThanOrEqual(lo, hi), ivChild))
              val newCond =
                And(cond, EqualTo(pAlias.toAttribute, genOut))
              val (nl, nr) =
                if (pOnLeft) (pointPlan, ivPlan)
                else (ivPlan, pointPlan)
              Project(j.output, Join(nl, nr, Inner, Some(newCond),
                hint))
          }
        }
    }
  }
}
