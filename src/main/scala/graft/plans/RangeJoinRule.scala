package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst optimizer rule: rewrite a point-in-interval INNER join —
  * `p JOIN i ON p.ts >= i.lo AND p.ts <= i.hi` (no equi conjunct) —
  * into the bucketed range-join shape of `graft.ops.Temporal.rangeJoin`.
  * Spark plans the raw inequality join as BroadcastNestedLoopJoin:
  * every point is tested against every interval — quadratic, and the
  * non-broadcastable case is a full cartesian. The rewrite explodes
  * each INTERVAL to the `bucketSec`-second epoch buckets it covers,
  * buckets each point once, equi-joins on the bucket id and re-applies
  * the original predicate — linear, one hash exchange, and each
  * qualifying pair meets in exactly one bucket (the point's) so no
  * dedup is needed.
  *
  * Declarative SQL/DataFrame range joins thus get the scale-safe plan
  * automatically when `graft.GraftExtensions` is installed. Matching is
  * deliberately conservative: INNER join, condition EXACTLY the two
  * range conjuncts (>= / <= in either written order), all three
  * operands TIMESTAMP, point expression referencing one side only and
  * both bounds the other. The rewritten join carries an equality
  * conjunct, so the rule never re-fires on its own output. Disable (or
  * retune) via `spark.graft.rangeJoin.bucketSec` (0 disables; default
  * 60 s — pick ≈ the median interval span).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketConf = "spark.graft.rangeJoin.bucketSec"

  private def bucketSec: Long =
    try conf.getConfString(BucketConf, "60").toLong
    catch { case _: NumberFormatException => 0L }

  /** (ts >= bound) in either written order. */
  private object GeNorm {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
  }

  /** (ts <= bound) in either written order. */
  private object LeNorm {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
  }

  private def refsWithin(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = bucketSec
    if (b <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val matched = conjuncts match {
          case Seq(c1, c2) =>
            // normalize to (ts >= lo, ts <= hi) over the same ts expr
            val pairs = Seq((c1, c2), (c2, c1)).flatMap {
              case (GeNorm(ts1, lo), LeNorm(ts2, hi)) if ts1.semanticEquals(ts2) =>
                Some((ts1, lo, hi))
              case _ => None
            }
            pairs.collectFirst {
              case (ts, lo, hi)
                  if Seq(ts, lo, hi).forall(_.dataType == TimestampType) &&
                    refsWithin(ts, l) && refsWithin(lo, r) && refsWithin(hi, r) =>
                rewrite(l, r, ts, lo, hi, cond, b, pointLeft = true)
              case (ts, lo, hi)
                  if Seq(ts, lo, hi).forall(_.dataType == TimestampType) &&
                    refsWithin(ts, r) && refsWithin(lo, l) && refsWithin(hi, l) =>
                rewrite(r, l, ts, lo, hi, cond, b, pointLeft = false)
            }
          case _ => None
        }
        matched.getOrElse(j)
    }
  }

  /** Build: Project(origOutput, Filter(cond, Join(points+bucket,
    * Generate(explode(bucket range), intervals), on bucket)))
    */
  private def rewrite(points: LogicalPlan, intervals: LogicalPlan,
      ts: Expression, lo: Expression, hi: Expression, cond: Expression,
      b: Long, pointLeft: Boolean): LogicalPlan = {
    def bucketOf(e: Expression): Expression =
      IntegralDivide(UnixSeconds(e), Literal(b))
    val pbAlias = Alias(bucketOf(ts), "__graft_pb")()
    val pSide = Project(points.output :+ pbAlias, points)
    val rbAttr = AttributeReference("__graft_rb", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
    // has already run, so the rule must set the zone itself to resolve.
    // Step stays INFERRED (not literal 1): an inverted interval (hi < lo
    // — dirty data the original nested-loop join answers with no rows)
    // must yield a descending sequence the containment filter discards,
    // not a runtime "illegal sequence boundaries" error.
    val seq = new Sequence(bucketOf(lo), bucketOf(hi), None,
      Some(conf.sessionLocalTimeZone))
    val iSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(rbAttr), intervals)
    val (left, right) = if (pointLeft) (pSide, iSide) else (iSide, pSide)
    val joined = Join(left, right, Inner,
      Some(EqualTo(pbAlias.toAttribute, rbAttr)), JoinHint.NONE)
    val origOutput =
      if (pointLeft) points.output ++ intervals.output
      else intervals.output ++ points.output
    Project(origOutput, Filter(cond, joined))
  }
}
