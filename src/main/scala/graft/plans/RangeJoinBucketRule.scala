package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a pure range-condition inner join —
  * `point BETWEEN lo AND hi` with no equi conjunct — into the bucketized
  * equi-join of `graft.ops.Scale.rangeJoin`, automatically.
  *
  * Spark plans a join whose condition has no equality as a
  * BroadcastNestedLoopJoin (or cartesian product): every point row is
  * tested against every interval row — quadratic, the classic 100 TB
  * scale-killer. With a bucket width configured
  * (`spark.graft.rangeJoin.bucketWidth`, in the key's own units; 0 =
  * rule disabled), each interval explodes into the fixed-width buckets
  * it overlaps and each point probes exactly its own bucket, so the join
  * becomes a plain hash equi-join on the bucket id; the ORIGINAL range
  * condition is kept as a post-filter, so the rewrite is correct for any
  * inputs:
  *
  *  - a true match's point bucket always lies in the interval's exploded
  *    bucket range (truncating division is monotone), so no match is lost;
  *  - a point meets an interval in at most its own single bucket, so no
  *    duplicates are introduced and no dedup is needed;
  *  - NULL keys produce a NULL bucket / NULL bucket array and drop out of
  *    the inner equi-join, exactly as the original condition (NULL
  *    comparison) dropped them;
  *  - the filter discards any false positives inside a shared bucket.
  *
  * Scope is deliberately narrow: inner joins whose condition is EXACTLY a
  * conjunction of one lower and one upper bound between integral-typed
  * expressions, each referencing only one side. Anything else — extra
  * conjuncts, equi keys (which make the join hashable already), floating
  * point, non-inner joins — is left untouched. The rewrite inserts an
  * equality conjunct, so the rule cannot match its own output
  * (idempotent under the optimizer's fixed point).
  *
  * Pick the width near the typical interval span: shuffle volume is
  * points + intervals × (span/width + 1). Inverted (lo > hi) and
  * NULL-bounded intervals — which match nothing — generate zero buckets
  * rather than a runaway sequence. Open-ended sentinel encodings
  * (hi = Long.MaxValue for "no expiry") would still explode into
  * span/width buckets: clamp such sentinels to the data's real horizon
  * before joining, exactly as you would before any bucketized index.
  */
object RangeJoinBucketRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
    else None

  /** Match a two-conjunct band: ts >= lo && ts <= hi with ts from one
    * side, lo/hi from the other. Returns (ts, lo, hi, pointOnLeft). */
  private def matchBand(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    // normalize both conjuncts to (big >= small)
    val ineqs = conjuncts.map {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
    (ineqs(0), ineqs(1)) match {
      case (Some((big1, small1)), Some((big2, small2))) =>
        // candidate 1: ts = big1 = small2 (ts >= lo, hi >= ts)
        val c1 = for {
          s1 <- sideOf(big1, left, right); s2 <- sideOf(small1, left, right)
          s3 <- sideOf(big2, left, right); s4 <- sideOf(small2, left, right)
          if s1 != s2 && s3 != s4 && s1 == s4 && s2 == s3 &&
            big1.semanticEquals(small2)
        } yield (big1, small1, big2, s1)
        // candidate 2: ts = big2 = small1 (hi >= ts from c1's view swapped)
        val c2 = for {
          s1 <- sideOf(big1, left, right); s2 <- sideOf(small1, left, right)
          s3 <- sideOf(big2, left, right); s4 <- sideOf(small2, left, right)
          if s1 != s2 && s3 != s4 && s2 == s3 && s1 == s4 &&
            big2.semanticEquals(small1)
        } yield (big2, small2, big1, s3)
        c1.orElse(c2)
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean = (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }) && e.deterministic

  private def bkt(e: Expression, width: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(width))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // parse defensively: this runs inside the optimizer, so a malformed
    // conf value must DISABLE the rule, not fail every query on the
    // session with a NumberFormatException
    val width = conf.getConfString(WidthConf, "0").toLongOption.getOrElse(0L)
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        matchBand(cond, left, right) match {
          case Some((ts, lo, hi, pointOnLeft))
              if integral(ts) && integral(lo) && integral(hi) =>
            val pointPlan = if (pointOnLeft) left else right
            val intervalPlan = if (pointOnLeft) right else left
            val pAlias = Alias(bkt(ts, width), "_g_pbkt")()
            val newPoint = Project(pointPlan.output :+ pAlias, pointPlan)
            val iBkt = AttributeReference("_g_ibkt", LongType, nullable = false)()
            // guard: an inverted interval (lo > hi) satisfies the original
            // predicate for no point, but Sequence would auto-step -1 and
            // materialize the DESCENDING bucket range — for a sentinel like
            // (10^12, 0) that's a runtime array-size blowup where the
            // original plan just returned nothing. Emit an empty bucket
            // array instead (also taken when either bound is NULL, which
            // the original NULL-comparison likewise never matched).
            val loB = bkt(lo, width)
            val hiB = bkt(hi, width)
            val buckets = If(LessThanOrEqual(loB, hiB),
              Sequence(loB, hiB, None, Some(conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
            val gen = Generate(Explode(buckets),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(iBkt), child = intervalPlan)
            val eq = EqualTo(pAlias.toAttribute, iBkt)
            val (nl, nr) = if (pointOnLeft) (newPoint, gen) else (gen, newPoint)
            Project(j.output, Join(nl, nr, Inner, Some(And(eq, cond)), hint))
          case _ => j
        }
    }
  }
}
