package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** RANGE-JOIN BIN REWRITE — the optimizer rule that rescues the classic
  * interval-join trap: an inner join whose ONLY join predicates are a
  * half-open range with a LITERAL width,
  *
  *   `point >= lo AND point < lo + W`
  *
  * has no equi key, so Spark plans a BroadcastNestedLoopJoin (every
  * point row tested against every interval — quadratic, and the
  * broadcast side explodes driver memory at scale). But a literal width
  * admits the standard bin decomposition: bucketize both sides to bins
  * of width W — the point keeps its single bin, the interval overlaps
  * at most TWO bins (`lo div W .. (lo+W-1) div W`, a ≤2-row map-side
  * explode) — and the join becomes a plain hash equi-join on the bin
  * key with the original range predicates as residual filters. Each
  * qualifying pair matches on exactly one bin (the point's), so no
  * dedup is needed and results are identical, including null semantics
  * (a null endpoint nulls the bin → the equi key never matches, just as
  * the range predicate never held).
  *
  * TWO independent literal-width ranges (the 2D bbox-overlap / spatial
  * grid join) compose into one COMPOSITE bin key: the point side gets a
  * bin per dimension, the interval side one ≤2-row explode per
  * dimension (≤4 rows for 2D), and selectivity multiplies across
  * dimensions — the hand-written `cs_region_join` grid decomposition,
  * fired automatically.
  *
  * This is the rewrite every warehouse does for bounded range joins
  * (e.g. the Databricks range-join optimization, there driven by a
  * hint); here the literal width makes it safe to fire automatically.
  * The rule only fires when NO usable equi predicate exists (hash
  * strategies already win otherwise) and both endpoints are integral,
  * and it never re-fires on its own output (the rewritten join HAS an
  * equi key). Registered via `GraftExtensions` (`injectOptimizerRule`),
  * so it runs inside the operator-optimization batch and the emitted
  * Project/Generate/Join get pruned and pushed like hand-written ones.
  *
  * Disable with `spark.graft.rangeBinJoin.enabled=false`.
  */
object RangeBinJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** `x + literal` (either operand order), literal as Long. */
  private object PlusLit {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case a: Add => (a.left, a.right) match {
        case (x, Literal(v: Long, LongType)) => Some((x, v))
        case (x, Literal(v: Int, IntegerType)) => Some((x, v.toLong))
        case (Literal(v: Long, LongType), x) => Some((x, v))
        case (Literal(v: Int, IntegerType), x) => Some((x, v.toLong))
        case _ => None
      }
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Extract every (point, lo, width) triple whose conjuncts form the
    * half-open literal-width range shape — one per independent dimension
    * (the 2D bbox-overlap join contributes two).
    */
  private def extractRanges(conjuncts: Seq[Expression])
      : Seq[(Expression, Expression, Long)] = {
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case LessThanOrEqual(b, a) => (a, b)
    }
    val all = for {
      (a, b) <- lowers
      (a2, b2, w) <- conjuncts.collect {
        case LessThan(a, PlusLit(b, w)) => (a, b, w)
        case GreaterThan(PlusLit(b, w), a) => (a, b, w)
        case LessThanOrEqual(a, PlusLit(b, w)) => (a, b, w + 1)
        case GreaterThanOrEqual(PlusLit(b, w), a) => (a, b, w + 1)
      }
      if w > 0 && a.semanticEquals(a2) && b.semanticEquals(b2) &&
        integral(a) && integral(b) && a.deterministic && b.deterministic
    } yield (a, b, w)
    // one range per (point, start) pair; a repeated pair adds no key
    all.groupBy { case (a, b, _) => (a.canonicalized, b.canonicalized) }
      .map(_._2.head).toSeq
  }

  private def evaluable(e: Expression, p: LogicalPlan): Boolean =
    e.references.subsetOf(p.outputSet)

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.rangeBinJoin.enabled", "true") != "true")
      return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == JoinHint.NONE =>
        val conjuncts = splitConjunctivePredicates(cond)
        // a usable equi key means hash strategies already apply — skip
        val hasEqui = conjuncts.exists {
          case EqualTo(l, r) =>
            (evaluable(l, left) && evaluable(r, right)) ||
              (evaluable(l, right) && evaluable(r, left))
          case _ => false
        }
        val ranges = if (hasEqui) Nil else extractRanges(conjuncts)
        // orient: which side holds the points, which the interval starts;
        // up to TWO consistently-oriented dimensions become the composite
        // bin key (the 2D bbox-overlap case) — each extra dimension costs
        // a ≤2-row interval explode and multiplies key selectivity
        val dimsL = ranges.filter { case (a, b, _) =>
          evaluable(a, left) && evaluable(b, right) }
        val dimsR = ranges.filter { case (a, b, _) =>
          evaluable(a, right) && evaluable(b, left) }
        val (dims, pointPlan, intervalPlan, swapped) =
          if (dimsL.size >= dimsR.size) (dimsL.take(2), left, right, false)
          else (dimsR.take(2), right, left, true)
        if (dims.isEmpty) j
        else {
          val pBins = dims.zipWithIndex.map { case ((a, _, w), i) =>
            Alias(IntegralDivide(asLong(a), Literal(w)), s"__graft_bin_p$i")()
          }
          val pointProj = Project(pointPlan.output ++ pBins, pointPlan)
          // chained Generates: one ≤2-row explode per dimension
          var genNode: LogicalPlan = intervalPlan
          val binAttrs = dims.zipWithIndex.map { case ((_, b, w), i) =>
            val wLit = Literal(w)
            val lo = IntegralDivide(asLong(b), wLit)
            val hi = IntegralDivide(Add(asLong(b), Literal(w - 1)), wLit)
            val binAttr = AttributeReference(s"__graft_bin_i$i", LongType)()
            // timeZoneId explicit: ResolveTimeZone ran at analysis, so a
            // rule-built TimeZoneAwareExpression must fill it itself
            genNode = Generate(
              Explode(Sequence(lo, hi, None, Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = genNode)
            binAttr
          }
          val eq = pBins.zip(binAttrs)
            .map { case (p, i) => EqualTo(p.toAttribute, i): Expression }
            .reduce(And)
          val (nl, nr) =
            if (swapped) (genNode, pointProj: LogicalPlan)
            else (pointProj: LogicalPlan, genNode)
          Project(j.output,
            Join(nl, nr, Inner, Some(And(eq, cond)), JoinHint.NONE))
        }
    }
  }
}
