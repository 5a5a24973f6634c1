package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive band (interval) theta-join into a
  * bucketed equi-join.
  *
  * Pattern (either side may hold the anchor):
  * {{{
  *   a JOIN b ON ... AND b.t > a.t AND b.t <= a.t + C      -- t: bigint
  * }}}
  * Without help, Catalyst plans the band predicate as a nested-loop factor —
  * per-equi-key quadratic, or a full BNLJ when no other equi keys exist. The
  * rewrite explodes the anchor side into the two C-width buckets a match can
  * land in (`t div C`, `t div C + 1`) and adds the bucket equality
  * `bucket = other.t div C`, which ExtractEquiJoinKeys then plans as a
  * hash/sort-merge join: O(n) shuffle, band predicate kept as a post-join
  * filter — the shape that survives 100 TB.
  *
  * Every pair matches at most one of the two exploded buckets (bucket values
  * are distinct), so no duplicates are introduced, and the original
  * condition is preserved verbatim — results are exactly the naive join's.
  * A bucket-column guard keeps the rule idempotent across optimizer
  * fixpoint iterations.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private val BUCKET_COL = "__graft_band_bucket"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  /** Band bounds `bt − at ∈ [0|(0, C]` found in the conjuncts: (at, bt, C)
    * with both attributes LongType. */
  private def findBand(conjuncts: Seq[Expression])
      : Option[(Attribute, Attribute, Long)] = {
    val lowers = conjuncts.collect {
      case GreaterThan(bt: Attribute, at: Attribute) => (at, bt)
      case GreaterThanOrEqual(bt: Attribute, at: Attribute) => (at, bt)
      case LessThan(at: Attribute, bt: Attribute) => (at, bt)
      case LessThanOrEqual(at: Attribute, bt: Attribute) => (at, bt)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(bt: Attribute, Add(at: Attribute, c, _))
        if longLit(c).isDefined => (at, bt, longLit(c).get)
      case LessThanOrEqual(bt: Attribute, Add(c, at: Attribute, _))
        if longLit(c).isDefined => (at, bt, longLit(c).get)
      case LessThan(bt: Attribute, Add(at: Attribute, c, _))
        if longLit(c).isDefined => (at, bt, longLit(c).get)
      case GreaterThanOrEqual(Add(at: Attribute, c, _), bt: Attribute)
        if longLit(c).isDefined => (at, bt, longLit(c).get)
    }
    (for {
      (atL, btL) <- lowers
      (atU, btU, c) <- uppers
      if atL.semanticEquals(atU) && btL.semanticEquals(btU) && c > 0
      if atL.dataType == LongType && btL.dataType == LongType
    } yield (atL, btL, c)).headOption
  }

  private def alreadyBucketed(conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists(_.exists {
      case a: Attribute => a.name == BUCKET_COL
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjuncts(cond)
      val band = if (alreadyBucketed(conjuncts)) None else findBand(conjuncts)
      band match {
        case Some((at, bt, width))
            if (left.outputSet.contains(at) && right.outputSet.contains(bt)) ||
               (right.outputSet.contains(at) && left.outputSet.contains(bt)) =>
          val anchorOnLeft = left.outputSet.contains(at)
          val c = Literal(width, LongType)
          val bktAnchor = IntegralDivide(at, c)
          val bucketAttr = AttributeReference(BUCKET_COL, LongType,
            nullable = true)()
          def explodeSide(side: LogicalPlan): LogicalPlan = Generate(
            Explode(CreateArray(Seq(bktAnchor, Add(bktAnchor, Literal(1L))))),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(bucketAttr),
            child = side)
          val newCond = And(cond, EqualTo(bucketAttr, IntegralDivide(bt, c)))
          val newJoin =
            if (anchorOnLeft) Join(explodeSide(left), right, Inner, Some(newCond), hint)
            else Join(left, explodeSide(right), Inner, Some(newCond), hint)
          // restore the original output (drop the helper bucket column)
          Project(j.output, newJoin)
        case _ => j
      }
  }
}
