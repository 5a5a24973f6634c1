package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive interval-OVERLAP theta-join into the
  * banded equi-join of `graft.operators.IntervalJoin` — so a user who
  * writes the natural SQL
  * {{{
  *   a JOIN b ON ... AND a.s <= b.e AND b.s <= a.e    -- s/e: bigint
  * }}}
  * gets the scale plan instead of a per-equi-key quadratic (or full
  * BNLJ) nested-loop factor. Companion to [[BandJoinRewrite]] (which
  * handles the `bt − at ∈ (0, C]` band pattern; THIS handles the
  * two-sided overlap pattern, where no constant bound appears in the
  * predicate at all).
  *
  * Both sides explode to the width-W bands their interval touches
  * (`sequence(s div W, e div W)`), the join gains the band equality, and
  * the later-start-band conjunct `band = greatest(a.s, b.s) div W` makes
  * each overlapping pair surface EXACTLY once (that band lies inside
  * both intervals' spans — see IntervalJoin for the argument; it holds
  * for any W, even for degenerate s > e rows, because `floor(max_start/W)`
  * is bounded by both conjuncts of the original predicate). The original
  * condition is preserved verbatim as a post-join filter, so results are
  * exactly the naive join's; null starts/ends produce no bands and no
  * naive matches alike.
  *
  * OPT-IN: active only when `spark.graft.interval.bandWidth` is set > 0.
  * Unlike BandJoinRewrite's pattern, the predicate carries no length
  * bound, so W cannot be inferred — the user asserts the typical
  * interval length (fan-out per row is len/W + 1; correctness never
  * depends on the choice). Off by default so hand-banded plans (q155,
  * IntervalJoin itself) are never double-exploded.
  *
  * FAN-OUT GUARD: the pattern is purely structural — any pair of
  * opposite-direction `≤` conjuncts between Long attributes matches, so
  * a non-interval join (`a.qty <= b.cap AND b.floor <= a.budget`) can be
  * rebanded with "interval endpoints" arbitrarily far apart, silently
  * exploding each row into |span|/W bands. Every generated sequence is
  * therefore wrapped in a runtime check against
  * `spark.graft.interval.maxFanout` (default 1024): a row whose interval
  * spans more bands RAISES a descriptive error instead of expanding —
  * a wrong plan must fail loudly, never quietly multiply rows. Genuine
  * long intervals raise the width or the cap.
  */
object IntervalOverlapRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.interval.bandWidth"
  val MaxFanoutConf = "spark.graft.interval.maxFanout"
  private val BAND_COL = "__graft_interval_band"

  /** Conf parse with a descriptive failure: a non-numeric value must name
    * the conf key and the offending string, not surface as a raw
    * NumberFormatException from inside an optimizer rule. */
  private def longConf(key: String, raw: String): Long =
    try raw.trim.toLong
    catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$key must be a long, got '$raw'")
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def alreadyBanded(conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists(_.exists {
      case a: Attribute => a.name == BAND_COL
      case _ => false
    })

  /** The overlap pattern: conjuncts (ls ≤ re) and (rs ≤ le) with ls, le
    * from one side and rs, re from the other, all LongType. Returns
    * (leftStart, leftEnd, rightStart, rightEnd). */
  private def findOverlap(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Attribute)] = {
    val les = conjuncts.collect {
      case LessThanOrEqual(x: Attribute, y: Attribute)
        if x.dataType == LongType && y.dataType == LongType => (x, y)
      case GreaterThanOrEqual(y: Attribute, x: Attribute)
        if x.dataType == LongType && y.dataType == LongType => (x, y)
    }
    val fromL = les.filter { case (x, y) =>
      left.outputSet.contains(x) && right.outputSet.contains(y) }
    val fromR = les.filter { case (x, y) =>
      right.outputSet.contains(x) && left.outputSet.contains(y) }
    (for {
      (ls, re) <- fromL // leftStart <= rightEnd
      (rs, le) <- fromR // rightStart <= leftEnd
      if !ls.semanticEquals(le) && !rs.semanticEquals(re)
    } yield (ls, le, rs, re)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = longConf(WidthConf, conf.getConfString(WidthConf, "0"))
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjuncts(cond)
        val pat =
          if (alreadyBanded(conjuncts)) None
          else findOverlap(conjuncts, left, right)
        pat match {
          case Some((ls, le, rs, re)) =>
            val w = Literal(width, LongType)
            val maxFanout = longConf(MaxFanoutConf,
              conf.getConfString(MaxFanoutConf, "1024"))
            // timeZoneId set explicitly: analysis's ResolveTimeZone already
            // ran, and a TimeZoneAwareExpression without it never resolves.
            // The sequence is guarded: a row spanning more than maxFanout
            // bands raises instead of silently multiplying (see scaladoc)
            def bands(s: Attribute, e: Expression): Expression = {
              val lo = IntegralDivide(s, w)
              val hi = IntegralDivide(e, w)
              val seq = Sequence(lo, hi, None,
                Some(conf.sessionLocalTimeZone))
              val tooWide =
                GreaterThan(Subtract(hi, lo), Literal(maxFanout, LongType))
              If(tooWide,
                Cast(new RaiseError(Literal(
                  s"IntervalOverlapRewrite: a row's interval spans more " +
                    s"than $MaxFanoutConf=$maxFanout bands at " +
                    s"$WidthConf=$width; raise the band width or the " +
                    "fan-out cap, or disable the rewrite")), seq.dataType),
                seq)
            }
            def explodeSide(side: LogicalPlan, s: Attribute, e: Attribute,
                out: AttributeReference): LogicalPlan = Generate(
              Explode(bands(s, e)),
              unrequiredChildIndex = Nil,
              outer = false,
              qualifier = None,
              generatorOutput = Seq(out),
              child = side)
            val bandL = AttributeReference(BAND_COL, LongType, nullable = true)()
            val bandR = AttributeReference(BAND_COL, LongType, nullable = true)()
            val laterStart = IntegralDivide(Greatest(Seq(ls, rs)), w)
            val newCond = And(And(cond, EqualTo(bandL, bandR)),
              EqualTo(bandL, laterStart))
            val newJoin = Join(
              explodeSide(left, ls, le, bandL),
              explodeSide(right, rs, re, bandR),
              Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }
}
