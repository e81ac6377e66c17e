package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the naive point-in-interval join
  *
  *   probe JOIN build ON probe.k = build.k
  *     AND build.t >= probe.t - W AND build.t < probe.t     -- W literal > 0
  *
  * into the bucketized equi-join `RelationalOps.joinRangeBucketed`
  * hand-writes: without an equi time key Spark can only plan the range
  * conjuncts as a post-filter on the k-join — correct, but one hot k
  * (or no k at all) degenerates to nested-loop work. The rewrite gives
  * both sides an equal-width bucket key (bucket START, `t - pmod(t, W)` —
  * floor semantics for any sign of t, no division), explodes the probe to
  * the only two buckets its interval can touch, joins on (k…, bucket),
  * and keeps the original range conjuncts as the exact filter. Every
  * matching pair survives exactly once: the build row has ONE bucket and
  * the probe's two candidates are distinct.
  *
  * Scope (soundness before reach): INNER joins only — outer variants
  * would emit one null-extended row per unmatched probe COPY (two, after
  * the explode) and need dedup; both bounds may be strict or inclusive
  * (an inclusive span of W+1 consecutive longs still fits 2 width-W
  * buckets for W ≥ 1); `t` attributes must be LongType (epoch micros —
  * the engine's time representation); W must fold to a positive integral
  * literal. Like [[graft.functions.RewriteDotProduct]], users keep
  * writing the portable naive form; the plan gets the scale shape.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] {

  private val BktProbe = "__graft_range_bkt_p"
  private val BktBuild = "__graft_range_bkt_b"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  /** build.t >= probe.t - W (either operand order, >= or >). */
  private def asLower(e: Expression)
      : Option[(AttributeReference, AttributeReference, Long)] = e match {
    case GreaterThanOrEqual(bt: AttributeReference, Subtract(pt: AttributeReference, w, _)) =>
      longLit(w).map((bt, pt, _))
    case GreaterThan(bt: AttributeReference, Subtract(pt: AttributeReference, w, _)) =>
      longLit(w).map((bt, pt, _))
    case LessThanOrEqual(Subtract(pt: AttributeReference, w, _), bt: AttributeReference) =>
      longLit(w).map((bt, pt, _))
    case LessThan(Subtract(pt: AttributeReference, w, _), bt: AttributeReference) =>
      longLit(w).map((bt, pt, _))
    case _ => None
  }

  /** build.t < probe.t (either operand order, < or <=). */
  private def asUpper(e: Expression)
      : Option[(AttributeReference, AttributeReference)] = e match {
    case LessThan(bt: AttributeReference, pt: AttributeReference) => Some((bt, pt))
    case LessThanOrEqual(bt: AttributeReference, pt: AttributeReference) => Some((bt, pt))
    case GreaterThan(pt: AttributeReference, bt: AttributeReference) => Some((bt, pt))
    case GreaterThanOrEqual(pt: AttributeReference, bt: AttributeReference) => Some((bt, pt))
    case _ => None
  }

  /** Bucket START of t for width w: t - pmod(t, w) — floor-aligned for
    * negative t too, and pure +/-/mod arithmetic.
    */
  private def bucketOf(t: Expression, w: Long): Expression =
    Subtract(t, Pmod(t, Literal(w)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // fixpoint guard: never rewrite our own output
        if !j.children.exists(_.output.exists(_.name.startsWith("__graft_range_bkt"))) =>
      val cs = conjuncts(cond)
      val candidate = (for {
        lowC <- cs; (ltLo, ptLo, w) <- asLower(lowC).toSeq
        upC <- cs; (ltUp, ptUp) <- asUpper(upC).toSeq
        if ltLo.exprId == ltUp.exprId && ptLo.exprId == ptUp.exprId && w > 0
      } yield (ptLo, ltLo, w)).headOption

      candidate match {
        case Some((pt, bt, w))
            if left.outputSet.contains(pt) && right.outputSet.contains(bt) &&
              pt.dataType == LongType && bt.dataType == LongType =>
          rewrite(j, left, right, pt, bt, w, cond, hint, flipped = false)
        case _ =>
          candidate match {
            case Some((pt, bt, w))
                if right.outputSet.contains(pt) && left.outputSet.contains(bt) &&
                  pt.dataType == LongType && bt.dataType == LongType =>
              rewrite(j, right, left, pt, bt, w, cond, hint, flipped = true)
            case _ => j
          }
      }
  }

  /** probe holds pt (the interval end), build holds bt (the point). */
  private def rewrite(
      j: Join, probe: LogicalPlan, build: LogicalPlan,
      pt: AttributeReference, bt: AttributeReference, w: Long,
      cond: Expression, hint: JoinHint, flipped: Boolean): LogicalPlan = {
    val pBkt = AttributeReference(BktProbe, LongType, nullable = true)()
    val b = bucketOf(pt, w)
    val gen = Generate(
      Explode(CreateArray(Seq(b, Subtract(b, Literal(w))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(pBkt), child = probe)
    val bBktAlias = Alias(bucketOf(bt, w), BktBuild)()
    val proj = Project(build.output :+ bBktAlias, build)
    val newCond = And(cond, EqualTo(pBkt, bBktAlias.toAttribute))
    val newJoin =
      if (flipped) Join(proj, gen, Inner, Some(newCond), hint)
      else Join(gen, proj, Inner, Some(newCond), hint)
    Project(j.output, newJoin)
  }
}
