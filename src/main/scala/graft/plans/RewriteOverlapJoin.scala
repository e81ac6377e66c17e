package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the naive interval-OVERLAP join
  *
  *   a JOIN b ON [k-equality ...] AND a.s <= b.e AND b.s <= a.e
  *
  * (any operand order / direction; strict or inclusive bounds) into the
  * bucketized equi-join `RelationalOps.overlapPairsBucketed` hand-writes.
  * This is the interval×interval generalization of [[RewriteRangeJoin]]'s
  * point-in-interval shape: without an equi bucket key Spark plans the two
  * range conjuncts as a post-filter on the k-join (nested-loop work per hot
  * key, or a full BroadcastNestedLoopJoin when there is no k at all).
  *
  * Technique: with bucket width W (a conf, [[WidthKey]] — unlike the range
  * rule there is no literal in the condition to derive it from), each side
  * explodes to the width-W bucket STARTS its interval covers
  * (`sequence(bucket(lo), bucket(hi), W)` — arbitrary interval lengths, not
  * just ≤ W), the join gains the bucket-equality key, and the original
  * conjuncts remain as the exact filter. Exactly-once survival is
  * structural: a matching pair is kept only in the bucket containing
  * `greatest(a.s, b.s)` — a point that (given the overlap conjuncts) lies
  * in both intervals, so its bucket appears in both sides' coverage
  * exactly once.
  *
  * Soundness corners:
  *  - INVERTED intervals (s > e): the naive predicate is still satisfiable
  *    (`a.s <= b.e AND b.s <= a.e` does not require s <= e), so coverage
  *    enumerates `least(s,e) .. greatest(s,e)` — the envelope. Whenever
  *    the original predicate holds, greatest(a.s, b.s) provably lands in
  *    both envelopes (if it is b.s, then b.s <= a.e <= greatest(a.s, a.e)
  *    and b.s >= least(b.s, b.e); symmetrically for a.s), so attribution
  *    still fires exactly once. Sequence bounds stay ordered by
  *    construction.
  *  - NULL endpoints: `least`/`greatest` skip nulls, so the row still
  *    explodes, and the original conjunct evaluates to null downstream —
  *    filtered, exactly like the naive inner join. When BOTH endpoints are
  *    null the coverage sequence itself is null and `Explode` drops the
  *    row — harmless on the inner path (the row cannot match), but fatal
  *    to a PRESERVED outer row, so the outer path generates with
  *    `outer = true` (one null-bucket copy survives to null-extend).
  *  - Scope: INNER is the direct rewrite. LEFT/RIGHT OUTER preserve one
  *    exploded side, so the rewrite borrows [[RewriteRangeJoin]]'s
  *    probe-preserved dedup: tag every preserved ROW with a synthetic id
  *    (MonotonicallyIncreasingID — no reliance on user-key uniqueness),
  *    pos-explode its coverage (outer = true for the null-endpoint
  *    corner), outer-join, and keep a row iff it matched OR (its row-id
  *    group matched nowhere AND it is copy 0 — `coalesce(pos, 0) = 0`, so
  *    the null-generator copy counts as copy 0). Matched pairs still
  *    survive exactly once via bucket attribution; unmatched preserved
  *    rows null-extend exactly once. FULL OUTER (both sides would need
  *    the dedup) and semi/anti (copy-level multiplicity) are left alone.
  *
  * Already-bucketized guard: if any equi-conjunct links an expression
  * derived from one side's interval endpoints to one derived from the
  * other's (the hand-bucketized shape, after predicate pushdown folds its
  * post-join filter back into the condition), the join is left alone —
  * rewriting would square the fan-out. Derivation is traced through
  * Project/Filter/Generate as in [[RewriteRangeJoin.originRefs]].
  *
  * Endpoint attributes must be LongType (epoch micros / day numbers — the
  * engine's time representations). Both range conjuncts must be bare
  * attribute comparisons; arithmetic on an endpoint (`a.s - W <= b.e`) is
  * the range rule's domain.
  */
object RewriteOverlapJoin extends Rule[LogicalPlan] {

  /** Bucket width for the overlap rewrite, in the endpoint unit. Default
    * 1 day in µs; tune to the typical interval length — candidates per
    * (key, bucket) scale with bucket occupancy, copies per row with
    * interval_length / W.
    */
  final val WidthKey = "spark.graft.overlap.bucket.width"
  final val WidthDefault = 86400000000L

  private val Prefix = "__graft_overlap"
  private val BktL = s"${Prefix}_bkt_l"
  private val BktR = s"${Prefix}_bkt_r"
  private val RidName = s"${Prefix}_rid"
  private val PosName = s"${Prefix}_pos"
  private val AnyName = s"${Prefix}_any"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Normalize a comparison to (lo, hi) meaning `lo <= hi` / `lo < hi`. */
  private def asLe(e: Expression)
      : Option[(AttributeReference, AttributeReference)] = e match {
    case LessThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((a, b))
    case LessThan(a: AttributeReference, b: AttributeReference) => Some((a, b))
    case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((b, a))
    case GreaterThan(a: AttributeReference, b: AttributeReference) => Some((b, a))
    case _ => None
  }

  /** Bucket START of t for width w: t - pmod(t, w) — floor-aligned for any
    * sign of t.
    */
  private def bucketOf(t: Expression, w: Long): Expression =
    Subtract(t, Pmod(t, Literal(w)))

  private def alreadyBucketized(
      cs: Seq[Expression], a: LogicalPlan, b: LogicalPlan,
      aEnds: Seq[Attribute], bEnds: Seq[Attribute]): Boolean = {
    // Both the equi-conjunct AND the endpoints must be traced to origin
    // attributes: a hand-bucketized side aliases its endpoints through the
    // same Project that carries the bucket column, so comparing a traced
    // bucket against an untraced alias never intersects.
    val aEndO = AttributeSet(
      aEnds.flatMap(x => RewriteRangeJoin.originRefs(x, a).toSeq))
    val bEndO = AttributeSet(
      bEnds.flatMap(x => RewriteRangeJoin.originRefs(x, b).toSeq))
    cs.exists {
      case EqualTo(l, r) =>
        def sideRefs(e: Expression): Option[(AttributeSet, Boolean)] =
          if (e.references.subsetOf(a.outputSet))
            Some((RewriteRangeJoin.originRefs(e, a), true))
          else if (e.references.subsetOf(b.outputSet))
            Some((RewriteRangeJoin.originRefs(e, b), false))
          else None
        (sideRefs(l), sideRefs(r)) match {
          case (Some((lr, lSideA)), Some((rr, rSideA))) if lSideA != rSideA =>
            val (aRefs, bRefs) = if (lSideA) (lr, rr) else (rr, lr)
            aRefs.toSeq.exists(aEndO.contains) && bRefs.toSeq.exists(bEndO.contains)
          case _ => false
        }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftOuter || jt == RightOuter) &&
          // fixpoint guard: never rewrite our own (or the range rule's) output
          !j.children.exists(_.output.exists(_.name.startsWith("__graft"))) =>
      val cs = conjuncts(cond)
      // two opposite-direction cross-side inequalities: (a.s <= b.e) and
      // (b.s <= a.e) with {a.s, a.e} on one side and {b.s, b.e} on the other
      val candidate = (for {
        c1 <- cs; (lo1, hi1) <- asLe(c1).toSeq
        c2 <- cs; (lo2, hi2) <- asLe(c2).toSeq
        if c1 != c2
        // c1: a.s <= b.e → lo1 = a.s (side A), hi1 = b.e (side B)
        // c2: b.s <= a.e → lo2 = b.s (side B), hi2 = a.e (side A)
        if Seq(lo1, hi1, lo2, hi2).forall(_.dataType == LongType)
        aSide <- Seq(left, right)
        bSide = if (aSide eq left) right else left
        if aSide.outputSet.contains(lo1) && aSide.outputSet.contains(hi2) &&
          bSide.outputSet.contains(lo2) && bSide.outputSet.contains(hi1)
      } yield (aSide, bSide, lo1, hi2, lo2, hi1)).headOption

      candidate match {
        case Some((aSide, bSide, aS, aE, bS, bE))
            if !alreadyBucketized(cs, aSide, bSide, Seq(aS, aE), Seq(bS, bE)) =>
          val w = conf.getConfString(WidthKey, WidthDefault.toString).toLong
          if (w <= 0) j
          else jt match {
            case Inner =>
              rewriteInner(j, left, cond, hint, aSide, bSide, aS, aE, bS, bE, w)
            case LeftOuter | RightOuter =>
              rewritePreserved(j, left, right, jt, cond, hint,
                aSide, aS, aE, bS, bE, w)
            case _ => j
          }
        case _ => j
      }
  }

  /** Sequence is TimeZoneAwareExpression — without an explicit timeZoneId
    * it reports unresolved and the optimizer aborts the batch
    * (plan-validation failure). Long sequences ignore the zone; it just
    * has to be present.
    */
  private def coverage(s: Expression, e: Expression, w: Long): Expression =
    new Sequence(
      bucketOf(Least(Seq(s, e)), w),
      bucketOf(Greatest(Seq(s, e)), w),
      Some(Literal(w)),
      Some(conf.sessionLocalTimeZone))

  private def rewriteInner(
      j: Join, left: LogicalPlan, cond: Expression, hint: JoinHint,
      aSide: LogicalPlan, bSide: LogicalPlan,
      aS: Attribute, aE: Attribute, bS: Attribute, bE: Attribute,
      w: Long): LogicalPlan = {
    val aBkt = AttributeReference(BktL, LongType, nullable = true)()
    val bBkt = AttributeReference(BktR, LongType, nullable = true)()
    val genA = Generate(Explode(coverage(aS, aE, w)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(aBkt), child = aSide)
    val genB = Generate(Explode(coverage(bS, bE, w)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bBkt), child = bSide)
    val attribution =
      EqualTo(aBkt, bucketOf(Greatest(Seq(aS, bS)), w))
    val newCond = And(And(cond, EqualTo(aBkt, bBkt)), attribution)
    val newJoin =
      if (aSide eq left) Join(genA, genB, Inner, Some(newCond), hint)
      else Join(genB, genA, Inner, Some(newCond), hint)
    Project(j.output, newJoin)
  }

  /** LEFT/RIGHT OUTER: the preserved side explodes too, so borrow
    * [[RewriteRangeJoin]]'s probe-preserved dedup — synthetic row id,
    * pos-exploded coverage (outer = true so null-endpoint rows survive to
    * null-extend), whole-group matched window, keep matched rows plus
    * copy 0 of never-matched groups.
    */
  private def rewritePreserved(
      j: Join, left: LogicalPlan, right: LogicalPlan, jt: JoinType,
      cond: Expression, hint: JoinHint, aSide: LogicalPlan,
      aS: Attribute, aE: Attribute, bS: Attribute, bE: Attribute,
      w: Long): LogicalPlan = {
    val preserved = if (jt == LeftOuter) left else right
    val other = if (jt == LeftOuter) right else left
    val ((pS, pE), (oS, _)) =
      if (preserved eq aSide) ((aS, aE), (bS, bE)) else ((bS, bE), (aS, aE))
    val ridAlias = Alias(MonotonicallyIncreasingID(), RidName)()
    val projRid = Project(preserved.output :+ ridAlias, preserved)
    val pos = AttributeReference(PosName, IntegerType, nullable = true)()
    val pBkt = AttributeReference(BktL, LongType, nullable = true)()
    val oBkt = AttributeReference(BktR, LongType, nullable = true)()
    val genP = Generate(PosExplode(coverage(pS, pE, w)),
      unrequiredChildIndex = Nil, outer = true, qualifier = None,
      generatorOutput = Seq(pos, pBkt), child = projRid)
    val genO = Generate(Explode(coverage(oS, bEOf(oS, aS, aE, bS, bE), w)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(oBkt), child = other)
    val attribution = EqualTo(pBkt, bucketOf(Greatest(Seq(aS, bS)), w))
    val newCond = And(And(cond, EqualTo(pBkt, oBkt)), attribution)
    val joined =
      if (jt == LeftOuter) Join(genP, genO, LeftOuter, Some(newCond), hint)
      else Join(genO, genP, RightOuter, Some(newCond), hint)
    // matched ⇒ the other side's start is non-null (the overlap conjuncts
    // cannot hold on null); MUST reference the join-OUTPUT attribute —
    // the outer join re-emits it nullable, and IsNotNull over the original
    // non-nullable reference is constant-folded to `true` by
    // NullPropagation inside the operator-optimization fixpoint.
    val oSOut = joined.output.find(_.exprId == oS.exprId).getOrElse(oS)
    val anyAlias = Alias(
      WindowExpression(
        AggregateExpression(Max(IsNotNull(oSOut)), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(ridAlias.toAttribute), Nil,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))),
      AnyName)()
    val win = Window(Seq(anyAlias), Seq(ridAlias.toAttribute), Nil, joined)
    // the outer-generated null copy has pos = null: it IS copy 0
    val keep = Or(IsNotNull(oSOut),
      And(Not(anyAlias.toAttribute),
        EqualTo(Coalesce(Seq(pos, Literal(0))), Literal(0))))
    Project(j.output, Filter(keep, win))
  }

  /** The end attribute paired with `oS` among the candidate's four. */
  private def bEOf(oS: Attribute, aS: Attribute, aE: Attribute,
      bS: Attribute, bE: Attribute): Attribute =
    if (oS.exprId == aS.exprId) aE else bE
}
