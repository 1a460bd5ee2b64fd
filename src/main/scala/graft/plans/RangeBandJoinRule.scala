package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._


/** Optimizer rule: rewrite an inner join whose only usable predicate is a
  * range condition over a timestamp OR numeric column pair
  *
  *     l.v >= r.lo AND l.v <= r.hi          (e.g. a BETWEEN)
  *
  * into a hash-partitionable band join:
  *
  *     value side  + band(v)
  *     bounds side + explode(sequence(band(lo), band(hi)))  — ≤ span/W bands
  *     JOIN ON band_v = band_b AND <original range condition>
  *
  * where band(x) = x div W (epoch-micros div W for timestamps, floor
  * division for fractional types). Correctness: truncating and floor
  * division are both monotone non-decreasing, so v ∈ [lo, hi] ⇒
  * band(v) ∈ [band(lo), band(hi)] — every qualifying pair meets on
  * exactly one band (the value row's own), and the original condition
  * re-filters, so the rewrite is exact for any W. The value column and
  * the bounds may sit on either side of the join (mirrored shapes are
  * normalized).
  *
  * Why: Spark plans a pure range join as BroadcastNestedLoopJoin /
  * CartesianProduct — O(|L|·|R|) and single-node-bound on the broadcast
  * side. The band join shuffles on a key instead, which survives 100 TB.
  * (Engineered range-join support like this is the well-known gap in
  * OSS Spark; bucketed rewrite is the standard workaround.) Band skew
  * (a hot band) is AQE's skew-join split problem, which stays enabled.
  *
  * Scope guards: inner joins only; the value/bounds must come from
  * opposite sides; fires only when NO equi-join predicate exists (if one
  * does, Spark already hash-joins on it and the range stays a cheap
  * residual); skips joins it already rewrote (band attribute marker).
  *
  * Installed via `spark.experimental.extraOptimizations` (see
  * `RangeBandJoinRule.install`) or session extensions.
  *
  * @param bandSeconds      band width for timestamp ranges
  * @param numericBandWidth band width for numeric ranges (tune to the
  *                         typical [lo, hi] span: ≈span → ≤2 bands/row)
  */
case class RangeBandJoinRule(
    bandSeconds: Long = 30L * 86400,
    numericBandWidth: Double = 10.0) extends Rule[LogicalPlan] {

  private val BandL = "__graft_band_l"
  private val BandR = "__graft_band_r"

  /** Widths are session-tunable without reinstalling the rule (the knob
    * for matching band width to a workload's typical [lo, hi] span):
    * `SET spark.graft.rangeJoin.bandSeconds=86400` /
    * `SET spark.graft.rangeJoin.numericBandWidth=5.0`. Constructor values
    * are the defaults.
    */
  // A non-positive (or NaN) width would make the band function
  // non-monotone (fractional floor-division flips sign) or null
  // (IntegralDivide by 0), silently emptying every band array — all
  // matches dropped. Misconfigured knobs therefore fall back to the
  // constructor value, and a bad constructor value to the class default.
  private def effBandSeconds: Long = {
    val w = conf.getConfString("spark.graft.rangeJoin.bandSeconds", bandSeconds.toString).toLong
    if (w > 0) w else if (bandSeconds > 0) bandSeconds else 30L * 86400
  }
  private def effNumericWidth: Double = {
    val w = conf.getConfString(
      "spark.graft.rangeJoin.numericBandWidth", numericBandWidth.toString).toDouble
    if (w > 0 && !w.isNaN && !w.isInfinity) w
    else if (numericBandWidth > 0 && !numericBandWidth.isNaN && !numericBandWidth.isInfinity) numericBandWidth
    else 10.0
  }

  /** Long band index of a range-typed expression; monotone in e. For
    * timestamps: epoch_micros(e) div (bandSeconds·1e6) — ANSI mode
    * forbids CAST(timestamp AS BIGINT), so go through UnixMicros;
    * TIMESTAMP_NTZ first gets a session-zone cast to TIMESTAMP (identity
    * under the harness's UTC session, and monotone under any fixed zone —
    * band monotonicity is all correctness needs). Integrals: truncating
    * div. Fractionals: floor division (floor, not truncation, so the
    * sequence lo..hi never misses a negative band).
    */
  private def bandOf(e: Expression): Expression = e.dataType match {
    case _: TimestampType | _: TimestampNTZType =>
      val ts = if (e.dataType == TimestampType) e
        else Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
      IntegralDivide(UnixMicros(ts), Literal(effBandSeconds * 1000000L))
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
      IntegralDivide(Cast(e, LongType), Literal(math.max(1L, effNumericWidth.toLong)))
    case _: FloatType | _: DoubleType =>
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(effNumericWidth))), LongType)
    case other =>
      throw new IllegalStateException(s"unbandable type $other") // guarded by bandable()
  }

  private def bandable(e: Expression): Boolean = e.dataType match {
    case _: TimestampType | _: TimestampNTZType => true
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _: FloatType | _: DoubleType => true
    case _ => false
  }

  /** ADAPTIVE width: when the bounds are `base − c1` / `base + c2` with
    * literal offsets around one base expression, the row's [lo, hi] span
    * is exactly c1+c2 — using it as the band width guarantees ≤ 2 bands
    * per bounds row regardless of how the query was written, no tuning
    * needed. Falls back to the session/default width when the span isn't
    * statically known (only numeric types; interval arithmetic on
    * timestamps belongs pre-join per PERF.md finding 1 anyway).
    */
  private def literalSpan(lo: Expression, hi: Expression): Option[Double] = {
    def num(a: Any): Option[Double] = a match {
      case n: Number => Some(n.doubleValue())
      case d: Decimal => Some(d.toDouble)
      case _ => None
    }
    def baseAndOffset(e: Expression): Option[(Expression, Double)] = e match {
      case Add(b, Literal(v, _), _) => num(v).map(b -> _)
      case Add(Literal(v, _), b, _) => num(v).map(b -> _)
      case Subtract(b, Literal(v, _), _) => num(v).map(x => b -> -x)
      case other => Some(other -> 0.0)
    }
    for {
      (bl, ol) <- baseAndOffset(lo)
      (bh, oh) <- baseAndOffset(hi)
      if bl.semanticEquals(bh) && oh - ol > 0
    } yield oh - ol
  }

  /** Substitute attributes with the expressions that produced them,
    * chasing Alias chains through the side's Projects — by the time the
    * rule fires, `base ± c` usually sits in a child Project and the join
    * condition only sees its output attribute.
    */
  private def resolveAliases(e: Expression, side: LogicalPlan): Expression = {
    val aliasMap = side.collect { case Project(pl, _) => pl }
      .flatten.collect { case a: Alias => a.toAttribute.exprId -> a.child }.toMap
    var cur = e
    var depth = 0
    var changed = true
    while (changed && depth < 10) {
      val next = cur.transformUp {
        case a: AttributeReference if aliasMap.contains(a.exprId) => aliasMap(a.exprId)
      }
      changed = !next.fastEquals(cur)
      cur = next
      depth += 1
    }
    cur
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !alreadyBanded(cond) && noEquiPredicate(cond, j) =>
      val conjuncts = splitConjuncts(cond)
      findRange(conjuncts, left, right) match {
        case Some((v, lo, hi, valueOnLeft)) =>
          val (valueSide, boundsSide) = if (valueOnLeft) (left, right) else (right, left)

          // precedence: explicit session knob > inferred span > default.
          // Non-positive/NaN knob values are ignored (same rationale as
          // effNumericWidth): a bad width silently empties every band.
          val explicitWidth =
            Option(conf.getConfString("spark.graft.rangeJoin.numericBandWidth", null)).map(_.toDouble)
              .filter(w => w > 0 && !w.isNaN && !w.isInfinity)
          val widthOverride: Option[Double] = v.dataType match {
            case _: FloatType | _: DoubleType | _: ByteType | _: ShortType |
                 _: IntegerType | _: LongType =>
              explicitWidth.orElse(
                literalSpan(resolveAliases(lo, boundsSide), resolveAliases(hi, boundsSide)))
            case _ => None
          }
          def bandOfW(e: Expression): Expression =
            widthOverride match {
              case Some(w) if e.dataType.isInstanceOf[FloatType] || e.dataType.isInstanceOf[DoubleType] =>
                Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)
              case Some(w) =>
                IntegralDivide(Cast(e, LongType), Literal(math.max(1L, w.toLong)))
              case None => bandOf(e)
            }

          val bandV = Alias(bandOfW(v), BandL)()
          val newValueSide = Project(valueSide.output :+ bandV, valueSide)

          val loB = bandOfW(lo)
          val hiB = bandOfW(hi)
          // Sequence is TimeZoneAwareExpression — resolved only with a
          // zone, even over longs. Branch types must match exactly
          // (containsNull = false) or the If is unresolved.
          val seq = If(LessThanOrEqual(loB, hiB),
            Sequence(loB, hiB, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
            Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
          val bandB = AttributeReference(BandR, LongType, nullable = false)()
          val newBoundsSide = Generate(Explode(seq), Nil, outer = false, None, Seq(bandB), boundsSide)

          val (newLeft, newRight) =
            if (valueOnLeft) (newValueSide, newBoundsSide) else (newBoundsSide, newValueSide)
          val newCond = And(EqualTo(bandV.toAttribute, bandB), cond)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def alreadyBanded(cond: Expression): Boolean =
    cond.exists {
      case a: AttributeReference => a.name == BandL || a.name == BandR
      case _ => false
    }

  private def noEquiPredicate(cond: Expression, j: Join): Boolean =
    !splitConjuncts(cond).exists {
      case EqualTo(a, b) => fromOppositeSides(a, b, j.left, j.right)
      case _ => false
    }

  private def fromOppositeSides(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean = {
    val (la, ra) = (left.outputSet, right.outputSet)
    (a.references.subsetOf(la) && b.references.subsetOf(ra)) ||
      (a.references.subsetOf(ra) && b.references.subsetOf(la))
  }

  /** Find v >= lo AND v <= hi with v from one side and lo/hi both from
    * the other (mirrored comparisons normalized). Returns (v, lo, hi,
    * valueOnLeft).
    */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Char] =
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some('L')
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some('R')
      else None
    // normalize every comparison to (smaller, larger)
    val lowerBounds = conjuncts.collect {
      case GreaterThanOrEqual(a, b) if bandable(a) => (a, b) // a >= b → b is lo of a
      case LessThanOrEqual(a, b) if bandable(a) => (b, a)    // a <= b → a is lo of b
    }
    val upperBounds = conjuncts.collect {
      case LessThanOrEqual(a, b) if bandable(a) => (a, b)    // a <= b → b is hi of a
      case GreaterThanOrEqual(a, b) if bandable(a) => (b, a) // a >= b → a is hi of b
    }
    (for {
      (ts1, lo) <- lowerBounds
      (ts2, hi) <- upperBounds
      if ts1.semanticEquals(ts2)
      sTs <- sideOf(ts1)
      sLo <- sideOf(lo)
      sHi <- sideOf(hi)
      if sLo == sHi && sTs != sLo
    } yield (ts1, lo, hi, sTs == 'L')).headOption
  }
}

object RangeBandJoinRule {
  /** Install on a session via the public experimental-optimizations hook. */
  def install(spark: org.apache.spark.sql.SparkSession,
      bandSeconds: Long = 30L * 86400): Unit = {
    val rule = RangeBandJoinRule(bandSeconds)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RangeBandJoinRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
