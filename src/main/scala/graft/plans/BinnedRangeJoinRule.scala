package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule making the binned interval join (ranges/RangeJoin)
  * TRANSPARENT: an inner join whose condition contains the overlap
  * pattern `ls <= re AND rs <= le` (closed-interval overlap, any extra
  * equi/other conjuncts welcome) is rewritten to explode both sides into
  * fixed-width bins, join on the bin, and keep each pair exactly once via
  * the canonical-bin filter — the same construction as
  * `RangeJoin.overlapJoin`, but applied to ANY user query, including
  * plain SQL, without calling the library.
  *
  * Without this, Catalyst plans chrom-only equi keys (or none) and
  * evaluates the range predicate per same-key pair — a per-chromosome
  * nested loop that dies at genome scale (SURVEY §4.4.1; the rule is the
  * "later" it deferred).
  *
  * Exactness notes:
  *  - bin bounds use least/greatest of (start, end), so malformed
  *    (inverted) intervals bin over a superset and the ORIGINAL predicate
  *    — kept intact in the join condition — stays the decider;
  *  - the canonical bin `floor(greatest(ls, rs) / width)` provably lies
  *    in both sides' bin ranges whenever the overlap predicate holds, so
  *    every qualifying pair survives exactly once;
  *  - joins already mentioning a bin column (ours or the library's) are
  *    skipped, which also makes the rule idempotent under the fixed-point
  *    optimizer batch.
  *
  * Bin width: `spark.graft.rangejoin.binwidth` (default 10000). Install
  * via `spark.experimental.extraOptimizations` or the
  * [[GraftExtensions]] session extension.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinName = "__graft_bin"
  private val LibBinName = "__bin"

  private def width: Long =
    conf.getConfString("spark.graft.rangejoin.binwidth", "10000").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner, Some(cond), _) if eligible(j, cond) =>
      rewrite(j, cond)
  }

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangejoin.enabled", "true").toBoolean

  private def eligible(j: Join, cond: Expression): Boolean =
    enabled &&
      !cond.references.exists(a => a.name == BinName || a.name == LibBinName) &&
      extractOverlap(j, cond).isDefined

  /** Find `ls <= re AND rs <= le` (attrs, integral type, opposite sides).
    * Returns (ls, le, rs, re). */
  private def extractOverlap(j: Join,
      cond: Expression): Option[(Attribute, Attribute, Attribute, Attribute)] = {
    val fromLeft = j.left.outputSet
    val fromRight = j.right.outputSet
    def side(a: Attribute): Option[Boolean] = // true = left
      if (fromLeft.contains(a)) Some(true)
      else if (fromRight.contains(a)) Some(false) else None

    // normalized candidates: (x <= y) with x, y integral attrs on
    // opposite sides
    val les = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(x: Attribute, y: Attribute) => Some((x, y))
      case GreaterThanOrEqual(x: Attribute, y: Attribute) => Some((y, x))
      case _ => None
    }.filter { case (x, y) =>
      integral(x.dataType) && integral(y.dataType) &&
        (for (sx <- side(x); sy <- side(y)) yield sx != sy).getOrElse(false)
    }
    // one candidate starting on each side makes an overlap pattern; the
    // four attributes must be DISTINCT (a real interval overlap uses a
    // start and an end per side — accepting e.g. `a.ts <= b.ts AND
    // b.qty <= a.bytes` style coincidences risks exploding unrelated
    // wide-range columns into huge bin arrays)
    val lStart = les.filter { case (x, _) => side(x).contains(true) }
    val rStart = les.filter { case (x, _) => side(x).contains(false) }
    (for {
      (ls, re) <- lStart; (rs, le) <- rStart
      if Seq(ls, le, rs, re).map(_.exprId).distinct.size == 4
    } yield (ls, le, rs, re)).headOption
  }

  private def integral(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def floorDiv(x: Expression): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(width.toDouble))), LongType)

  private def binsOf(s: Expression, e: Expression): Expression =
    // timeZoneId must be set by hand: Sequence is TimeZoneAwareExpression
    // and no analyzer pass will fill it inside the optimizer
    Sequence(
      floorDiv(Least(Seq(s, e))), floorDiv(Greatest(Seq(s, e))),
      Some(Literal(1L)), Some(conf.sessionLocalTimeZone))

  private def rewrite(j: Join, cond: Expression): LogicalPlan = {
    val Some((ls, le, rs, re)) = extractOverlap(j, cond)
    val lBin = AttributeReference(BinName, LongType, nullable = false)()
    val rBin = AttributeReference(BinName, LongType, nullable = false)()
    val lGen = Generate(Explode(binsOf(ls, le)), Nil, outer = false, None,
      Seq(lBin), j.left)
    val rGen = Generate(Explode(binsOf(rs, re)), Nil, outer = false, None,
      Seq(rBin), j.right)
    val newJoin = Join(lGen, rGen, Inner,
      Some(And(cond, EqualTo(lBin, rBin))), j.hint)
    val canonical = EqualTo(lBin, floorDiv(Greatest(Seq(ls, rs))))
    Project(j.output, Filter(canonical, newJoin))
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — installs the
  * transparent range-join rule (and is the hook for future strategies). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinnedRangeJoinRule)
  }
}
