package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
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
  * Wide-row safety: a row spanning many bins would make `Sequence`
  * allocate a huge array AND explode into that many output rows — over a
  * nanosecond-coordinate domain a 1-hour interval is 3.6e8 bins, an OOM.
  * Rows whose own bin count exceeds `spark.graft.rangejoin.maxbins`
  * (default 512) are therefore routed around the binned path entirely:
  *
  * {{{
  *   narrow(L) ⋈binned narrow(R)   ∪   wide(L) ⋈ R   ∪   narrow(L) ⋈ wide(R)
  * }}}
  *
  * The three branches partition the pair space exactly, the fallback
  * branches keep the ORIGINAL join (correct for any data, merely
  * un-accelerated), and per-row bin fanout is bounded by maxbins. Wide
  * rows are rare by construction when width suits the data, so the
  * fallback joins see few rows. Fallback joins are tagged (and carry a
  * recognizable span-guard Filter on a child) so the rule never re-fires
  * on its own output.
  *
  * The Union re-scans each input once per branch, so a side whose column
  * stats PROVE it cannot hold a wide row (side extent / width < maxbins)
  * drops its guard and its fallback branch; with stats on both sides of
  * a typical ANALYZEd table the plan collapses to the single binned
  * join — one scan per input.
  *
  * Bin width resolution order: explicit `spark.graft.rangejoin.binwidth`
  * conf; else, when CBO column stats exist for all four bound columns
  * (ANALYZE TABLE ... FOR COLUMNS), `domain / spark.graft.rangejoin
  * .targetbins` (default 2^20) — so nanosecond-scale domains get
  * proportionally wide bins instead of millions per row; else 10000.
  *
  * When CBO stats additionally prove that an accompanying equi key is so
  * selective the per-key pair space is already trivial (a unique-id join
  * that happens to carry a range residual), the rewrite is skipped
  * entirely — see [[equiKeyBoundsPairs]].
  *
  * Install via `spark.experimental.extraOptimizations` or the
  * [[GraftExtensions]] session extension.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinName = "__graft_bin"
  private val LibBinName = "__bin"

  /** Marks fallback joins this rule created, so the fixed-point batch
    * never rewrites its own output (the fallback condition is the
    * original overlap pattern and would otherwise re-match). */
  private val SkipTag = TreeNodeTag[Unit]("graft.rangejoin.skip")

  private val DefaultWidth = 10000L

  /** Explicit user width wins; otherwise CBO column stats (when the
    * tables are ANALYZEd) size the width to the coordinate domain so a
    * nanosecond-scale domain doesn't get base-pair-scale bins; plain
    * DataFrames with no stats fall back to the default. */
  private def width(j: Join,
      attrs: (Attribute, Attribute, Attribute, Attribute)): Long =
    confWidth.orElse(statsWidth(j, attrs)).getOrElse(DefaultWidth)

  private def confWidth: Option[Long] =
    if (conf.contains("spark.graft.rangejoin.binwidth"))
      Some(conf.getConfString("spark.graft.rangejoin.binwidth").toLong)
    else None

  /** CBO column-stat bound (min when `lo`, else max) for an integral
    * attribute, when the plan carries one. */
  private def statBound(plan: LogicalPlan, a: Attribute,
      lo: Boolean): Option[Long] =
    for {
      cs <- plan.stats.attributeStats.get(a)
      v <- if (lo) cs.min else cs.max
      l <- v match {
        case l: Long => Some(l)
        case i: Int => Some(i.toLong)
        case s: Short => Some(s.toLong)
        case b: Byte => Some(b.toLong)
        case _ => None
      }
    } yield l

  /** `domain / targetbins` from column min/max stats: the bin count over
    * the whole coordinate space stays near the target regardless of the
    * domain's absolute scale. */
  private def statsWidth(j: Join,
      attrs: (Attribute, Attribute, Attribute, Attribute)): Option[Long] = {
    val (ls, le, rs, re) = attrs
    for {
      lsMin <- statBound(j.left, ls, lo = true)
      rsMin <- statBound(j.right, rs, lo = true)
      leMax <- statBound(j.left, le, lo = false)
      reMax <- statBound(j.right, re, lo = false)
    } yield {
      val domain = math.max(leMax, reMax) - math.min(lsMin, rsMin)
      val target = conf.getConfString("spark.graft.rangejoin.targetbins",
        (1L << 20).toString).toLong
      math.max(1L, domain / math.max(1L, target))
    }
  }

  /** False only when column stats PROVE no row of `plan` can span
    * `maxBins` bins (the side's whole coordinate extent fits under the
    * guard) — then that side's span guard and fallback branch are dead
    * and elided, saving one full re-scan of each input per elided
    * branch. No stats ⇒ true (assume wide rows possible). */
  private def canHaveWide(plan: LogicalPlan, s: Attribute, e: Attribute,
      w: Long): Boolean = {
    val maxSpanBins = for {
      sMin <- statBound(plan, s, lo = true)
      eMax <- statBound(plan, e, lo = false)
    } yield (eMax - sMin) / w + 1 // floor-pair difference upper bound
    maxSpanBins.forall(_ >= maxBins)
  }

  private def maxBins: Long =
    conf.getConfString("spark.graft.rangejoin.maxbins", "512").toLong

  /** True when CBO stats PROVE an equi conjunct already bounds the
    * candidate pair space: estimated pairs per equi-key group
    * `|L|·|R| / (ndv_l·ndv_r)` at or under
    * `spark.graft.rangejoin.maxpairsperkey` (default 4096) means the
    * per-group quadratic predicate check is trivial and the bin fanout
    * (explode + wider shuffle rows) is pure overhead — e.g. an overlap
    * join that also equi-joins on a unique id, or on a composite key
    * whose parts are only jointly selective. No stats ⇒ false (rewrite
    * as usual). */
  private def equiKeyBoundsPairs(j: Join, cond: Expression): Boolean = {
    val perKey = for {
      lRows <- j.left.stats.rowCount
      rRows <- j.right.stats.rowCount
      ndvProduct <- combinedEquiNdvProduct(j, cond)
      if ndvProduct > 0
    } yield BigDecimal(lRows) * BigDecimal(rRows) / BigDecimal(ndvProduct)
    val threshold = BigDecimal(conf.getConfString(
      "spark.graft.rangejoin.maxpairsperkey", "4096").toLong)
    perKey.exists(_ <= threshold)
  }

  /** Combined `ndv_left · ndv_right` over ALL equi conjuncts of the
    * join condition carrying stats on both sides — expected pairs per
    * COMPOSITE key group is `(|L|·|R|) / (ndv_l·ndv_r)` with each
    * side's combined ndv the product of its per-key NDVs (attribute
    * independence, the standard CBO assumption) capped at the side's
    * row count (a side can't have more distinct key tuples than rows —
    * the cap keeps correlated keys from inflating the estimate).
    * Conjuncts missing stats on either side contribute nothing
    * (conservative: the estimate only grows with evidence, so the
    * rewrite still fires unless the KNOWN keys suppress it). None when
    * no conjunct has stats on both sides. */
  private def combinedEquiNdvProduct(j: Join, cond: Expression): Option[BigInt] = {
    val keyPairs = splitConjunctivePredicates(cond).collect {
      case EqualTo(x: Attribute, y: Attribute)
        if j.left.outputSet.contains(x) && j.right.outputSet.contains(y) =>
        (x, y)
      case EqualTo(x: Attribute, y: Attribute)
        if j.right.outputSet.contains(x) && j.left.outputSet.contains(y) =>
        (y, x)
    }
    val withStats = keyPairs.flatMap { case (lk, rk) =>
      for {
        nl <- j.left.stats.attributeStats.get(lk).flatMap(_.distinctCount)
        nr <- j.right.stats.attributeStats.get(rk).flatMap(_.distinctCount)
      } yield (lk, nl, rk, nr)
    }
    if (withStats.isEmpty) None
    else {
      // dedupe per side by attribute: `a.k = b.k1 AND a.k = b.k2` uses
      // ndv(a.k) once — multiplying it per conjunct would square it and
      // wrongly suppress the rewrite
      def cap(ndv: BigInt, rows: Option[BigInt]): BigInt =
        rows.fold(ndv)(ndv.min)
      val lNdv = withStats.groupBy(_._1.exprId).values.map(_.head._2).product
      val rNdv = withStats.groupBy(_._3.exprId).values.map(_.head._4).product
      Some(cap(lNdv, j.left.stats.rowCount) *
        cap(rNdv, j.right.stats.rowCount))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner, Some(cond), _) if eligible(j, cond) =>
      rewrite(j, cond)
  }

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangejoin.enabled", "true").toBoolean

  // ordered cheapest-first: the rule sees EVERY inner join in every
  // optimizer batch iteration, so the conjunct-split pattern probe must
  // run before the whole-subtree guard scans and the stats computation
  private def eligible(j: Join, cond: Expression): Boolean =
    enabled &&
      j.getTagValue(SkipTag).isEmpty &&
      !cond.references.exists(a => a.name == BinName || a.name == LibBinName) &&
      extractOverlap(j, cond).isDefined &&
      !hasSpanGuard(j.left) && !hasSpanGuard(j.right) &&
      !equiKeyBoundsPairs(j, cond)

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

  private def floorDiv(x: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

  /** bins(row) - 1, i.e. floor(hi/w) - floor(lo/w). */
  private def spanBins(s: Expression, e: Expression, w: Long): Expression =
    Subtract(floorDiv(Greatest(Seq(s, e)), w), floorDiv(Least(Seq(s, e)), w))

  /** True when the row's bin fanout is acceptable (NULL spans drop on
    * both the narrow and the wide side — they can't satisfy the original
    * overlap predicate anyway). */
  private def narrowGuard(s: Expression, e: Expression, w: Long): Expression =
    LessThan(spanBins(s, e, w), Literal(maxBins))

  /** Structural re-entry protection, robust to other rules rebuilding the
    * fallback Join node (which loses the tag): a subtree containing a
    * Filter that compares a difference of two floor(cast(_)/_) bin
    * indices is one of our span guards. */
  private def hasSpanGuard(plan: LogicalPlan): Boolean = plan.exists {
    case f: Filter => f.condition.exists {
      case s: Subtract => isFloorDiv(s.left) && isFloorDiv(s.right)
      case _ => false
    }
    case _ => false
  }

  private def isFloorDiv(e: Expression): Boolean = e match {
    case c: Cast if c.dataType == LongType => c.child match {
      case f: Floor => f.child.isInstanceOf[Divide]
      case _ => false
    }
    case _ => false
  }

  private def binsOf(s: Expression, e: Expression, w: Long): Expression =
    // timeZoneId must be set by hand: Sequence is TimeZoneAwareExpression
    // and no analyzer pass will fill it inside the optimizer
    Sequence(
      floorDiv(Least(Seq(s, e)), w), floorDiv(Greatest(Seq(s, e)), w),
      Some(Literal(1L)), Some(conf.sessionLocalTimeZone))

  private def rewrite(j: Join, cond: Expression): LogicalPlan = {
    val Some((ls, le, rs, re)) = extractOverlap(j, cond)
    val w = width(j, (ls, le, rs, re))
    val lWide = canHaveWide(j.left, ls, le, w)
    val rWide = canHaveWide(j.right, rs, re, w)
    val lNarrowPred = narrowGuard(ls, le, w)
    val rNarrowPred = narrowGuard(rs, re, w)
    val lNarrow = if (lWide) Filter(lNarrowPred, j.left) else j.left
    val rNarrow = if (rWide) Filter(rNarrowPred, j.right) else j.right

    // binned fast path over bounded-fanout rows
    val lBin = AttributeReference(BinName, LongType, nullable = false)()
    val rBin = AttributeReference(BinName, LongType, nullable = false)()
    val lGen = Generate(Explode(binsOf(ls, le, w)), Nil, outer = false, None,
      Seq(lBin), lNarrow)
    val rGen = Generate(Explode(binsOf(rs, re, w)), Nil, outer = false, None,
      Seq(rBin), rNarrow)
    val binnedJoin = Join(lGen, rGen, Inner,
      Some(And(cond, EqualTo(lBin, rBin))), j.hint)
    val canonical = EqualTo(lBin, floorDiv(Greatest(Seq(ls, rs)), w))
    val narrow = Project(j.output, Filter(canonical, binnedJoin))

    // fail-soft path: wide rows keep the ORIGINAL (un-binned) join; the
    // two branches partition the remaining pair space exactly
    def fallback(l: LogicalPlan, r: LogicalPlan): LogicalPlan = {
      val fj = Join(l, r, Inner, Some(cond), j.hint)
      fj.setTagValue(SkipTag, ())
      Project(j.output, fj)
    }
    val branches = Seq(narrow) ++
      (if (lWide) Seq(fallback(Filter(Not(lNarrowPred), j.left), j.right))
       else Nil) ++
      (if (rWide) Seq(fallback(lNarrow, Filter(Not(rNarrowPred), j.right)))
       else Nil)
    if (branches.size == 1) branches.head else Union(branches)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — installs the
  * transparent range-join rule and the engine's SQL function surface
  * (graft_cosine / graft_dot / graft_shingles / graft_overlap_*), so a
  * pure-SQL session gets the accelerated operators with no library
  * imports. `GraftSession.local` sets this by default. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinnedRangeJoinRule)
    graft.functions.GraftFunctions.all.foreach(e.injectFunction)
  }
}
