package graft.ranges

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Closed-interval ([start, end], both ends inclusive — the reference uses
  * `pd.Interval(closed="both")`, `/root/reference/clinpy/assays/junction.py:237-246`)
  * arithmetic as pure Column expressions.
  *
  * All of these are plain Catalyst expressions: they stay inside
  * whole-stage codegen and can be pushed into join conditions. No UDFs.
  */
object Intervals {

  /** True iff [s1,e1] and [s2,e2] overlap (closed ends). */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 <= e2 && s2 <= e1

  /** True iff [s2,e2] contains the point p. */
  def contains(s: Column, e: Column, p: Column): Column =
    s <= p && p <= e

  /** Overlap length in bases (closed ends), 0 when disjoint. */
  def overlapLength(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    greatest(lit(0L), least(e1, e2) - greatest(s1, s2) + lit(1L))

  /** Fraction of [s1,e1] covered by [s2,e2] — the reference's
    * `calc_overlap` (`/root/reference/clinpy/utils/utils.py:7-25`), whose
    * five analytic branches (disjoint→0, containment→1, two partial
    * overlaps, identity) collapse into one expression. Closed-end lengths.
    */
  def overlapFraction(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    overlapLength(s1, e1, s2, e2).cast("double") /
      (e1 - s1 + lit(1L)).cast("double")

  /** Tolerance match used by Junction.samples(tolerance=n): candidate start
    * within -tol5 and end within +tol3 of the anchor
    * (`junction.py:285-290`). */
  def withinTolerance(start: Column, end: Column, anchorStart: Column,
      anchorEnd: Column, tol5: Int, tol3: Int): Column =
    start >= anchorStart - lit(tol5) && end <= anchorEnd + lit(tol3)
}
