package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential conversion-funnel analysis over an event log — the
  * third member of the event-analytics family ([[Sessionize]],
  * [[AsofJoin]]): how far does each user get through an ordered list
  * of step types, and when did each step first happen?
  *
  * Semantics (the classic first-touch strict-order funnel): step 1's
  * time is the user's earliest step-1 event; step i's time is the
  * earliest step-i event STRICTLY after the user's step-(i-1) time.
  * Same-timestamp events do not advance the funnel (a conversion
  * cannot be simultaneous with its cause), and events before the
  * previous step never count — out-of-order journeys stall where the
  * order breaks. An optional `horizon` (same unit as `tsCol`) bounds
  * the whole journey: step i only counts within `t1 + horizon`.
  */
object Funnel {

  /** Per-user funnel row: (userCol, t1..tn, step_reached) with tk null
    * from the first unreached step on; users with no step-1 event are
    * absent (they never entered the funnel).
    *
    * Plan shape: one type-FILTERED scan per step (the equality
    * predicate pushes into the source scan, so each stage reads only
    * its step's events), one user-keyed aggregation per step over a
    * monotonically SHRINKING user set (stage i joins only users that
    * reached stage i-1), and a final left-join chain on the user key —
    * every exchange is on the same key, so AQE plans them as hash
    * joins with no extra repartition. Work ∝ the step types' event
    * counts, never the full log. (A single-shuffle mapGroups state
    * machine computes the same thing in one pass; this staged form
    * stays in Catalyst — pushed filters, codegen aggregates — and is
    * SQL-replicable, which is what makes it oracle-checkable.) */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      horizon: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps,
      "repeated step types are ambiguous — strict-after semantics" +
        " already handle re-occurrence")
    val base = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
      .select(col(userCol), col("t1"), col("t1").as("__tcur"))
    val stages = steps.tail.foldLeft(List(base)) { case (acc, st) =>
      val cand = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("__ts"))
      val after = acc.head.join(cand, Seq(userCol))
        .filter(col("__ts") > col("__tcur"))
      val bounded = horizon.fold(after)(h =>
        after.filter(col("__ts") <= col("t1") + lit(h)))
      bounded.groupBy(col(userCol), col("t1"))
        .agg(min(col("__ts")).as("__tcur")) :: acc
    }.reverse
    val perStep = stages.zipWithIndex.map { case (s, i) =>
      s.select(col(userCol), col("__tcur").as(s"t${i + 1}"))
    }
    perStep.tail.foldLeft(perStep.head) { (a, b) =>
        a.join(b, Seq(userCol), "left")
      }
      .withColumn("step_reached",
        steps.indices.map(i => col(s"t${i + 1}").isNotNull.cast("int"))
          .reduce(_ + _))
  }
}
