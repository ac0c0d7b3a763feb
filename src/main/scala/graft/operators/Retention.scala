package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event log — the fourth member of
  * the event-analytics family ([[Sessionize]], [[AsofJoin]], [[Funnel]]):
  * of the users whose FIRST activity fell in bucket c, how many were
  * active again c+k buckets later?
  *
  * Buckets are fixed-width integer windows over the raw timestamp
  * (`ts div bucketWidth`) — calendar-free on purpose: the math stays
  * exact integer division at any unit (nanos/micros/days), and the
  * oracle replicates it verbatim.
  */
object Retention {

  /** Cohort × offset activity matrix: one row per (cohort bucket,
    * bucket offset) with the distinct-user count and the retention rate
    * against the cohort's size. Offset 0 always holds the full cohort
    * (a user is by definition active in its first bucket), so
    * `retention` is 1.0 there and the later offsets read as the classic
    * retention curve.
    *
    * Plan shape — three user-keyed exchanges, each on a SHRUNKEN
    * stream, none on raw events: (1) events collapse to distinct
    * (user, bucket) pairs — the only pass over the log, and the
    * aggregation is partial (map-side) before anything moves; (2) one
    * window min over the user key pins each user's cohort (pairs per
    * user = active buckets, a small bounded set); (3) the (cohort,
    * offset) roll-up groups ~|users|·|buckets| pairs. At 100 TB the log
    * never shuffles — only the deduped pair stream does — and every
    * stage is key-parallel with no skew hotter than the busiest user's
    * bucket count. */
  def cohortMatrix(events: DataFrame, userCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pairs = events
      .select(col(userCol),
        expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketWidth}L").as("__bucket"))
      .distinct()
    val withCohort = pairs.withColumn("cohort",
      min(col("__bucket")).over(Window.partitionBy(col(userCol))))
    val counts = withCohort
      .groupBy(col("cohort"), (col("__bucket") - col("cohort"))
        .as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy(col("cohort"))
    counts.withColumn("retention",
      col("n_users").cast("double") /
        max(when(col("bucket_offset") === 0, col("n_users")))
          .over(w).cast("double"))
  }
}
