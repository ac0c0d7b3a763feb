package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive: instead of re-scanning the fact history on every refresh,
  * keep a per-group PARTIAL-AGGREGATE state table (count / exact
  * decimal sum / min / max) and fold each new batch in with a merge
  * that is itself just an aggregation of `state ∪ state(delta)`.
  *
  * Every component is associative and commutative (counts and DECIMAL
  * sums add exactly — no float drift under any merge order; min/max
  * are semilattice joins), so `merge(state(a), state(b)) ==
  * state(a ∪ b)` EXACTLY — spec-pinned, and the q130 oracle recomputes
  * the final answer from scratch over all rows.
  *
  * Cost model at 100 TB: refresh = one aggregation of the DELTA (its
  * own map-side partials) + a merge shuffle of |touched groups ∪
  * snapshot groups| state rows — group-cardinality-sized, never
  * history-sized. Derived values (mean here; variance would ride a
  * sum-of-squares column the same way) are computed only at read time
  * by [[finish]], never stored — storing them would break mergeability.
  */
object Incremental {

  /** Per-group partial-aggregate state of one batch of rows. The sum
    * is normalized to DECIMAL(38,2) so state and merged-state carry
    * the SAME schema (Spark widens summed decimals; without the cast,
    * `merge` output would not union with fresh state). */
  def aggregateState(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("sum_val"),
        min(col(valueCol)).as("min_val"),
        max(col(valueCol)).as("max_val"))

  /** Fold two state tables (snapshot + delta-state, or any two). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_val")).cast("decimal(38,2)").as("sum_val"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"))

  /** Read-time projection: the user-facing aggregate row, with derived
    * values (mean) computed from the exact state — one IEEE division,
    * reproducible in any engine. */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("mean_val",
      col("sum_val").cast("double") / col("n_rows").cast("double"))
}
