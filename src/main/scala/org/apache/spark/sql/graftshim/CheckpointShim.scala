/** Lives in the `org.apache.spark.sql` package space on purpose: the two
  * members it touches (`Dataset.ofRows`, `LogicalRDD`) are `private[sql]`,
  * and this is the narrowest way to reach them without forking Spark.
  * Keep this file free of graft logic — it is an access shim only.
  */
package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{DataFrame, Row}

object CheckpointShim {

  /** Eager `localCheckpoint` that keeps rows in Tungsten format AND hands
    * back the persisted RDD.
    *
    * Why not `createDataFrame(df.rdd, schema)`: `df.rdd` deserializes
    * every InternalRow to a GenericRow and `createDataFrame` re-encodes it
    * — a full decode/encode of the dataset per call, which an iterative
    * algorithm pays every round. Why not `df.localCheckpoint()`: it never
    * exposes the checkpointed RDD, and `Dataset.unpersist` does NOT
    * release checkpoint blocks (they are persisted on the RDD, not in the
    * CacheManager), so an iterative caller leaks every previous round's
    * blocks for the life of the job.
    *
    * This mirrors `Dataset.checkpoint(eager = true, reliable = false)`
    * exactly — execute the physical plan, copy (UnsafeRow buffers are
    * reused per partition), persist, wrap in `LogicalRDD.fromDataset` so
    * partitioning/ordering survive for downstream planning — but returns
    * the RDD handle so the caller can `unpersist` superseded rounds.
    */
  def materialize(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val ds = df.asInstanceOf[CDataset[Row]]
    val rdd = ds.queryExecution.executedPlan.execute().map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    val plan = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (CDataset.ofRows(ds.sparkSession, plan), rdd)
  }

  /** [[materialize]], but the single materializing action also folds
    * (min, max) of one LONG column and the sum of another — so a
    * caller can derive data-dependent tuning (e.g. a bucket width)
    * from the materialized table's own statistics without paying a
    * SECOND full pass over the sources. min/max skip NULLs (None when
    * every row is NULL/empty); the sum counts NULLs as 0. */
  def materializeWithLongStats(df: DataFrame, minMaxCol: String,
      sumCol: String)
      : (DataFrame, RDD[InternalRow], Option[(Long, Long)], Long) = {
    val ds = df.asInstanceOf[CDataset[Row]]
    val mmIdx = ds.schema.fieldIndex(minMaxCol)
    val sIdx = ds.schema.fieldIndex(sumCol)
    val rdd = ds.queryExecution.executedPlan.execute().map(_.copy())
    rdd.localCheckpoint()
    // (min, max, sum, seenAny) folded in the one materializing pass
    val (lo, hi, sum, seen) = rdd.aggregate(
      (Long.MaxValue, Long.MinValue, 0L, false))(
      (acc, r) => {
        val s2 = acc._3 + (if (r.isNullAt(sIdx)) 0L else r.getLong(sIdx))
        if (r.isNullAt(mmIdx)) (acc._1, acc._2, s2, acc._4)
        else {
          val v = r.getLong(mmIdx)
          (math.min(acc._1, v), math.max(acc._2, v), s2, true)
        }
      },
      (a, b) => (math.min(a._1, b._1), math.max(a._2, b._2),
        a._3 + b._3, a._4 || b._4))
    val plan = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (CDataset.ofRows(ds.sparkSession, plan), rdd,
      if (seen) Some((lo, hi)) else None, sum)
  }

  /** [[materialize]], but the single materializing action also sums an
    * INT column — so an iterative algorithm gets its convergence signal
    * for free instead of running a second probe job (and its shuffle)
    * per round. NULLs count as 0. */
  def materializeSummingInt(df: DataFrame, sumCol: String)
      : (DataFrame, RDD[InternalRow], Long) = {
    val ds = df.asInstanceOf[CDataset[Row]]
    val idx = ds.schema.fieldIndex(sumCol)
    val rdd = ds.queryExecution.executedPlan.execute().map(_.copy())
    rdd.localCheckpoint()
    val sum = rdd.aggregate(0L)(
      (acc, r) => acc + (if (r.isNullAt(idx)) 0L else r.getInt(idx).toLong),
      _ + _)
    val plan = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (CDataset.ofRows(ds.sparkSession, plan), rdd, sum)
  }
}
