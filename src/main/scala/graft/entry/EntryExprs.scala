package graft.entry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism-critical expression helpers shared by the entry query
  * modules. Exactly ONE definition of the decimal-sum discipline: every
  * double aggregate that feeds an oracle hash-compare must route through
  * an exact DECIMAL sum (order-independent under partial aggregation) on
  * BOTH the Spark and the DuckDB side. */
private[entry] object EntryExprs {

  /** Exact decimal sum of a double expression, emitted as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** The TPC-H revenue aggregate: Σ extendedprice · (1 − discount). */
  def revenue: Column =
    dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
}
