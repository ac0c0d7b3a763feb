package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4.4 physical-execution posture).
  *
  * AQE handles skewed sort-merge JOINS automatically; skewed AGGREGATION
  * keys (few giant groups — e.g. grouping a 100 TB corpus by language,
  * where 'en' is half the data) still serialize into single reducers.
  * The classic fix is two-phase salted aggregation: shuffle once on
  * (key, salt) — spreading each giant group over `salts` reducers — then
  * once more on key to combine the partials. Only works for algebraic
  * aggregates (sum/count/min/max), which is what we expose.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param aggs (outputName → sum column expression); counts are sums of
    *             1s, so every algebraic aggregate here is a sum
    */
  def saltedSumAgg(df: DataFrame, keys: Seq[String], salts: Int,
      aggs: Seq[(String, Column)]): DataFrame = {
    // deterministic salt: spread rows without RNG (monotonic id % salts
    // would also work but is partition-layout-dependent)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }
}
