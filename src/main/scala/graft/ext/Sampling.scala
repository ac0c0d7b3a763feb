package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (training-data pipelines: stratified
  * subset selection, per-group quotas, weighted reservoirs).
  *
  * All sampling here is hash-ordered, not RNG-ordered: rows are ranked by
  * md5 of their key, so any engine, any partitioning, and any re-run
  * selects the SAME sample — reproducibility is a first-class requirement
  * for dataset curation, and it is what makes these operators
  * oracle-checkable.
  */
object Sampling {

  /** Deterministic pseudo-random rank for a row key. */
  def hashRank(key: Column): Column = md5(key.cast("string"))

  /** Per-stratum quota sample: the `n` rows of each group with the
    * smallest key hashes. One shuffle on the stratum key. */
  def stratified(df: DataFrame, strata: Seq[String], keyCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashRank(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Bernoulli-style fraction sample, deterministic in the key: keeps a
    * row iff the first 8 hex digits of md5(key) fall below the fraction
    * threshold. Map-only — no shuffle at all. */
  def byFraction(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(
      conv(substring(hashRank(col(keyCol)), 1, 8), 16, 10).cast("long") <
        lit((fraction * (1L << 32)).toLong))

  /** Typed weighted-reservoir aggregator (Efraimidis–Spirtakis: key =
    * rank^(1/w), here hash-derandomized): keeps the top-k rows of each
    * group by weight-scaled hash score. Buffer is bounded (k entries), so
    * arbitrarily large groups aggregate in constant memory — the
    * TypedImperativeAggregate-style path for when a quota window would
    * shuffle too much. */
  final case class WeightedItem(id: Long, weight: Double, score: Double)

  class WeightedReservoir(k: Int)
      extends Aggregator[WeightedItem, List[WeightedItem], Seq[Long]] {
    override def zero: List[WeightedItem] = Nil
    override def reduce(buf: List[WeightedItem], it: WeightedItem): List[WeightedItem] =
      ((it :: buf).sortBy(-_.score)).take(k)
    override def merge(a: List[WeightedItem], b: List[WeightedItem]): List[WeightedItem] =
      (a ++ b).sortBy(-_.score).take(k)
    override def finish(buf: List[WeightedItem]): Seq[Long] =
      buf.map(_.id)
    override def bufferEncoder: Encoder[List[WeightedItem]] =
      Encoders.kryo[List[WeightedItem]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
