package graft.ranges

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-SET operators (the bedtools-merge / genomecov family) over
  * closed integer intervals, as single window passes per partition key.
  *
  * Both operators shuffle once (hash by key) and then run an ordered
  * window within each key — the same shape as sessionization. Window
  * parallelism equals the number of distinct keys: for genomic data
  * that is chromosomes (fine up to human-scale), for a few-key corpus
  * at extreme scale the sweep generalizes to two passes (per-bucket
  * partial sums, then broadcast cumulative offsets across range
  * buckets) — documented here as the known scale path, not implemented
  * until a workload needs it.
  *
  * Reference semantics: clinpy's junction/region tables treat intervals
  * as closed on both ends (see ranges/Intervals.scala); merge joins
  * intervals that OVERLAP in closed coordinates (`start <= running max
  * end + gap`), with `gap = 1` giving bedtools' book-ended merging.
  */
object IntervalSets {

  /** Union of overlapping closed intervals per key: each output row is
    * one maximal merged interval with its member count. `gap` extends
    * merging across separations of up to that many positions
    * (gap = 1 merges book-ended intervals like bedtools merge). */
  def mergeOverlapping(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, gap: Long = 0L): DataFrame = {
    require(gap >= 0, "gap must be >= 0")
    val part = Window.partitionBy(keys.map(col): _*)
    val ord = part.orderBy(col(startCol).asc, col(endCol).asc)
    // new island iff this start clears every earlier end (running max);
    // the isnew running sum is the island id — same device as the
    // duplicate-span merge (Dedup.duplicateSpans)
    val prevMax = max(col(endCol)).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val isnew = when(
      col(startCol) > coalesce(prevMax + lit(gap), lit(Long.MinValue)),
      1L).otherwise(0L)
    df.withColumn("__new", isnew)
      .withColumn("__island", sum(col("__new")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as("m_start"), max(col(endCol)).as("m_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Per-position coverage depth as maximal constant-depth segments —
    * the event sweep (+1 at start, -1 past end), NOT a per-base
    * explode: work is proportional to the number of interval
    * ENDPOINTS, never to the genome length. Emits every segment
    * between the first and last endpoint of each key, including
    * interior zero-depth gaps (the bedtools `genomecov -bga` shape
    * within the covered span). */
  def coverageDepth(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    val kc = keys.map(col)
    val events = df.select((kc :+ explode(array(
      struct(col(startCol).cast("long").as("pos"), lit(1L).as("d")),
      struct((col(endCol) + 1).cast("long").as("pos"),
        lit(-1L).as("d")))).as("__e")): _*)
      .select((kc :+ col("__e.pos").as("pos") :+ col("__e.d").as("d")): _*)
    // combine same-position deltas first: positions become unique per
    // key, so the running sum and lead below are order-deterministic.
    // Zero-net positions (an end meeting a start) change nothing and
    // would split a constant-depth run — drop them so segments are
    // MAXIMAL. A key's first position can never net to zero (an end
    // event at p implies a start before p), so no key disappears.
    val deltas = events.groupBy((kc :+ col("pos")): _*)
      .agg(sum(col("d")).as("delta"))
      .filter(col("delta") =!= 0)
    val ord = Window.partitionBy(kc: _*).orderBy(col("pos").asc)
    deltas
      .withColumn("depth", sum(col("delta")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__next", lead(col("pos"), 1).over(ord))
      .filter(col("__next").isNotNull) // past the last end, depth is 0
      .select((kc :+ col("pos").as("seg_start") :+
        (col("__next") - 1).as("seg_end") :+ col("depth")): _*)
  }
}
