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
    // duplicate-span merge (Dedup.duplicateSpans). Both window
    // expressions share ONE spec, so Catalyst plans them in a single
    // Window operator over one physical sort — with duplicate (s, e)
    // rows the two passes therefore see the SAME tie order, which is
    // what keeps islands consistent (an engine running them as two
    // independent sorts must add a unique tiebreaker; see the q94
    // oracle SQL)
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

  /** [[coverageDepth]] for FEW keys at extreme scale — the two-pass
    * bucketed sweep. [[coverageDepth]]'s window parallelism equals the
    * key count (chromosomes), which caps a 1000-executor cluster at
    * ~25 tasks; here positions bucket into `bucketWidth`-sized ranges
    * so the heavy window runs per (key, bucket) — parallelism = keys ×
    * occupied buckets — and a SECOND, bucket-count-sized pass stitches
    * the buckets:
    *
    *  1. per-(key, bucket) delta sums + first/last event positions
    *     (a tiny table: occupied buckets only);
    *  2. a window over THAT table yields each bucket's entering depth
    *     (prefix sum of earlier buckets) and the cross-boundary
    *     "bridge" segment from its last event to the next occupied
    *     bucket's first event;
    *  3. the per-bucket windows add the entering depth to their local
    *     running sums; within-bucket segments ∪ bridges = exactly the
    *     unbucketed output (spec-asserted equal on random data).
    *
    * Same output contract as [[coverageDepth]]. Pick `bucketWidth` so
    * keys × (range/bucketWidth) stays in the thousands–millions: for a
    * human genome at 1 Mb buckets that is ~3200 windows. */
  def coverageDepthBucketed(df: DataFrame, keys: Seq[String],
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val kc = keys.map(col)
    val events = df.select((kc :+ explode(array(
      struct(col(startCol).cast("long").as("pos"), lit(1L).as("d")),
      struct((col(endCol) + 1).cast("long").as("pos"),
        lit(-1L).as("d")))).as("__e")): _*)
      .select((kc :+ col("__e.pos").as("pos") :+ col("__e.d").as("d")): _*)
    val deltas = events.groupBy((kc :+ col("pos")): _*)
      .agg(sum(col("d")).as("delta"))
      .filter(col("delta") =!= 0)
      .withColumn("__b", floor(col("pos") / bucketWidth))
    // pass 1: occupied-bucket summaries (tiny), stitched by a window
    // over buckets: entering depth + the bridge to the next bucket
    val bOrd = Window.partitionBy(kc: _*).orderBy(col("__b").asc)
    val buckets = deltas.groupBy((kc :+ col("__b")): _*)
      .agg(sum(col("delta")).as("__bsum"), min(col("pos")).as("__first"),
        max(col("pos")).as("__last"))
      .withColumn("__enter", coalesce(sum(col("__bsum")).over(
        bOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nextFirst", lead(col("__first"), 1).over(bOrd))
    val bridges = buckets.filter(col("__nextFirst").isNotNull)
      .select((kc :+ col("__last").as("seg_start") :+
        (col("__nextFirst") - 1).as("seg_end") :+
        (col("__enter") + col("__bsum")).as("depth")): _*)
    // pass 2: per-(key, bucket) windows — the heavy stage, now wide
    val wOrd = Window.partitionBy((kc :+ col("__b")): _*)
      .orderBy(col("pos").asc)
    val within = deltas
      .join(broadcast(buckets.select((kc :+ col("__b") :+ col("__enter")): _*)),
        keys :+ "__b")
      .withColumn("depth", col("__enter") + sum(col("delta")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__next", lead(col("pos"), 1).over(wOrd))
      .filter(col("__next").isNotNull) // bucket-last rows become bridges
      .select((kc :+ col("pos").as("seg_start") :+
        (col("__next") - 1).as("seg_end") :+ col("depth")): _*)
    within.unionByName(bridges)
  }
}
