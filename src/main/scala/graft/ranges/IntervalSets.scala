package graft.ranges

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-SET operators (the bedtools-merge / genomecov family) over
  * closed integer intervals, as single window passes per partition key.
  *
  * Both operators shuffle once (hash by key) and then run an ordered
  * window within each key — the same shape as sessionization. Window
  * parallelism equals the number of distinct keys (chromosomes); for a
  * few-key corpus at extreme scale use [[coverageDepthBucketed]].
  *
  * Coordinates are cast to LONG at the edge (so arithmetic like
  * `end + 1` cannot wrap an IntegerType column at Int.MaxValue), and an
  * inverted interval (start > end) raises at evaluation time — the
  * check rides inside a load-bearing expression, so the optimizer
  * cannot prune it, and a silent wrong merge/coverage becomes a
  * diagnosable failure.
  *
  * Reference semantics: clinpy's junction/region tables treat intervals
  * as closed on both ends (see ranges/Intervals.scala); merge joins
  * intervals that OVERLAP in closed coordinates (`start <= running max
  * end + gap`), with `gap = 1` giving bedtools' book-ended merging.
  */
object IntervalSets {

  /** End coordinate as long, validated against start — evaluating it
    * throws on an inverted interval instead of sweeping garbage. Used
    * wherever the end enters arithmetic, so the check cannot be pruned. */
  private def checkedEnd(startCol: String, endCol: String): Column =
    // nulls get their own branch: a null coordinate would otherwise
    // fall through the (null) comparison into the inverted-interval
    // error with a misleading "null > null" diagnosis
    when(col(startCol).isNull || col(endCol).isNull,
      raise_error(lit(s"null interval coordinate in ($startCol, $endCol)"))
        .cast("long"))
      .when(col(endCol) >= col(startCol), col(endCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"inverted interval: $startCol > $endCol: "),
        col(startCol).cast("string"), lit(" > "),
        col(endCol).cast("string"))).cast("long"))

  /** Union of overlapping closed intervals per key: each output row is
    * one maximal merged interval with its member count. `gap` extends
    * merging across separations of up to that many positions
    * (gap = 1 merges book-ended intervals like bedtools merge).
    * `m_start`/`m_end` are LONG regardless of the input column type. */
  def mergeOverlapping(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, gap: Long = 0L): DataFrame = {
    require(gap >= 0, "gap must be >= 0")
    val s = col(startCol).cast("long")
    val withE = df.withColumn("__s", s).withColumn("__e",
      checkedEnd(startCol, endCol))
    val part = Window.partitionBy(keys.map(col): _*)
    val ord = part.orderBy(col("__s").asc, col("__e").asc)
    // new island iff this start clears every earlier end (running max);
    // the isnew running sum is the island id — same device as the
    // duplicate-span merge (Dedup.duplicateSpans). The two windows
    // share one spec: they plan as two Window operators, but the
    // second's required (partition, order) is satisfied by the first's
    // output ordering, so no re-sort happens in between and duplicate
    // (s, e) rows keep ONE tie order through both passes — the
    // consistency the duplicate-heavy spec case pins. An engine
    // sorting each pass independently must add a unique tiebreaker
    // (see the q94 oracle SQL). `__s - gap` (not `prevMax + gap`)
    // keeps ends near Long.MaxValue from wrapping.
    val prevMax = max(col("__e")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val isnew = when(prevMax.isNull || (col("__s") - lit(gap)) > prevMax,
      1L).otherwise(0L)
    withE.withColumn("__new", isnew)
      .withColumn("__island", sum(col("__new")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col("__s")).as("m_start"), max(col("__e")).as("m_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** The +1/−1 endpoint event stream: one +1 at start, one −1 just past
    * the (validated) end, both in LONG coordinates. */
  private def endpointEvents(df: DataFrame, keys: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val kc = keys.map(col)
    df.select((kc :+ explode(array(
      struct(col(startCol).cast("long").as("pos"), lit(1L).as("d")),
      struct((checkedEnd(startCol, endCol) + 1).as("pos"),
        lit(-1L).as("d")))).as("__e")): _*)
      .select((kc :+ col("__e.pos").as("pos") :+ col("__e.d").as("d")): _*)
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
    // combine same-position deltas first: positions become unique per
    // key, so the running sum and lead below are order-deterministic.
    // Zero-net positions (an end meeting a start) change nothing and
    // would split a constant-depth run — drop them so segments are
    // MAXIMAL. A key's first position can never net to zero (with
    // start <= end enforced, an end event at p implies a start before
    // p), so no key disappears.
    val deltas = endpointEvents(df, keys, startCol, endCol)
      .groupBy((kc :+ col("pos")): _*)
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

  /** Interval-set subtraction (bedtools subtract, set form): the
    * maximal regions covered by at least one `a` interval and by NO
    * `b` interval, per key. Both sides join one +1/−1 event stream
    * (tagged by side), one sweep carries TWO running depths, and kept
    * segments (aDepth > 0, bDepth = 0) re-merge across their shared
    * boundaries with the gap-1 island device — so the whole operator
    * is the same one-key-shuffle window shape as [[coverageDepth]]
    * plus a segment-count-sized merge. `n_merged` reports how many
    * sweep segments each remnant region absorbed. */
  def subtract(a: DataFrame, b: DataFrame, keys: Seq[String],
      aStart: String, aEnd: String, bStart: String,
      bEnd: String): DataFrame = {
    val kc = keys.map(col)
    val events = endpointEvents(a, keys, aStart, aEnd)
      .select((kc :+ col("pos") :+ col("d").as("da") :+ lit(0L).as("db")): _*)
      .unionByName(endpointEvents(b, keys, bStart, bEnd)
        .select((kc :+ col("pos") :+ lit(0L).as("da") :+
          col("d").as("db")): _*))
    val deltas = events.groupBy((kc :+ col("pos")): _*)
      .agg(sum(col("da")).as("dA"), sum(col("dB")).as("dB"))
    val ord = Window.partitionBy(kc: _*).orderBy(col("pos").asc)
    val segs = deltas
      .withColumn("__a", sum(col("dA")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__b", sum(col("dB")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__next", lead(col("pos"), 1).over(ord))
      .filter(col("__next").isNotNull &&
        col("__a") > 0 && col("__b") === 0)
      .select((kc :+ col("pos").as("seg_start") :+
        (col("__next") - 1).as("seg_end")): _*)
    // kept segments are disjoint; gap=1 welds the ones that share a
    // boundary (a depth change inside a kept run) into maximal regions
    mergeOverlapping(segs, keys, "seg_start", "seg_end", gap = 1L)
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
    *     (one row per OCCUPIED bucket);
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
    * human genome at 1 Mb buckets that is ~3200 windows. The bucket
    * summary joins back WITHOUT a broadcast hint — at the bucket
    * counts this function exists for, forcing a broadcast is exactly
    * the wrong call; both sides are already clustered on the key, and
    * Spark may still choose to broadcast a small summary on its own. */
  def coverageDepthBucketed(df: DataFrame, keys: Seq[String],
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val kc = keys.map(col)
    val deltas = endpointEvents(df, keys, startCol, endCol)
      .groupBy((kc :+ col("pos")): _*)
      .agg(sum(col("d")).as("delta"))
      .filter(col("delta") =!= 0)
      .withColumn("__b", floor(col("pos") / bucketWidth))
    // pass 1: occupied-bucket summaries, stitched by a window over
    // buckets: entering depth + the bridge to the next bucket
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
      .join(buckets.select((kc :+ col("__b") :+ col("__enter")): _*),
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
