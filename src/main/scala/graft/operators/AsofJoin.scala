package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join, backward (for every left row, the most recent
  * right row with `rightTs <= leftTs`) and forward (the earliest right
  * row with `rightTs >= leftTs`), within the same key group.
  *
  * Not in the reference (SURVEY §2.3 notes its absence) — added as a
  * first-class time-series operator for event/feature alignment.
  *
  * Implementation is the union-tag trick, which Spark executes as ONE
  * shuffle + sort over the combined stream (no join at all):
  * right rows and left rows interleave in (key, ts) order; a running
  * `last(right_payload, ignoreNulls)` window carries the latest right
  * payload forward onto each left row. At 100 TB this is
  * shuffle-by-key + in-partition sort — the minimal possible movement
  * for this semantics, with no risk of the O(|L|·|R|) blowup a naive
  * `ts_r <= ts_l` range join has.
  *
  * Equal timestamps: right rows sort BEFORE left rows, so a right row at
  * exactly leftTs matches (>= semantics). Right rows must be unique per
  * (keys, ts) — pre-aggregate duplicates or results are tie-broken by
  * window order of the duplicates.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    asof(left, right, keys, leftTs, rightTs, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `rightTs >= leftTs` in the same key group (the "next event"
    * alignment). Same one-shuffle union-tag plan as [[backward]], with
    * the window order reversed; a right row at exactly leftTs matches. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    asof(left, right, keys, leftTs, rightTs, forward = true)

  /** Tag and union the two sides: right rows carry their payload
    * struct in `__r` with `__src = 0`, left rows carry `__r = null`,
    * `__src = 1` and their own columns (null-padded on the right
    * stream). Returns the union plus the left/right payload column
    * name lists the final projection needs. */
  private def tagUnion(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String)
      : (DataFrame, Seq[String], Seq[String]) = {
    val rightPayloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTs).toSeq
    val clash = rightPayloadCols.toSet
      .intersect(left.columns.filterNot(keys.contains).toSet)
    require(clash.isEmpty,
      s"asof join: right payload columns collide with left columns " +
        s"(${clash.mkString(", ")}) — rename one side first")
    val payload = struct(rightPayloadCols.map(col): _*)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), payload.as("__r"),
        lit(0).as("__src")): _*)
    val leftCols = left.columns
      .filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r"),
        lit(1).as("__src")) ++ leftCols.map(col): _*)
    // pad the right stream with the left's columns so the union lines up
    val paddedRight = leftCols.foldLeft(taggedRight)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    (taggedLeft.unionByName(paddedRight), leftCols, rightPayloadCols)
  }

  /** The final projection shared by every as-of variant: keep left
    * rows, unpack the matched right payload. Expects `__match`. */
  private def finish(matched: DataFrame, keys: Seq[String],
      leftTs: String, leftCols: Seq[String],
      rightPayloadCols: Seq[String]): DataFrame =
    matched.filter(col("__src") === 1)
      .drop("__r", "__src")
      .withColumnRenamed("__ts", leftTs)
      .select((keys.map(col) :+ col(leftTs)) ++
        leftCols.map(col) ++
        rightPayloadCols.map(c => col("__match").getField(c).as(c)): _*)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, forward: Boolean): DataFrame = {
    val (unioned, leftCols, rightPayloadCols) =
      tagUnion(left, right, keys, leftTs, rightTs)

    // backward walks time ascending (latest right ≤ leftTs wins);
    // forward walks it descending (earliest right ≥ leftTs wins). The
    // forward walk is evaluated as backward on a NEGATED timeline — an
    // ascending sort over `-ts` — rather than `__ts.desc`: the
    // ascending form keeps the sort prefix radix-friendly and matches
    // the machinery the backward path exercises (adjudicated round 8:
    // the desc-ordered window ran ~1.7× slower than its exact mirror on
    // the same data; see BENCH.md). At equal ts (__ord ties), right
    // (__src=0) still sorts before left, so an exactly-simultaneous
    // right row matches in both directions.
    import org.apache.spark.sql.types.{DateType, NumericType,
      TimestampNTZType, TimestampType}
    val tsOrder: Column =
      if (!forward) col("__ts").asc
      else unioned.schema("__ts").dataType match {
        case TimestampType => (-unix_micros(col("__ts"))).asc
        case TimestampNTZType =>
          (-unix_micros(col("__ts").cast("timestamp"))).asc
        case DateType => (-col("__ts").cast("int")).asc
        case _: NumericType => (-col("__ts")).asc
        // non-numeric, non-temporal timeline: no total negation exists —
        // fall back to the descending sort (correct, just not the fast
        // path; unreachable for every graft call site today)
        case _ => col("__ts").desc
      }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    finish(unioned
        .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w)),
      keys, leftTs, leftCols, rightPayloadCols)
  }

  /** [[backward]] for FEW keys at extreme scale — the bucketed
    * two-pass device the interval family uses
    * ([[graft.ranges.IntervalSets.coverageDepthBucketed]]), applied to
    * the as-of walk. The plain form's window partitions by the keys
    * alone: 25 chromosomes (or one symbol, one tenant…) caps a
    * 1000-executor cluster at 25 sort tasks no matter how many rows
    * each key holds. Here the union-tag stream buckets by
    * `timeline div bucketWidth` and
    *
    *  1. per (keys, bucket): one aggregation finds the LAST right row
    *     of each occupied bucket (`max_by` on the walk order — right
    *     rows are unique per (keys, ts), the documented precondition);
    *  2. a window over THAT table (one row per occupied bucket) gives
    *     each bucket its ENTERING match — the latest right payload in
    *     any earlier bucket (`last(…, ignoreNulls)`);
    *  3. per (keys, bucket): the plain running-`last` window, seeded by
    *     `coalesce(local, entering)` — every earlier-bucket right row
    *     sorts before every current-bucket row by construction
    *     (bucketing is on the walk order itself), so the coalesce IS
    *     the global running last.
    *
    * Results are identical to [[backward]]/[[forward]] (AsofSpec pins
    * ≡ at several widths); the heavy sort now runs per (keys, bucket).
    * The timeline must be integral, date, or timestamp (micros) — the
    * bucketing is exact integer division; fractional timelines stay on
    * the plain form. Pick `bucketWidth` in timeline units so keys ×
    * buckets lands in the thousands-to-millions. */
  def backwardBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      bucketWidth: Long): DataFrame =
    asofBucketed(left, right, keys, leftTs, rightTs, forward = false,
      bucketWidth)

  /** [[backwardBucketed]] with [[deriveBucketWidth]]'s width — the
    * caller-free form (the interval family's deriveBucketWidth
    * convention: one extra cheap aggregate buys a data-derived width
    * instead of a guessed one). */
  def backwardBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String): DataFrame =
    backwardBucketed(left, right, keys, leftTs, rightTs,
      deriveBucketWidth(left, right, leftTs, rightTs))

  /** [[forward]] on the bucketed two-pass plan — the negated-timeline
    * evaluation of [[backwardBucketed]]. */
  def forwardBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      bucketWidth: Long): DataFrame =
    asofBucketed(left, right, keys, leftTs, rightTs, forward = true,
      bucketWidth)

  /** [[forwardBucketed]] with [[deriveBucketWidth]]'s width. */
  def forwardBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String): DataFrame =
    forwardBucketed(left, right, keys, leftTs, rightTs,
      deriveBucketWidth(left, right, leftTs, rightTs))

  /** Data-derived bucket width for the bucketed as-of forms: span of
    * the COMBINED (left ∪ right) timeline divided into enough buckets
    * that each holds ~`targetRowsPerBucket` union rows, floored at 256
    * buckets so a small table still exercises the two-pass plan. One
    * cheap two-table aggregate (min/max/count over the ts columns
    * only — column-pruned to a single-column scan); width is in
    * timeline units (micros for timestamps, days for dates, native
    * units for integers), matching what [[backwardBucketed]] buckets
    * on. Returns ≥ 1. */
  def deriveBucketWidth(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      targetRowsPerBucket: Long = 32768L): Long = {
    require(targetRowsPerBucket >= 1, "targetRowsPerBucket must be >= 1")
    import org.apache.spark.sql.types.{DateType, TimestampNTZType,
      TimestampType}
    // union the RAW ts columns first: the set-op coercion unifies a
    // mixed timestamp/date pair to one type — exactly what the
    // bucketed join's own tagUnion does — and the unit conversion
    // happens ONCE on the unified type. Converting per side would mix
    // day-numbers with micros and derive a garbage width.
    val raw = left.select(col(leftTs).as("__t"))
      .union(right.select(col(rightTs).as("__t")))
    val ord: Column = raw.schema("__t").dataType match {
      case TimestampType => unix_micros(col("__t"))
      case TimestampNTZType => unix_micros(col("__t").cast("timestamp"))
      case DateType => col("__t").cast("int").cast("long")
      case _ => col("__t").cast("long")
    }
    val both = raw.select(ord.as("__o"))
    val r = both.agg(min(col("__o")).as("lo"), max(col("__o")).as("hi"),
      count(col("__o")).as("n")).head()
    if (r.isNullAt(0) || r.isNullAt(1)) 1L
    else {
      val domain = math.max(1L, r.getLong(1) - r.getLong(0) + 1)
      val nBuckets = math.max(256L, r.getLong(2) / targetRowsPerBucket)
      math.max(1L, domain / nBuckets)
    }
  }

  private def asofBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      forward: Boolean, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    import org.apache.spark.sql.types.{ByteType, DateType, IntegerType,
      LongType, ShortType, TimestampNTZType, TimestampType}
    val (unioned, leftCols, rightPayloadCols) =
      tagUnion(left, right, keys, leftTs, rightTs)
    val sign = if (forward) -1L else 1L
    // exact integer walk order (ascending == match order, the plain
    // form's convention); fractional timelines have no exact bucketing
    val ord: Column = unioned.schema("__ts").dataType match {
      case TimestampType => lit(sign) * unix_micros(col("__ts"))
      case TimestampNTZType =>
        lit(sign) * unix_micros(col("__ts").cast("timestamp"))
      case DateType => lit(sign) * col("__ts").cast("int").cast("long")
      case ByteType | ShortType | IntegerType | LongType =>
        lit(sign) * col("__ts").cast("long")
      case dt => throw new IllegalArgumentException(
        s"asof bucketed: timeline type $dt is not integral/date/" +
          "timestamp — use the plain backward/forward form")
    }
    val kc = keys.map(col)
    // truncating `div` is monotone in ord, which is all bucket ids need
    // (bucket 0 is wider when ord spans zero — harmless)
    val u = unioned.withColumn("__ord", ord)
      .withColumn("__b", expr(s"__ord div ${bucketWidth}L"))
    // 1+2: last right per occupied bucket, then the entering match.
    // max_by ignores null-ordering rows, so left rows (null __rord)
    // never win; an all-left bucket yields a null __blast, which
    // last(ignoreNulls) carries past.
    val bw = Window.partitionBy(kc: _*).orderBy(col("__b").asc)
    val summary = u
      .groupBy((kc :+ col("__b")): _*)
      .agg(max_by(col("__r"), when(col("__src") === 0, col("__ord")))
        .as("__blast"))
      .withColumn("__enter", last(col("__blast"), ignoreNulls = true)
        .over(bw.rowsBetween(Window.unboundedPreceding, -1)))
      .select((kc :+ col("__b") :+ col("__enter")): _*)
      .repartition((kc :+ col("__b")): _*)
    // 3: the plain window, now per (keys, bucket), seeded by __enter
    val w = Window.partitionBy((kc :+ col("__b")): _*)
      .orderBy(col("__ord").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.join(summary, keys :+ "__b")
      .withColumn("__match",
        coalesce(last(col("__r"), ignoreNulls = true).over(w),
          col("__enter")))
    finish(matched, keys, leftTs, leftCols, rightPayloadCols)
  }

  /** As-of join with a tolerance window: match only if the right row is
    * within `maxGap` time units before the left row.
    *
    * Gap units: `TimestampType` columns are cast to long before
    * differencing (whole SECONDS — without the cast, timestamp
    * subtraction yields a day-time interval that can't compare to a
    * long). Numeric timestamp columns (epoch nanos/millis/fractional
    * units) difference in their NATIVE type — no cast, so fractional
    * gaps are not silently truncated into the window. */
  def backwardWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, maxGap: Long,
      rightTsOut: String = "matched_ts"): DataFrame = {
    val r2 = right.withColumn(rightTsOut, col(rightTs))
    val joined = backward(left, r2, keys, leftTs, rightTs)
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def ts(c: org.apache.spark.sql.Column) =
      left.schema(leftTs).dataType match {
        case TimestampType => c.cast("long")
        // NTZ→long is not a valid cast; route through TimestampType
        // (session-tz interpretation — consistent on both sides of the
        // difference, so the gap is unaffected)
        case TimestampNTZType => c.cast("timestamp").cast("long")
        case _ => c
      }
    val within = col(rightTsOut).isNotNull &&
      (ts(col(leftTs)) - ts(col(rightTsOut))) <= maxGap
    val outCols = r2.columns.filterNot(c => keys.contains(c) || c == rightTs)
    outCols.foldLeft(joined)((df, c) =>
      df.withColumn(c, when(within, col(c))))
  }
}
