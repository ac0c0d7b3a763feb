package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order clustering) — the write-side
  * half of scan pruning at 100 TB.
  *
  * A table range-sorted on ONE column gives parquet tight per-row-group
  * min/max stats on that column only: predicates on any other column
  * read everything. Interleaving the bits of 2-3 bucketized columns
  * into one Morton (Z) value and range-writing on IT keeps every
  * clustered column's values locally dense per file/row group, so
  * min/max stats prune scans on ANY of them — the standard lakehouse
  * layout device (public Delta/Iceberg OPTIMIZE ZORDER semantics),
  * re-derived here over plain parquet with no table format needed.
  *
  * Scale shape: one tiny min/max aggregate per clustered column (a
  * single driver-side row — the bounded-collect contract), then a
  * map-only bucketize + bit-interleave expression (codegen'd integer
  * ops, no UDF), then ONE range exchange on the z-value — the same
  * shuffle a plain sorted write pays. Nothing here touches query
  * results: layout only affects which row groups a later scan skips.
  */
object Layout {

  /** Morton/Z value over `cols`, each bucketized to `bits` bits via
    * min/max normalization (the one driver-visible aggregate). NULLs
    * bucket to 0 — they cluster together at the low end, which is what
    * a pruning layout wants. Constant columns (min == max) contribute
    * bucket 0 everywhere and drop out of the interleave harmlessly. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size >= 2 && cols.size <= 3,
      s"z-order interleave supports 2-3 columns, got ${cols.size}")
    require(bits >= 4 && bits <= 20, s"bits out of range: $bits")
    // one aggregate pass: per-column min/max as doubles
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val maxBucket = (1L << bits) - 1
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val mx = Option(row.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      if (mx > mn)
        least(lit(maxBucket), greatest(lit(0L),
          floor((col(c).cast("double") - lit(mn)) / lit(mx - mn)
            * lit(maxBucket.toDouble)).cast("long")))
      else lit(0L) // constant or all-null column
    }.map(b => coalesce(b, lit(0L)))
    val n = cols.size
    // interleave: bit i of column j lands at position i*n + (n-1-j)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(
          b.bitwiseAND(lit(1L << i)), i * (n - 1) + (n - 1 - j)))
      }
    }
  }

  /** Classic xy2d Hilbert transform (the public-domain iterative
    * rotation form) on bucketized coordinates. A deterministic pure
    * function — exposed for the property spec. */
  private[ext] def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    val n = 1L << bits
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert-curve value over exactly TWO columns (same bucketize as
    * [[zValue]]). The Hilbert curve never takes the long diagonal
    * jumps Morton order does, so consecutive curve positions are
    * always spatially adjacent — at equal file counts each file
    * covers a more compact region and 1-D slab predicates touch
    * fewer files (measured in ScaleLayoutSpec). The xy2d transform
    * runs as a deterministic Scala UDF: an unrolled Column form
    * explodes exponentially (each round references x AND y several
    * times, and Catalyst re-expands the tree), and a UDF on the
    * ONE-OFF WRITE path costs nothing measurable against the range
    * shuffle it feeds — this is explicitly not a query-path function
    * (the query path never sees the curve value at all). */
  def hilbertValue(df: DataFrame, cols: Seq[String],
      bits: Int = 16): Column = {
    require(cols.size == 2, "hilbert interleave supports exactly 2 columns")
    require(bits >= 4 && bits <= 20, s"bits out of range: $bits")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val maxBucket = (1L << bits) - 1
    val bucketed = cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val mx = Option(row.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      val b =
        if (mx > mn)
          least(lit(maxBucket), greatest(lit(0L),
            floor((col(c).cast("double") - lit(mn)) / lit(mx - mn)
              * lit(maxBucket.toDouble)).cast("long")))
        else lit(0L)
      coalesce(b, lit(0L))
    }
    val curve = udf((bx: Long, by: Long) => xy2d(bits, bx, by))
    curve(bucketed(0), bucketed(1))
  }

  /** Range-write `df` into `numFiles` parquet files clustered by the
    * Z-order of `cols`: one range exchange + in-partition sort on the
    * z-value, which parquet then turns into tight min/max stats for
    * EVERY clustered column. The helper column never reaches disk. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit =
    writeClustered(df, zValue(df, cols, bits), path, numFiles)

  /** [[writeZOrdered]] on the Hilbert curve (two columns). */
  def writeHilbertOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit =
    writeClustered(df, hilbertValue(df, cols, bits), path, numFiles)

  /** Bucketed co-located write — the OTHER write-path layout lever
    * (z-order/Hilbert prune SCANS; bucketing eliminates JOIN
    * shuffles): both sides of a recurring equi-join saved with
    * `bucketBy(n, key)` + in-bucket `sortBy` hash-split rows into the
    * same bucket scheme, so every later join/aggregate on that key
    * plans with ZERO exchanges AND zero sorts — at 100 TB the shuffle
    * this deletes on every run of a daily fact⋈fact join is the
    * dominant cost of the query (ScaleLayoutSpec asserts the
    * exchange-free join plan).
    *
    * Catalog-table based (Spark bucketing lives in the table
    * metadata): pick `buckets` ≈ (table size / target partition
    * size), and the SAME count on both sides — mismatched bucket
    * counts fall back to a shuffle on one side. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(buckets > 0, "buckets must be positive")
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Small-file compaction (lakehouse OPTIMIZE): rewrite a parquet
    * directory into ≈`targetBytes` files. Streaming sinks and
    * fine-grained incremental appends leave thousands of KB-sized
    * files; at 100 TB the resulting task-per-file scheduling and
    * footer-read overhead dominate scans long before data volume does.
    *
    * File count = ceil(current on-disk bytes / targetBytes) — an upper
    * bound on the output size per file (re-encoding usually shrinks
    * it; exactness is not the point, escaping the many-small-files
    * regime is). With `sortCols` the rewrite is ONE range exchange
    * that also (re)clusters — compaction and z-order-style layout
    * maintenance in the same pass (min/max pruning on the leading sort
    * column survives the rewrite); without, a round-robin shuffle
    * balances bytes evenly.
    *
    * Returns the file count written. Writes to `outPath` — an
    * in-place rewrite would lose the source on failure; atomically
    * swapping directories is the caller's (or the table format's) job.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(inPath != outPath, "compact cannot rewrite in place")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    laid.write.mode("overwrite").parquet(outPath)
    n
  }

  /** File-level stats manifest — the persisted half of FILE skipping
    * (what Delta/Iceberg store per file at write time, over plain
    * parquet): per data file, row count and min/max of each named
    * NUMERIC column, written as `_graft_manifest` INSIDE the data
    * directory (underscore-prefixed paths are invisible to parquet
    * readers, the `_SUCCESS` convention). One full scan at write time
    * buys planner-level pruning on every later read: row-group min/max
    * skipping still OPENS every file's footer; the manifest never
    * opens non-matching files at all — at 100 TB the difference
    * between touching 40k footers and listing 400 file names.
    *
    * Regenerate after any rewrite of the directory —
    * [[readPruned]] cross-checks the manifest against the live file
    * listing and fails loudly on drift (a stale manifest silently
    * dropping rows is the one failure mode file skipping must never
    * have). */
  def writeManifest(spark: org.apache.spark.sql.SparkSession,
      dataPath: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "manifest needs at least one column")
    val df = spark.read.parquet(dataPath)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__min"),
      max(col(c).cast("double")).as(s"${c}__max")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // file-count-sized — one manifest file
      .write.mode("overwrite").parquet(s"$dataPath/_graft_manifest")
  }

  /** Manifest-pruned range scan: reads ONLY the files whose stats
    * ranges intersect every `(col, lo, hi)` predicate, then applies
    * the exact range filter — so the result equals
    * `spark.read.parquet(dataPath).filter(...)` row for row while
    * non-matching files are never opened (file skipping, not just
    * row-group skipping). Prunable columns must appear in the
    * manifest ([[writeManifest]]'s `cols`); the file list is
    * file-count-sized driver state (the bounded-collect contract).
    * Fails loudly if the manifest does not match the live file
    * listing. */
  def readPruned(spark: org.apache.spark.sql.SparkSession,
      dataPath: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    require(ranges.nonEmpty, "readPruned needs at least one range")
    val fs = new org.apache.hadoop.fs.Path(dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(
      new org.apache.hadoop.fs.Path(s"$dataPath/_graft_manifest")),
      s"no manifest at $dataPath — run writeManifest first (an " +
        "overwrite of the directory also removes it)")
    val mf = spark.read.parquet(s"$dataPath/_graft_manifest")
    ranges.foreach { case (c, _, _) =>
      require(mf.columns.contains(s"${c}__min"),
        s"column '$c' is not in the manifest — rebuild with " +
          s"writeManifest(..., cols including '$c')")
    }
    import spark.implicits._
    // ONE manifest collect serves both the staleness guard and the
    // pruning filter (the manifest is file-count-sized driver state)
    val mfRows = mf.collect()
    val fileIdx = mf.columns.indexOf("file")
    val manifestFiles = mfRows.map(_.getString(fileIdx)).toSet
    // staleness guard: the manifest must describe EXACTLY the live
    // data files (names compared; underscore/dot paths are reader-
    // invisible and excluded on both sides)
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(dataPath))
      .map(_.getPath).filter { p =>
        !p.getName.startsWith("_") && !p.getName.startsWith(".")
      }.map(_.getName).toSet
    val manifestNames = manifestFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).getName)
    require(manifestNames == live,
      s"manifest is stale for $dataPath: " +
        s"${(live -- manifestNames).size} unlisted / " +
        s"${(manifestNames -- live).size} vanished files — " +
        "rerun writeManifest after rewriting the directory")
    // a file survives iff EVERY predicate's range intersects its
    // stats range; all-null stats (min/max null) cannot prove absence
    // of matching rows, so such files are kept — evaluated driver-side
    // over the already-collected rows
    val idx = ranges.map { case (c, _, _) =>
      (mf.columns.indexOf(s"${c}__min"), mf.columns.indexOf(s"${c}__max"))
    }
    val files = mfRows.filter { r =>
      ranges.zip(idx).forall { case ((_, lo, hi), (iMin, iMax)) =>
        r.isNullAt(iMin) ||
          (r.getDouble(iMin) <= hi && r.getDouble(iMax) >= lo)
      }
    }.map(_.getString(fileIdx))
    val base = spark.read.parquet(dataPath)
    val pruned =
      if (files.isEmpty) base.limit(0)
      else spark.read.schema(base.schema).parquet(files.toSeq: _*)
    ranges.foldLeft(pruned) { case (d, (c, lo, hi)) =>
      d.filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
    }
  }

  private def writeClustered(df: DataFrame, curve: Column, path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    df.withColumn("__z", curve)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
