package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table access helpers shared by the query API, Verify and Bench.
  *
  * Design notes (100 TB posture):
  *  - AQE on: runtime coalescing, broadcast conversion and skew-join
  *    splitting replace the reference's hand-placed SQLite indexes
  *    (SURVEY §4.2).
  *  - shuffle.partitions defaults to the local core count here; on a real
  *    cluster this is set per-job to ~2-3x total cores (AQE coalesces down).
  */
object GraftSession {

  /** Build a local session with the settings every entry point shares. */
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      // transparent range-join rule + SQL function surface (GraftFunctions)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // parquet timestamps as int64 micros: portable to DuckDB/Arrow readers
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.ts is TIMESTAMP(NANOS) which Spark has no native type for;
      // read it as long nanos and convert explicitly (tsToTimestamp)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the driver-generated test tables (TESTDATA.md). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a LOCAL single-split scan across the session's cores.
    *
    * The driver's tables are single-row-group parquet files, which Spark
    * cannot split: the scan and every narrow stage above it (explode
    * fanout, broadcast-join probe) runs on one core. For most queries the
    * single-threaded shuffle write costs more than it saves (measured:
    * blanket spreading regressed the bench 48.8 → 133.7 s), so this is
    * applied ONLY where heavy per-row fanout sits above the scan — the
    * binned range-join inputs. On a production cluster the scan has
    * thousands of splits and no spread is needed; this is a small-SF
    * artifact adapter, which is why it lives with the entry queries and
    * not inside the RangeJoin library. */
  def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (cores > 1) df.repartition(cores) else df
  }

  /** events.ts arrives as long nanos (see nanosAsLong above); convert to a
    * proper timestamp column with microsecond truncation. Division goes
    * through decimal: a double `/ 1000` has 256 ns of ulp at 2024-epoch
    * nanos and lands microseconds off by one. */
  def nanosToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros(floor(c.cast("decimal(38,0)") / lit(1000)).cast("long"))
  }
}
