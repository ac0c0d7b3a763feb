package graft

import org.apache.spark.sql.types._
import graft.core.GraftSession

/** Driver-testdata drift tripwire (round-6 postmortem): the driver
  * regenerated events.parquet with `ts` as timestamp[us] where rounds
  * 1-5 shipped TIMESTAMP(NANOS), and five entry queries failed analysis
  * deep inside window specs. This spec pins every driver table's logical
  * schema as read through GraftSession.table, so the NEXT regeneration
  * fails ONE focused assertion with a readable message instead of five
  * smoke tests.
  *
  * `events.ts` is special-cased: it may legally arrive as long nanos
  * (nanosAsLong) OR as a timestamp — both are supported by
  * GraftSession.tsMicros/tsTimestamp, and the assertion names the helper
  * to update if a third physical type ever appears.
  */
class EntrySchemaSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def types(name: String): Map[String, DataType] =
    GraftSession.table(spark, sf, name).schema
      .fields.map(f => f.name -> f.dataType).toMap

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  // date/timestamp-bearing columns the driver has already drifted once
  // (or could): accept any member of the listed set, not one pin
  private val flexible: Map[(String, String), Set[DataType]] = Map(
    ("orders", "o_orderdate") ->
      Set[DataType](TimestampType, TimestampNTZType, DateType),
    ("lineitem", "l_shipdate") ->
      Set[DataType](TimestampType, TimestampNTZType, DateType),
    ("events", "ts") ->
      Set[DataType](LongType, TimestampType, TimestampNTZType))

  for ((tbl, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"driver table `$tbl` reads with the expected logical types") {
      val got = types(tbl)
      for ((c, want) <- cols) {
        assert(got.contains(c), s"$tbl is missing column `$c` " +
          s"(driver testdata drifted; present: ${got.keys.toSeq.sorted})")
        assert(got(c) == want, s"$tbl.`$c` drifted: read as ${got(c)}, " +
          s"entry queries assume $want")
      }
      for (((t, c), okTypes) <- flexible if t == tbl) {
        assert(got.contains(c), s"$tbl is missing column `$c`")
        assert(okTypes.contains(got(c)),
          s"$tbl.`$c` drifted to ${got(c)} — none of the supported " +
            s"physical types $okTypes. If this is events.ts, extend " +
            "GraftSession.tsMicros/tsTimestamp with the new branch.")
      }
    }
  }

  test("events.ts resolves through tsMicros and tsTimestamp") {
    val ev = GraftSession.table(spark, sf, "events")
    // analysis must succeed and produce a LongType micros timeline
    val micros = ev.select(GraftSession.tsMicros(ev).as("us"))
    assert(micros.schema("us").dataType == LongType)
    val first = micros.agg(org.apache.spark.sql.functions.min("us"))
      .head().getLong(0)
    // driver events are modern epochs: a seconds-truncation bug (the
    // CAST-to-BIGINT-on-timestamp trap) or a nanos passthrough would
    // land ~1e9 or ~1e18, three orders off this band
    assert(first > 1e14.toLong && first < 1e17.toLong,
      s"tsMicros produced $first — not an epoch-microseconds value")
    val tsT = GraftSession.tsTimestamp(ev)
    assert(tsT.schema("ts").dataType == TimestampType)
    // the two helpers must agree on the identical integer timeline
    val cross = tsT.select(
      org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")).as("a"))
      .agg(org.apache.spark.sql.functions.min("a")).head().getLong(0)
    assert(cross == first, s"tsTimestamp ($cross) and tsMicros ($first) " +
      "disagree on the microsecond timeline")
  }
}
