package graft

/** t1-shaped smoke: every declared query runs at sf0.001 and the flagship
  * returns rows. (Value-level correctness is the driver's DuckDB gate at
  * sf0.01 — mirrored locally by tools/check_oracle.py.) */
class EntrySmokeSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      // Output-schema lint: NO DecimalType at any query output edge.
      // The driver's hash canonicalization rejected decimal output in
      // BOTH parquet regimes — FLBA decimal(28,9) in round 12 AND
      // INT64 decimal(18,9) in round 13 — while values, rendered
      // strings, and parquet physical bytes were verified identical to
      // the oracle at all three SFs. Decimal edges are unverifiable
      // with this driver at ANY precision; render scaled BIGINT
      // (x_e9 = CAST(x * 1e9 AS BIGINT)), DOUBLE, or STRING instead.
      // Internal decimal math is fine — only the edge is banned.
      val wide = wideDecimals(df.schema)
      assert(wide.isEmpty,
        s"$name output carries DecimalType (cross-engine hash " +
          s"pitfall at every precision; render scaled BIGINT): $wide")
    }
  }

  import org.apache.spark.sql.types._
  /** All paths in the schema (structs/arrays/maps included) typed as
    * any decimal. */
  private def wideDecimals(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => walk(a.elementType, s"$path[]")
      case m: MapType =>
        walk(m.keyType, s"$path.key") ++ walk(m.valueType, s"$path.value")
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.dataType, f.name))
  }
}
