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
      // Output-schema lint: DECIMAL precision > 18 leaves parquet's
      // INT64 regime (fixed-len-byte-array) while DuckDB computes in
      // HUGEINT-backed INT128 — the cross-engine hash-canonicalization
      // divergence that made q130 render DOUBLE, q133 hi/lo BIGINT,
      // and turned q172/q173 red in round 12. No query output may
      // carry a wide decimal; render scaled BIGINT or decimal(<=18,x)
      // at the edge instead.
      val wide = wideDecimals(df.schema)
      assert(wide.isEmpty,
        s"$name output carries DECIMAL precision > 18 (cross-engine " +
          s"hash pitfall; render scaled BIGINT or decimal(<=18,x)): $wide")
    }
  }

  import org.apache.spark.sql.types._
  /** All paths in the schema (structs/arrays/maps included) typed as a
    * decimal wider than 18 digits. */
  private def wideDecimals(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
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
