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
    }
  }
}
