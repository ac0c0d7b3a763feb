package graft

import graft.core.FilterSpec

/** The engine is also consumable through plain Spark SQL: register the
  * warehouse tables as views and query with `spark.sql`. Catalyst plans
  * the same operators either way — this pins the SQL surface works. */
class SqlSurfaceSpec extends SparkSpecBase {
  import spark.implicits._

  test("domain tables query identically through spark.sql") {
    Seq(("chr1", 31L, 60L, "+", 11L), ("chr1", 25L, 65L, "+", 12L),
      ("chr2", 500L, 600L, "-", 13L))
      .toDF("chrom", "start", "end", "strand", "id")
      .createOrReplaceTempView("junc")
    Seq(("s1", 11L, 25L), ("s2", 11L, 40L), ("s1", 12L, 15L))
      .toDF("samplename", "junction", "uniq_map")
      .createOrReplaceTempView("bridge")

    val sql = spark.sql(
      """SELECT j.chrom, j.start, j.end, b.samplename, b.uniq_map
        |FROM junc j JOIN bridge b ON j.id = b.junction
        |WHERE j.chrom = 'chr1' AND j.start <= 40 AND j.end >= 31
        |ORDER BY j.id, b.samplename""".stripMargin).collect()
    assert(sql.length == 3)
    assert(sql.head.getString(3) == "s1")
  }

  test("custom codegen expressions are callable from SQL") {
    graft.functions.expressions.VectorExpressions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_cosine(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                    CAST(array(2.0, 4.0) AS ARRAY<DOUBLE>)) AS c,
        |       graft_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("FilterSpec array values compare against array columns") {
    val df = Seq((1L, Seq(0, 1)), (2L, Seq(1, 1)), (3L, Seq(0, 0)))
      .toDF("id", "gt")
    assert(df.filter(FilterSpec("gt", "=", Seq(0, 1)).toColumn)
      .select("id").head().getLong(0) == 1L)
    assert(df.filter(FilterSpec("gt", "!=", Seq(1, 1)).toColumn).count() == 2)
  }
}
