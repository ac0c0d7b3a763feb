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

  test("round-4 codegen expressions are callable from SQL") {
    graft.functions.expressions.VectorExpressions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_l2sq(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                  CAST(array(4.0, 6.0) AS ARRAY<DOUBLE>)) AS d2,
        |       graft_pq_adc(CAST(array(1, 0) AS ARRAY<BIGINT>),
        |                    CAST(array(array(10.0, 20.0),
        |                               array(30.0, 40.0)) AS ARRAY<ARRAY<DOUBLE>>)) AS adc,
        |       graft_nearest_centroid(
        |         CAST(array(0.9, 0.0) AS ARRAY<DOUBLE>),
        |         CAST(array(array(0.0, 0.0), array(1.0, 0.0))
        |              AS ARRAY<ARRAY<DOUBLE>>)) AS cell""".stripMargin)
      .head()
    assert(r.getDouble(0) == 25.0) // 9 + 16
    assert(r.getDouble(1) == 50.0) // lut[0][1] + lut[1][0] = 20 + 30
    assert(r.getInt(2) == 1)
    // bloom round-trip entirely in SQL: bits built via the same chained
    // xxhash64 family the probe replays
    val keys = spark.range(100).selectExpr("xxhash64(id) AS k")
    keys.createOrReplaceTempView("bloom_keys")
    val (bits, k) = graft.ext.Sketches.buildBloomBits(keys, "k", 100, 0.01)
    val bitsSql = bits.mkString("array(", "L,", "L)")
    val hit = spark.sql(
      s"""SELECT graft_bloom_might_contain(xxhash64(42L),
         |  CAST($bitsSql AS ARRAY<BIGINT>), $k) AS present""".stripMargin)
      .head().getBoolean(0)
    assert(hit) // 42 is one of the 100 inserted keys
  }

  test("graft_pq_adc: subspace-count mismatch -> null in both paths") {
    graft.functions.expressions.VectorExpressions.ensureRegistered(spark)
    // codegen path: a 1-subspace code against a 2-subspace LUT is as
    // corrupt as an out-of-range index — a partial sum would rank
    // artificially LOW, so the row must not rank at all
    val r = spark.sql(
      """SELECT graft_pq_adc(CAST(array(1) AS ARRAY<BIGINT>),
        |                    CAST(array(array(10.0, 20.0),
        |                               array(30.0, 40.0)) AS ARRAY<ARRAY<DOUBLE>>)) AS adc"""
        .stripMargin).head()
    assert(r.isNullAt(0), "truncated PQ code must yield null, not a partial sum")
    // interpreted path: eval the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val code = Literal.create(Array(1L), ArrayType(LongType))
    val lut = Literal.create(Array(Array(10.0, 20.0), Array(30.0, 40.0)),
      ArrayType(ArrayType(DoubleType)))
    val e = graft.functions.expressions.PqAdcDistance(code, lut)
    assert(e.eval(null) == null)
    // and an equal-length code still sums
    val ok = graft.functions.expressions.PqAdcDistance(
      Literal.create(Array(1L, 0L), ArrayType(LongType)), lut)
    assert(ok.eval(null) == 50.0)
  }

  test("graft_mat_vec: rotates from SQL; null row / length mismatch -> null") {
    graft.functions.expressions.VectorExpressions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_mat_vec(CAST(array(array(0.0, 1.0), array(1.0, 0.0))
        |                          AS ARRAY<ARRAY<DOUBLE>>),
        |                     CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS swap,
        |       graft_mat_vec(CAST(array(array(1.0, 2.0),
        |                                CAST(NULL AS ARRAY<DOUBLE>))
        |                          AS ARRAY<ARRAY<DOUBLE>>),
        |                     CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS nullrow,
        |       graft_mat_vec(CAST(array(array(1.0, 2.0, 3.0))
        |                          AS ARRAY<ARRAY<DOUBLE>>),
        |                     CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS short""".stripMargin)
      .head()
    assert(r.getSeq[Double](0) == Seq(4.0, 3.0))
    assert(r.isNullAt(1)) // null row degrades to null, never an NPE
    assert(r.isNullAt(2)) // length mismatch likewise
  }

  test("GraftExtensions session: functions + transparent range rule, pure SQL") {
    import org.apache.spark.sql.SparkSession
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // same SparkContext, fresh session state WITH the extension installed
    val s2 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      // every injected function resolves with zero library calls
      val r = s2.sql(
        """SELECT graft_overlap_length(0L, 9L, 5L, 100L)   AS len,
          |       graft_overlap_fraction(0L, 9L, 5L, 100L) AS frac,
          |       graft_shingles('a b c', 2)               AS sh,
          |       graft_cosine(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
          |                    CAST(array(2.0, 4.0) AS ARRAY<DOUBLE>)) AS c
          |""".stripMargin).head()
      assert(r.getLong(0) == 5L)
      assert(r.getDouble(1) == 0.5)
      assert(r.getSeq[String](2) == Seq("a b", "b c"))
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
      // the range rule fires on a plain SQL join with no session fiddling
      val rnd = new scala.util.Random(42)
      val rows = (0 until 300).map { i =>
        val s = rnd.nextInt(5000).toLong; (i.toLong, s, s + rnd.nextInt(300))
      }
      import s2.implicits._
      rows.toDF("ida", "sa", "ea").createOrReplaceTempView("ga")
      rows.map { case (i, s, e) => (i + 1000, s, e) }
        .toDF("idb", "sb", "eb").createOrReplaceTempView("gb")
      val q = s2.sql(
        "SELECT ida, idb FROM ga JOIN gb ON sa <= eb AND sb <= ea")
      assert(q.queryExecution.optimizedPlan.toString
        .contains(graft.plans.BinnedRangeJoinRule.BinName))
      val naive = rows.flatMap { case (i, s, e) =>
        rows.collect { case (j, s2_, e2) if s <= e2 && s2_ <= e =>
          (i, j + 1000) }
      }.sorted
      assert(q.as[(Long, Long)].collect().toSeq.sorted == naive)
    } finally {
      // s2 shares the context — never stop() it; just restore the session
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("FilterSpec array values compare against array columns") {
    val df = Seq((1L, Seq(0, 1)), (2L, Seq(1, 1)), (3L, Seq(0, 0)))
      .toDF("id", "gt")
    assert(df.filter(FilterSpec("gt", "=", Seq(0, 1)).toColumn)
      .select("id").head().getLong(0) == 1L)
    assert(df.filter(FilterSpec("gt", "!=", Seq(1, 1)).toColumn).count() == 2)
  }
}
