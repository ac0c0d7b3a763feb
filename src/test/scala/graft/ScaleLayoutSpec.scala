package graft

import org.apache.spark.sql.functions._
import graft.ext.Skew

/** Pins the physical-layout behaviors the 100 TB design relies on:
  * bucketed co-located joins (no shuffle exchange) and salted
  * aggregation equivalence. */
class ScaleLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not repartition either side; the only
      // exchange allowed is the one for the final tiny groupBy
      val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(!joinSection.contains("Exchange hashpartitioning"), plan)
      assert(j.collect().map(_.getLong(1)).sum == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-order layout prunes scans on BOTH clustered dimensions") {
    import graft.ext.Layout
    // two independent uniform dims: a single-dim sort can serve only
    // one of them; z-order must serve both
    val n = 200000L
    val df = spark.range(n).select(col("id"),
      pmod(hash(col("id")), lit(100000)).cast("long").as("a"),
      pmod(hash(col("id") * 7 + 3), lit(100000)).cast("long").as("b"))
    val zdir = tmpDir("zorder")
    val ldir = tmpDir("linear")
    // granularity = the file count here (each small file is one row
    // group): a 1-D slab predicate intersects ~sqrt(F) of F files
    // under 2-D z-order, so F=64 → ~1/8 of the data per dim
    Layout.writeZOrdered(df, Seq("a", "b"), zdir, numFiles = 64)
    df.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(ldir)

    // rows DECODED by the scan (post row-group/page pruning, pre
    // residual filter) — the metric min/max stats actually move
    def scannedRows(dir: String, pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(dir).filter(pred)
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val predA = col("a") between (41000, 42000)
    val predB = col("b") between (41000, 42000)
    // same answers under every layout, first
    val wantA = df.filter(predA).count()
    val wantB = df.filter(predB).count()
    assert(spark.read.parquet(zdir).filter(predA).count() == wantA)
    assert(spark.read.parquet(zdir).filter(predB).count() == wantB)
    // the linear layout prunes its sort dim but reads ~everything for
    // the other; z-order must prune BOTH well below the linear b-scan
    val zA = scannedRows(zdir, predA)
    val zB = scannedRows(zdir, predB)
    val lB = scannedRows(ldir, predB)
    assert(lB > n / 2,
      s"control broken: linear-by-a should scan ~all rows for b ($lB)")
    // margins are deliberately loose: (1) the low-order interleave dim
    // (b here) is inherently the weaker prune — its slab crosses ~2x
    // the z-segments of the high-order dim (measured ~31k vs ~52k of
    // 200k at 64 files); (2) repartitionByRange samples with an
    // rddId-seeded RNG, so file boundaries (and exact scan counts)
    // jitter a few percent run to run. 3x-on-both is the stable claim.
    assert(zA < lB / 3 && zB < lB / 3,
      s"z-order must prune both dims: zA=$zA zB=$zB vs linear-b=$lB")
  }

  test("salted aggregation == plain aggregation") {
    val df = spark.range(20000)
      .select((col("id") % 3).cast("string").as("k"),
        (col("id") % 97).cast("double").as("v"))
    val got = Skew.saltedSumAgg(df, Seq("k"), salts = 16,
        aggs = Seq("n" -> count(lit(1)),
          "total" -> sum(col("v").cast("decimal(18,6)"))))
      .select(col("k"), col("n").cast("long"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).cast("double").as("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
  }
}
