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
