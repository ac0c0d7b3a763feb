package graft

import org.apache.spark.sql.functions._
import graft.ext.Sampling
import graft.ext.Sampling.WeightedItem

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = spark.range(1000)
    .select(col("id"), (col("id") % 4).cast("string").as("grp"))

  test("stratified: exact quota per group, deterministic across runs") {
    val a = Sampling.stratified(df, Seq("grp"), "id", 10)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(a.groupBy(_._1).forall(_._2.size == 10))
    val b = Sampling.stratified(df.repartition(13), Seq("grp"), "id", 10)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(a == b) // partitioning-independent
  }

  test("byFraction: deterministic, roughly the requested fraction, map-only") {
    val s = Sampling.byFraction(df, "id", 0.2)
    val n = s.count()
    assert(n > 120 && n < 280, s"got $n of 1000 at fraction 0.2")
    assert(s.queryExecution.executedPlan.toString.count(_ == 'E') >= 0)
    assert(!s.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(Sampling.byFraction(df, "id", 0.2).count() == n)
  }

  test("weighted reservoir: bounded buffer, favors heavy weights") {
    val items = (1L to 500L).map(i =>
      WeightedItem(i, if (i <= 10) 1000.0 else 1.0,
        // hash-derandomized score: weight-scaled deterministic rank
        (if (i <= 10) 1000.0 else 1.0) * ((i * 2654435761L % 1000) / 1000.0)))
    val ds = spark.createDataset(items)
    val agg = new Sampling.WeightedReservoir(20).toColumn
    val kept = ds.select(agg).head()
    assert(kept.size == 20)
    // all heavy items should survive into the reservoir
    assert((1L to 10L).count(kept.contains) >= 9)
  }
}
