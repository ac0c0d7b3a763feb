package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scratch profiler for round-2 perf work. */
object ProfileQ {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.GraftSession
    import graft.functions.TextFunctions._
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warmup

    val docs = GraftSession.table(spark, sfDir, "documents")
    // q35 stages
    val sh = graft.ext.Dedup.shingled(docs, "doc_id", "text", 3)
    time("q35 shingle explode")(sh.count())
    val aggs = (0 until 12).map(i =>
      min(substring(md5(concat(lit(s"${i}_"), col("__shingle"))), 1, 16)).as(s"m$i"))
    val sig = sh.groupBy("__id").agg(aggs.head, aggs.tail: _*)
    time("q35 signatures (12 md5 mins)")(sig.count())
    time("q35 full")(SparkEntry.queries("q35_minhash_lsh")(spark, sfDir).count())
    time("q36 full")(SparkEntry.queries("q36_ngram_jaccard")(spark, sfDir).count())
    // q11 with alternative widths
    def ordIv = GraftSession.table(spark, sfDir, "orders").select(
      (col("o_orderkey") % 5).as("chrom"),
      ((col("o_orderkey") * 7) % 5000).as("s1"),
      ((col("o_orderkey") * 7) % 5000 + 1 + col("o_orderkey") % 40).as("e1"),
      col("o_orderkey"))
    Seq(64L, 32L, 24L, 16L).foreach { w =>
      val b = ordIv.select(col("chrom"), col("s1").as("s2"), col("e1").as("e2"),
        col("o_orderkey").as("o_orderkey2"))
      val j = graft.ranges.RangeJoin.overlapJoin(ordIv, b, Seq("chrom"),
          "s1", "e1", "s2", "e2", w)
        .filter(col("o_orderkey") < col("o_orderkey2"))
        .withColumn("frac12", graft.ranges.Intervals.overlapFraction(col("s1"), col("e1"), col("s2"), col("e2")))
        .withColumn("frac21", graft.ranges.Intervals.overlapFraction(col("s2"), col("e2"), col("s1"), col("e1")))
        .filter(col("frac12") >= 0.5 && col("frac21") >= 0.5)
      time(s"q11 core width=$w")(j.count())
    }
    spark.stop()
  }
}
