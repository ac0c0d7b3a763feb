package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for q84_minhash_delta (round-17 drift
  * adjudication: the row sat ~1.6x of its r14 pin across two rounds
  * while its controls re-timed to pin — this breaks the 1.86 s into
  * stages so the regression has an address). */
object MinhashDeltaProbe {
  def time[T](label: String, n: Int = 3)(f: => T): T = {
    var r: T = f // warm
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); r = f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $label%-44s min ${ts.min}%.3f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
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
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warmup
    import graft.ext.Dedup

    def mat(df: DataFrame) =
      org.apache.spark.sql.graftshim.CheckpointShim.materialize(df)
    val d = graft.core.GraftSession.spread(
      graft.core.GraftSession.table(spark, sfDir, "documents"))
    println(s"[prof] docs total=${d.count()} new=${d.filter(col("doc_id") >= 250).count()} snap=${d.filter(col("doc_id") < 250).count()}")

    val snap = d.filter(col("doc_id") < 250)
    val nw = d.filter(col("doc_id") >= 250)
    val snapBands = Dedup.minhashBands(snap, "doc_id", "text", 3, 12, 4)
    time("snapshot bands agg")(snapBands.count())
    val nb = Dedup.minhashBands(nw, "doc_id", "text", 3, 12, 4)
    time("new bands agg")(nb.count())
    val allB = snapBands.unionByName(nb)
    val candPlan = nb.as("x").join(allB.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.__id") =!= col("y.__id"))
      .select(least(col("x.__id"), col("y.__id")).as("a_id"),
        greatest(col("x.__id"), col("y.__id")).as("b_id"))
      .distinct()
    time("candidate join (lazy count)")(candPlan.count())
    time("candidate join MATERIALIZE")(mat(candPlan)._1)
    val (cand, _) = mat(candPlan)
    println(s"[prof] candidates=${cand.count()}")
    val corpus = snap.select(col("doc_id"), col("text"))
      .unionByName(nw.select(col("doc_id"), col("text")))
    val touched = cand.select(col("a_id").as("doc_id"))
      .unionByName(cand.select(col("b_id").as("doc_id"))).distinct()
    val prunedPlan = corpus.join(touched, Seq("doc_id"), "leftsemi")
    time("pruned corpus MATERIALIZE")(mat(prunedPlan)._1)
    val (pruned, _) = mat(prunedPlan)
    println(s"[prof] pruned docs=${pruned.count()}")
    time("verifyJaccard")(
      Dedup.verifyJaccard(cand, pruned, "doc_id", "text", 3, 0.5).count())
    time("q84 full")(SparkEntry.queries("q84_minhash_delta")(spark, sfDir).count())
    time("q35 full")(SparkEntry.queries("q35_minhash_lsh")(spark, sfDir).count())
    spark.stop()
  }
}
