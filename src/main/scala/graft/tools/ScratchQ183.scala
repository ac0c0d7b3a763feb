package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase probe for the q183 fix (round 19) — NOT part of the
  * driver contract; deleted before round close. */
object ScratchQ183 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("Q183_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = e.stageInfo
            val ms = for {
              a <- i.completionTime; b <- i.submissionTime
            } yield a - b
            println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-3d " +
              f"wall=${ms.getOrElse(-1L)}%5d ms  ${i.name.take(70)}")
          }
        })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // replicate the prefixJaccardJoin internals
    val docs = graft.core.GraftSession.spread(
      graft.core.GraftSession.table(spark, sfDir, "documents"))
    val threshold = 0.5
    def shingles(c: org.apache.spark.sql.Column) =
      graft.functions.expressions.TextExpressions.wordShingles(spark, c, 3)
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val tok =
        if (sys.env.contains("Q183_MAPDISTINCT"))
          docs.select(col("doc_id").as("__id"),
            explode(array_distinct(shingles(col("text")))).as("__tok"))
        else docs.select(col("doc_id").as("__id"),
            explode(shingles(col("text"))).as("__tok"))
          .distinct()
      val tf = tok.groupBy("__tok").agg(count(lit(1)).as("__df"))
      val orderedLazy = tok.join(tf, "__tok")
        .groupBy("__id")
        .agg(sort_array(collect_list(struct(col("__df"), col("__tok"))))
          .as("__st"))
        .select(col("__id"),
          transform(col("__st"), s => s.getField("__tok")).as("__toks"),
          size(col("__st")).cast("long").as("__n"))
      val mode = sys.env.getOrElse("Q183_MODE", "ckpt")
      val ordered = mode match {
        case "ckpt" => time("ordered localCheckpoint")(
          orderedLazy.localCheckpoint(true))
        case "lazy" => orderedLazy
        case "persist" => orderedLazy.persist()
      }
      val prefixLen = (col("__n") -
        floor(lit(threshold) * col("__n").cast("double")).cast("long") +
        lit(1L)).cast("int")
      val pref = ordered.select(col("__id"), col("__n"),
        explode(slice(col("__toks"), lit(1), prefixLen)).as("__tok"))
      val cand = pref
        .select(col("__id").as("a_id"), col("__n").as("__na"), col("__tok"))
        .join(pref.select(col("__id").as("b_id"), col("__n").as("__nb"),
          col("__tok")), Seq("__tok"))
        .filter(col("a_id") < col("b_id"))
        .filter(least(col("__na"), col("__nb")).cast("double") >=
          lit(threshold) * greatest(col("__na"), col("__nb")).cast("double")
            - lit(1e-9))
        .select("a_id", "b_id").distinct()
        .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
          col("a_id"))
      val result = cand
        .join(ordered.select(col("__id").as("a_id"),
          col("__toks").as("__ta"), col("__n").as("n_a")), "a_id")
        .join(ordered.select(col("__id").as("b_id"),
          col("__toks").as("__tb"), col("__n").as("n_b")), "b_id")
        .withColumn("n_shared",
          when(monotonically_increasing_id() >= Long.MinValue,
            size(array_intersect(col("__ta"), col("__tb"))).cast("long")))
        .withColumn("jaccard", col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_a", "n_b", "n_shared", "jaccard")
      if (sys.env.contains("Q183_PHASES")) {
        println("[scratch] ordered parts = " +
          (if (mode == "ckpt") ordered.rdd.getNumPartitions.toString
           else "n/a"))
        println("[scratch] pref rows = " + time("pref count")(pref.count()))
        println("[scratch] cand rows = " + time("cand count")(cand.count()))
      }
      time("result count")(
        result.orderBy("a_id", "b_id").count())
      if (round == 3 && sys.env.contains("Q183_EXPLAIN")) {
        val out = result.orderBy("a_id", "b_id")
        out.count()
        println(out.queryExecution.executedPlan.toString)
      }
      if (mode == "persist") ordered.unpersist()
    }
    spark.stop()
  }
}
